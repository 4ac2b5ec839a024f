"""Training loop building blocks.

Mirrors the reference driver skeleton (`run_graphcount.py:483-613`):
Adam + L1 loss + ReduceLROnPlateau + best-val tracking — re-expressed as a
jitted train step (optax, donated state) and a host-side plateau
controller feeding the learning rate through `optax.inject_hyperparams`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from escgnn_tpu.data.container import GraphBatch


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def adam_with_plateau(
    lr: float, grad_clip: float = 0.0
) -> optax.GradientTransformation:
    """Adam with an externally controlled learning rate
    (torch.optim.Adam defaults: b1=0.9 b2=0.999 eps=1e-8).

    `grad_clip` > 0 prepends global-norm gradient clipping — the guard
    against one-batch gradient explosions poisoning Adam's moments
    (observed on PPGN_eff: a single epoch jumped the loss 13 orders of
    magnitude and the run never recovered; torch equivalent
    `clip_grad_norm_`).

    Wrapped in `optax.flatten`: the update runs on ONE concatenated
    vector instead of per-tensor chains — the per-tensor version was
    ~600 XLA ops/step on the flagship model (~40 tensors), a measurable
    slice of the step at these batch sizes. Semantics are identical
    (adam is elementwise); `set_learning_rate` still reaches
    `opt_state.hyperparams` (flatten keeps the inner state)."""
    adam = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if grad_clip and grad_clip > 0:
        return optax.flatten(
            optax.chain(optax.clip_by_global_norm(grad_clip), adam)
        )
    return optax.flatten(adam)


def _hyperparams(opt_state):
    """The inject_hyperparams dict, reaching through wrapper states
    (optax.chain tuples and optax.masked MaskedState — the freeze_main
    finetuning composition)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if hasattr(opt_state, "inner_state"):
        return _hyperparams(opt_state.inner_state)
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            try:
                return _hyperparams(s)
            except AttributeError:
                continue
    raise AttributeError("no inject_hyperparams state found")


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side learning-rate override (plateau scheduler hook)."""
    _hyperparams(state.opt_state)["learning_rate"] = jnp.asarray(
        lr, jnp.float32
    )
    return state.replace(opt_state=state.opt_state)


def get_learning_rate(state: TrainState) -> float:
    return float(_hyperparams(state.opt_state)["learning_rate"])


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (mode=min), matching torch semantics used at
    reference `run_graphcount.py:479-480`."""

    factor: float = 0.9
    patience: int = 10
    min_lr: float = 1e-5
    best: Optional[float] = None
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        if self.best is None or metric < self.best:
            self.best = metric
            self.num_bad = 0
            return lr
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr


def l1_node_loss(out: jax.Array, batch: GraphBatch) -> jax.Array:
    """Masked mean-absolute-error over real nodes (node-level tasks)."""
    err = jnp.abs(out - batch.y)
    m = batch.node_mask.astype(err.dtype)[:, None]
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)


def l1_graph_loss(out: jax.Array, batch: GraphBatch) -> jax.Array:
    err = jnp.abs(out - batch.y)
    m = batch.graph_mask.astype(err.dtype)[:, None]
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)


def ce_graph_loss(out: jax.Array, batch: GraphBatch) -> jax.Array:
    """Masked softmax cross-entropy over real graphs (classification)."""
    labels = batch.y.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(out, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = batch.graph_mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def ce_node_loss(out: jax.Array, batch: GraphBatch) -> jax.Array:
    """Masked softmax cross-entropy over real NODES (the VOC/COCO
    superpixel node-classification task shape, reference GraphGPS
    `loader/dataset/voc_superpixels.py`). Labels < 0 are outside the
    training node split (the Planetoid/WebKB/Actor single-graph mask
    protocol, data/hetero.py node_split_copies) and drop out."""
    labels = batch.y.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(out, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(labels, 0)[:, None], axis=-1
    )[:, 0]
    m = batch.node_mask.astype(nll.dtype) * (labels >= 0)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_sequence_ce_loss(seq_len: int, vocab: int):
    """Masked mean cross-entropy over `seq_len` token positions (the
    ogbg-code2 task shape: y (G, L) int token ids incl. EOS padding,
    logits (G, L * vocab); reference GraphGPS trains one linear head per
    position — `encode_y_to_arr`, `master_loader.py:411-434`)."""

    def loss(out: jax.Array, batch: GraphBatch) -> jax.Array:
        G = out.shape[0]
        logits = out.reshape(G, seq_len, vocab)
        labels = batch.y.reshape(G, seq_len).astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, :, None], axis=-1)[..., 0]
        m = batch.graph_mask.astype(nll.dtype)[:, None]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m) * seq_len, 1.0)

    return loss


def bce_graph_loss(out: jax.Array, batch: GraphBatch) -> jax.Array:
    """Masked sigmoid BCE over real graphs (multilabel classification —
    the peptides-func / ogbg-mol task shape). NaN label entries are
    unlabeled tasks and drop out of the mean (reference
    `run_ogb_mol.py:65-72`). Single implementation lives in
    train/metrics.py (the NaN-masking logic must not fork)."""
    from escgnn_tpu.train.metrics import masked_bce_with_logits

    return masked_bce_with_logits(out, batch)


def make_pool_logits_step(model, decode=None):
    """Graph-level logits over a STACKED batch pool in one dispatch:
    returns (logits (B, G, C), y (B, G, T), graph_mask (B, G)) so
    classification metrics (accuracy / AP / AUC) are computed on host
    from one tunnel round trip."""

    @jax.jit
    def logits_pool(params, batch_stats, stacked: GraphBatch):
        def body(_, batch):
            if decode is not None:
                batch = decode(batch)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                deterministic=True,
                use_running_average=True,
            )
            return None, (out, batch.y, batch.graph_mask)

        _, (outs, ys, masks) = jax.lax.scan(body, None, stacked)
        return outs, ys, masks

    return logits_pool


def make_accuracy_step(model):
    """Jitted classification eval: (num_correct, num_real)."""

    @jax.jit
    def acc_step(params, batch_stats, batch: GraphBatch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            deterministic=True,
            use_running_average=True,
        )
        pred = jnp.argmax(out, axis=-1)
        correct = (pred == batch.y.reshape(-1).astype(jnp.int32)) & batch.graph_mask
        return jnp.sum(correct), jnp.sum(batch.graph_mask)

    return acc_step


def make_pergraph_correct_step(model):
    """Jitted per-graph correctness: (correct bool (G,), graph_mask).

    Building block of the majority-vote eval hook (reference
    `run_exp.py:255-265`: per-graph success counts accumulated over
    `nb_trials` forward passes, correct when > nb_trials // 2)."""

    @jax.jit
    def step(params, batch_stats, batch: GraphBatch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            deterministic=True,
            use_running_average=True,
        )
        pred = jnp.argmax(out, axis=-1)
        correct = pred == batch.y.reshape(-1).astype(jnp.int32)
        return correct, batch.graph_mask

    return step


def make_train_step(
    model,
    loss_fn: Callable[[jax.Array, GraphBatch], jax.Array],
):
    """Build the jitted train step: forward (train mode, mutable BN stats),
    grads, Adam update. Donates state for in-place buffers."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: GraphBatch, rng: jax.Array):
        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": rng, "rni": jax.random.fold_in(rng, 7)},
            )
            return loss_fn(out, batch), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    return train_step


def make_multi_train_step(
    model,
    loss_fn: Callable[[jax.Array, GraphBatch], jax.Array],
):
    """K train steps per device dispatch via `lax.scan` over stacked
    batches.

    Rationale: on this setup the per-dispatch round trip to the device
    (remote-execution tunnel) exceeds the per-step compute (~9 ms vs
    ~4 ms measured on the ZINC flagship step), so dispatching one step
    per batch caps throughput below the hardware. Stacking K host
    batches (leading axis K on every array, `stack_batches`) and
    scanning on device amortizes the dispatch to 1/K per step.
    """

    @partial(jax.jit, donate_argnums=(0,))
    def multi_step(state: TrainState, batches: GraphBatch, rng: jax.Array):
        def compute(params, batch_stats, batch, step_rng):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": step_rng, "rni": jax.random.fold_in(step_rng, 7)},
            )
            return loss_fn(out, batch), mut["batch_stats"]

        def body(state, batch):
            step_rng = jax.random.fold_in(rng, state.step)
            (loss, new_stats), grads = jax.value_and_grad(
                compute, has_aux=True
            )(state.params, state.batch_stats, batch, step_rng)
            updates, new_opt = state.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                loss,
            )

        return jax.lax.scan(body, state, batches)

    return multi_step


def make_pool_epoch_fn(
    model,
    loss_fn: Callable[[jax.Array, GraphBatch], jax.Array],
    decode=None,
):
    """The UN-JITTED whole-epoch pool scan: lax.scan of train steps over
    a permutation of a device-resident stacked batch pool. Shared body
    for `make_pool_train_step` (single device / dp-replicated) and
    `parallel.edge_partition.make_ep_pool_train_step` (edge-sharded jit),
    so rng-stream and schedule semantics cannot drift between them."""

    def pool_step(state: TrainState, stacked: GraphBatch, order, rng):
        def compute(params, batch_stats, batch, step_rng):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": step_rng, "rni": jax.random.fold_in(step_rng, 7)},
            )
            return loss_fn(out, batch), mut["batch_stats"]

        def body(state, i):
            batch = jax.tree.map(lambda a: a[i], stacked)
            if decode is not None:
                # compressed device pools (data/compress.py): cast the
                # downcast leaves back; fuses into the step's consumers
                batch = decode(batch)
            step_rng = jax.random.fold_in(rng, state.step)
            (loss, new_stats), grads = jax.value_and_grad(
                compute, has_aux=True
            )(state.params, state.batch_stats, batch, step_rng)
            updates, new_opt = state.tx.update(
                grads, state.opt_state, state.params
            )
            return (
                state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                loss,
            )

        return jax.lax.scan(body, state, order.astype(jnp.int32))

    return pool_step


def make_pool_train_step(
    model,
    loss_fn: Callable[[jax.Array, GraphBatch], jax.Array],
    decode=None,
):
    """One WHOLE EPOCH per device dispatch (jitted `make_pool_epoch_fn`).

    `stacked` is the pool with a leading batch axis (`stack_batches` of a
    `materialized_batches` pool, device-put once); `order` is the epoch's
    shuffled index vector. The scan body dynamically indexes the pool in
    HBM — with device-resident pools this makes an epoch a single
    dispatch (the remote tunnel costs ~25 ms per dispatch) and transfers
    nothing but the order vector."""
    return jax.jit(make_pool_epoch_fn(model, loss_fn, decode),
                   donate_argnums=(0,))


# keep-fraction of the models' BatchNorm EMA (MaskedBatchNorm uses
# torch-style momentum=0.1, i.e. new = 0.9*old + 0.1*batch — see
# models/layers.py). The refresh paths recover a batch's OWN moments
# from the EMA update algebraically:
# batch = (new - keep*old) / (1-keep). Single definition for both
# refresh implementations; must match MaskedBatchNorm.momentum.
BN_MOMENTUM = 0.9


def recover_batch_moments(new_stats, old_stats):
    return jax.tree.map(
        lambda nw, od: (nw - BN_MOMENTUM * od) / (1.0 - BN_MOMENTUM),
        new_stats, old_stats,
    )


def stack_batches(batches):
    """Stack a list of same-shape GraphBatches along a new leading axis
    (host-side numpy; feed to `make_multi_train_step`)."""
    import numpy as _np

    return jax.tree.map(lambda *xs: _np.stack(xs), *batches)


def make_bn_refresh_step(model):
    """One forward pass that ONLY refreshes BatchNorm running statistics
    (params frozen, dropout off).

    Rationale: with trained embedding tables feeding pre-activation BN
    (the z_embedding path), activation variance shifts faster than the
    momentum-0.1 EMA tracks, and eval-mode outputs can be off by orders
    of magnitude while train-mode loss is healthy (measured: val MAE
    2.6 with stale running stats vs 0.76 with batch stats at epoch 5 on
    counting). Re-estimating the stats over a few training batches right
    before evaluation makes eval reflect the current model. The torch
    reference has the same exposure; this is the standard fix.
    """

    @jax.jit
    def refresh(batch_stats, params, batch: GraphBatch):
        _, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            deterministic=True,
            use_running_average=False,
            mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    return refresh


def refresh_bn_stats(refresh_step, state: TrainState, batches) -> TrainState:
    """Re-estimate BN running stats over `batches` (host iterable of
    GraphBatch) using a jitted step from `make_bn_refresh_step` (create
    it ONCE per model so the jit cache is reused); returns the state
    with updated batch_stats.

    The returned statistics are the EXACT average of the per-batch
    statistics, not a momentum EMA: each refresh forward runs from the
    same baseline stats, the per-batch moments are recovered from the
    momentum-0.1 update algebraically (m_b = 10*new - 9*old), and
    averaged. A momentum walk over K batches would keep 0.9^K of the
    stale values (with the former 2-batch refresh, 81% stale — measured
    ~0.08 vs ~0.03 MAE on the 1000-epoch counting run)."""
    import jax

    base = state.batch_stats
    acc = None
    n = 0
    for b in batches:
        new = refresh_step(base, state.params, b)
        mb = recover_batch_moments(new, base)
        acc = mb if acc is None else jax.tree.map(jnp.add, acc, mb)
        n += 1
    if n == 0:
        return state
    return state.replace(
        batch_stats=jax.tree.map(lambda a: a / n, acc)
    )


def make_eval_step(model, node_level: bool = True, bn_mode: str = "running"):
    """Jitted eval: returns (sum |err|, count) over real rows so the caller
    accumulates an exact dataset MAE across fixed-shape batches.

    bn_mode: "running" = torch model.eval() semantics (EMA statistics);
    "batch" = normalize with the eval batch's own statistics — robust
    when activation scales drift faster than the EMA tracks (measured:
    on counting, stale EMA stats can inflate eval MAE by orders of
    magnitude while train-mode loss is healthy; see
    make_bn_refresh_step).
    """

    @jax.jit
    def eval_step(params, batch_stats, batch: GraphBatch):
        if bn_mode == "batch":
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                deterministic=True,
                use_running_average=False,
                mutable=["batch_stats"],
            )
        else:
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                deterministic=True,
                use_running_average=True,
            )
        mask = batch.node_mask if node_level else batch.graph_mask
        err = jnp.abs(out - batch.y) * mask[:, None]
        return jnp.sum(err), jnp.sum(mask) * out.shape[-1]

    return eval_step


def make_pool_eval_step(model, node_level: bool = True,
                        bn_mode: str = "running", decode=None):
    """`make_eval_step` over a STACKED batch pool in one dispatch:
    returns (sum |err|, count) accumulated across the pool's batches
    (lax.scan over the leading axis — device-resident eval sets cost one
    tunnel round trip per eval pass instead of one per batch)."""

    @jax.jit
    def eval_pool(params, batch_stats, stacked: GraphBatch):
        def body(acc, batch):
            if decode is not None:
                batch = decode(batch)
            if bn_mode == "batch":
                out, _ = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch,
                    deterministic=True,
                    use_running_average=False,
                    mutable=["batch_stats"],
                )
            else:
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch,
                    deterministic=True,
                    use_running_average=True,
                )
            mask = batch.node_mask if node_level else batch.graph_mask
            err = jnp.abs(out - batch.y) * mask[:, None]
            return (
                acc[0] + jnp.sum(err),
                acc[1] + jnp.sum(mask) * out.shape[-1],
            ), None

        acc, _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            stacked,
        )
        return acc

    return eval_pool


def make_pool_refresh_step(model, decode=None):
    """Exact-average BN running-stat re-estimation over a STACKED batch
    pool in one dispatch (the scan-pool form of `make_bn_refresh_step` +
    `refresh_bn_stats`): every batch's moments are computed from the same
    base statistics and averaged."""

    @jax.jit
    def refresh_pool(batch_stats, params, stacked: GraphBatch):
        def body(_, batch):
            if decode is not None:
                batch = decode(batch)
            _, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                deterministic=True,
                use_running_average=False,
                mutable=["batch_stats"],
            )
            mb = recover_batch_moments(mut["batch_stats"], batch_stats)
            return None, mb
        _, mbs = jax.lax.scan(body, None, stacked)
        return jax.tree.map(lambda a: jnp.mean(a, axis=0), mbs)

    return refresh_pool
