"""k-fold cross-validation harness for TU-style graph classification.

Capability mirror of reference `kernel/train_eval.py`:
  * `k_fold` (`:225-240`): stratified k-fold with val fold = previous
    test fold, seeded 12345 — reimplemented in numpy (per-class round-
    robin assignment after a seeded shuffle, the same split semantics as
    sklearn's StratifiedKFold(shuffle=True)).
  * `cross_validation_with_val_set` (`:16-130`): per fold, reset model,
    Adam(+weight decay), step-decay LR every `lr_decay_step_size`, track
    per-epoch val loss + test acc; final metric = test acc at the best-
    val-loss epoch, mean +- std over folds.

The reference's torch.distributed DistributedSampler path maps to data
parallelism over the device mesh (escgnn_tpu/parallel); this harness is
single-host and jit-compiles one step per batch shape.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from escgnn_tpu.data.batching import BatchSpec, batch_iterator
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.train.loop import (
    TrainState,
    ce_graph_loss,
    make_accuracy_step,
    make_train_step,
)


def k_fold(
    labels: np.ndarray, folds: int, seed: int = 12345
) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Stratified k-fold; returns [(train_idx, test_idx, val_idx)] with
    val fold i = test fold i-1 (reference `kernel/train_eval.py:225-240`)."""
    labels = np.asarray(labels).reshape(-1)
    rng = np.random.default_rng(seed)
    fold_of = np.empty(len(labels), np.int64)
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        fold_of[idx] = np.arange(len(idx)) % folds
    splits = []
    for i in range(folds):
        test = np.flatnonzero(fold_of == i)
        val = np.flatnonzero(fold_of == (i - 1) % folds)
        train = np.flatnonzero((fold_of != i) & (fold_of != (i - 1) % folds))
        splits.append((train, test, val))
    return splits


@dataclasses.dataclass
class CVResult:
    val_loss: float
    test_acc_mean: float
    test_acc_std: float
    durations: list


def cross_validation_with_val_set(
    graphs: Sequence[GraphData],
    model_factory: Callable[[], "flax.linen.Module"],  # noqa: F821
    *,
    folds: int = 10,
    epochs: int = 100,
    batch_size: int = 128,
    lr: float = 1e-2,
    lr_decay_factor: float = 0.5,
    lr_decay_step_size: int = 50,
    weight_decay: float = 0.0,
    seed: int = 0,
    logger: Optional[Callable[[str], None]] = None,
) -> CVResult:
    if folds < 3:
        raise ValueError(
            f"folds={folds}: the val split is the previous test fold "
            "(reference kernel/train_eval.py k_fold), so at least 3 "
            "folds are needed for a non-empty train split"
        )
    labels = np.asarray([int(np.asarray(g.y).reshape(-1)[0]) for g in graphs])
    spec = BatchSpec.from_graphs(list(graphs), batch_size=batch_size)

    model = model_factory()
    all_val, all_acc, durations = [], [], []
    for fold, (tr, te, va) in enumerate(k_fold(labels, folds)):
        t0 = time.perf_counter()
        train_g = [graphs[i] for i in tr]
        test_g = [graphs[i] for i in te]
        val_g = [graphs[i] for i in va]

        tx = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else
            optax.identity(),
            optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        rng = jax.random.key(seed + fold)
        sample = next(batch_iterator(train_g, spec))
        sample = jax.tree.map(jnp.asarray, sample)
        variables = model.init(rng, sample)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}), tx
        )
        train_step = make_train_step(model, ce_graph_loss)
        acc_step = make_accuracy_step(model)

        @jax.jit
        def loss_step(params, batch_stats, batch):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, deterministic=True, use_running_average=True,
            )
            return ce_graph_loss(out, batch) * jnp.sum(batch.graph_mask), \
                jnp.sum(batch.graph_mask)

        np_rng = np.random.default_rng(seed + fold)
        # device-resident batch pools, train order-shuffled per epoch
        # (the remote tunnel leaks host RSS per device_put; also ~5x
        # faster epochs — see the regression drivers)
        from escgnn_tpu.data.prefetch import materialized_batches

        train_batches = materialized_batches(train_g, spec)
        val_batches = materialized_batches(val_g, spec)
        test_batches = materialized_batches(test_g, spec)
        cur_val, cur_acc = [], []
        cur_lr = lr
        for epoch in range(1, epochs + 1):
            for i in np_rng.permutation(len(train_batches)):
                rng, sub = jax.random.split(rng)
                state, _ = train_step(state, train_batches[int(i)], sub)
            # val loss
            tot, cnt = 0.0, 0.0
            for batch in val_batches:
                l, c = loss_step(state.params, state.batch_stats, batch)
                tot += float(l); cnt += float(c)
            cur_val.append(tot / max(cnt, 1.0))
            # test acc
            tot, cnt = 0.0, 0.0
            for batch in test_batches:
                c, m = acc_step(state.params, state.batch_stats, batch)
                tot += float(c); cnt += float(m)
            cur_acc.append(tot / max(cnt, 1.0))
            if epoch % lr_decay_step_size == 0:
                cur_lr *= lr_decay_factor
                state.opt_state[-1].hyperparams["learning_rate"] = jnp.asarray(
                    cur_lr, jnp.float32
                )
        all_val.append(cur_val)
        all_acc.append(cur_acc)
        durations.append(time.perf_counter() - t0)
        best = int(np.argmin(cur_val))
        msg = (
            f"Fold {fold}: best val_loss {cur_val[best]:.4f}, "
            f"test_acc {cur_acc[best]:.4f}"
        )
        if logger:
            logger(msg)

    val = np.asarray(all_val)  # (folds, epochs)
    acc = np.asarray(all_acc)
    best_ep = np.argmin(val, axis=1)
    accs = acc[np.arange(folds), best_ep]
    return CVResult(
        val_loss=float(val.min(axis=1).mean()),
        test_acc_mean=float(accs.mean()),
        test_acc_std=float(accs.std()),
        durations=durations,
    )
