"""Node-level cycle-prediction trainers.

Capability mirror of the reference's cycle trainers
(`kernel/train_eval.py:333-691`):

  * `train_val_cycles` (`:359-444`) — ONE graph, random node split,
    `BCEWithLogitsLoss` on binarized per-node cycle counts; metrics
    accuracy / ROC-AUC / average precision; best epoch by val AP.
  * `train_val_cycles_regression` (`:446-561`) — same node split, MSE
    regression with deep-supervision auxiliary losses
    `mse(ys[i], true[:, :w_i]) / 10` (`:457-460`); best epoch by val MAE.
  * `train_val_cycles_regression_GC` (`:564-691`) — graph-level split
    over a multi-graph dataset, batched loaders, aux losses
    `/ len(ys)` (`:580-582`); node-level predictions concatenated across
    batches for eval (`:588-603`).

Differences from the reference, by design:
  * cycle labels are computed in-repo (`data/counting.py
    count_cycles_per_node`) instead of loaded from the reference's
    out-of-tree `/data1/count_cycles/<name>.pt` blobs
    (`kernel/train_eval.py:382-383`);
  * the classification threshold is `logit > 0` (= prob 0.5); the
    reference thresholds the raw logit at 0.5 (`:354`);
  * losses/metrics are masked over padding rows (static-shape batching).

Models must emit one prediction row per original node (`node_level=True`
on `BaselineGNN`, or any edge-nest model that runs on the original
graph); `multi_layer=True` models return `(out, ys)`.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.train.loop import TrainState, set_learning_rate


def node_split(
    num_nodes: int, split_ratio: float, seed: int = 1234
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random (train, val, test) node index split: `split_ratio` train,
    the rest halved (reference `kernel/train_eval.py:385-389`)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(num_nodes)
    a = int(split_ratio * num_nodes)
    b = int((split_ratio + 1) / 2 * num_nodes)
    return idx[:a], idx[a:b], idx[b:]


def _split_masks(rows: int, parts: Sequence[np.ndarray]) -> list[np.ndarray]:
    out = []
    for p in parts:
        m = np.zeros(rows, bool)
        m[p] = True
        out.append(m)
    return out


def _normalize_out(res):
    """Model output -> (out, ys); plain-tensor models have no aux heads
    (reference `kernel/gcn.py:223` returns `(x, [])`)."""
    if isinstance(res, tuple):
        return res
    return res, []


def _row_layout(batch) -> tuple[int, np.ndarray]:
    """(rows, row_mask) of the model's per-original-node output: segment
    rows for node-copy models, node rows otherwise."""
    if batch.node_segment is not None:
        return batch.segment_mask.shape[0], np.asarray(batch.segment_mask)
    return batch.node_mask.shape[0], np.asarray(batch.node_mask)


@dataclasses.dataclass
class CycleResult:
    best_val: float
    test_metrics: tuple  # metrics at the best-val epoch
    history: list
    duration: float


def _masked_mse(pred, true, mask):
    d = (pred - true) ** 2
    m = mask.astype(d.dtype)[:, None]
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m) * d.shape[-1], 1.0)


def _masked_bce(logits, true, mask):
    per = jnp.maximum(logits, 0) - logits * true + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    m = mask.astype(per.dtype)[:, None]
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * per.shape[-1], 1.0)


def _make_cycle_step(model, kind: str, aux_scale: Optional[Callable]):
    """Jitted train step over one padded batch with explicit targets.

    `kind`: 'bce' | 'mse'. `aux_scale(num_aux) -> weight` enables the
    deep-supervision losses (None disables, reference `train_cycle` has
    none)."""

    @partial(jax.jit, donate_argnums=(0,), static_argnames=())
    def step(state: TrainState, batch, true, mask, rng):
        def compute(params):
            res, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            out, ys = _normalize_out(res)
            # widths are static under jit; compare the common prefix of
            # columns (reference truncates `true[:, :out.size()[1]]`,
            # kernel/train_eval.py:575)
            w = min(out.shape[-1], true.shape[-1])
            if kind == "bce":
                loss = _masked_bce(out[:, :w], true[:, :w], mask)
            else:
                loss = _masked_mse(out[:, :w], true[:, :w], mask)
            if aux_scale is not None and ys:
                w_aux = aux_scale(len(ys))
                for a in ys:
                    wa = min(a.shape[-1], true.shape[-1])
                    loss = loss + w_aux * _masked_mse(
                        a[:, :wa], true[:, :wa], mask
                    )
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    return step


def _make_predict(model):
    @jax.jit
    def predict(params, batch_stats, batch):
        res = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, deterministic=True, use_running_average=True,
        )
        out, _ = _normalize_out(res)
        return out

    return predict


def _cls_metrics(true: np.ndarray, logits: np.ndarray):
    """(accuracy, roc_auc, ap) over binarized multi-column labels,
    column-averaged, degenerate columns skipped (the reference calls
    sklearn on the full matrices, `kernel/train_eval.py:354-357`)."""
    from sklearn.metrics import (
        accuracy_score,
        average_precision_score,
        roc_auc_score,
    )

    pred = (logits > 0).astype(np.int64)
    acc = accuracy_score(true.reshape(-1), pred.reshape(-1))
    aucs, aps = [], []
    for c in range(true.shape[1]):
        yt = true[:, c]
        if len(np.unique(yt)) < 2:
            continue
        aucs.append(roc_auc_score(yt, logits[:, c]))
        aps.append(average_precision_score(yt, logits[:, c]))
    auc = float(np.mean(aucs)) if aucs else float("nan")
    ap = float(np.mean(aps)) if aps else float("nan")
    return float(acc), auc, ap


def _reg_metrics(true: np.ndarray, pred: np.ndarray):
    """(mse, mae, rmse) — reference `eval_cycle_regression`
    (`kernel/train_eval.py:466-476`)."""
    d = pred - true
    mse = float(np.mean(d * d))
    return mse, float(np.mean(np.abs(d))), float(np.sqrt(mse))


def _single_graph_setup(graph, cycles, model, lr, weight_decay, seed):
    spec = BatchSpec.from_graphs([graph], batch_size=1)
    batch = pad_and_batch([graph], spec)
    rows, row_mask = _row_layout(batch)
    n = int(np.asarray(cycles).shape[0])
    assert row_mask[:n].all(), "cycle labels must cover the real rows"
    true = np.zeros((rows, np.asarray(cycles).shape[1]), np.float32)
    true[:n] = np.asarray(cycles, np.float32)

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.inject_hyperparams(optax.adam)(learning_rate=lr),
    )
    rng = jax.random.key(seed)
    variables = model.init(rng, jax.tree.map(jnp.asarray, batch))
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    batch = jax.tree.map(jnp.asarray, batch)
    return spec, batch, n, true, state, rng


def _step_decay(state, epoch, lr_holder, factor, step_size):
    if step_size and epoch % step_size == 0:
        lr_holder[0] *= factor
        state = set_learning_rate(state, lr_holder[0])
    return state


def train_val_cycles(
    graph: GraphData,
    cycles: np.ndarray,
    model,
    *,
    split_ratio: float = 0.3,
    epochs: int = 100,
    lr: float = 1e-2,
    lr_decay_factor: float = 0.5,
    lr_decay_step_size: int = 50,
    weight_decay: float = 0.0,
    seed: int = 1234,
    logger: Optional[Callable[[str], None]] = None,
) -> CycleResult:
    """Binary cycle-membership classification on one graph's node split
    (reference `train_val_cycles`, `kernel/train_eval.py:359-444`)."""
    t0 = time.perf_counter()
    cyc = (np.asarray(cycles) != 0).astype(np.float32)
    spec, batch, n, true, state, rng = _single_graph_setup(
        graph, cyc, model, lr, weight_decay, seed
    )
    tr, va, te = node_split(n, split_ratio, seed)
    rows = true.shape[0]
    tr_m, va_m, te_m = _split_masks(rows, (tr, va, te))
    step = _make_cycle_step(model, "bce", None)
    predict = _make_predict(model)
    true_j = jnp.asarray(true)
    tr_j = jnp.asarray(tr_m)

    history, cur_val, cur_test = [], [], []
    lr_holder = [lr]
    for epoch in range(1, epochs + 1):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, batch, true_j, tr_j, sub)
        logits = np.asarray(predict(state.params, state.batch_stats, batch))
        logits = logits[:, : cyc.shape[1]]
        cur_val.append(_cls_metrics(cyc[va], logits[va])[2])
        cur_test.append(_cls_metrics(cyc[te], logits[te]))
        history.append(
            {"epoch": epoch, "train_loss": float(loss),
             "val_ap": cur_val[-1], "test_ap": cur_test[-1][2]}
        )
        if logger:
            logger(
                f"epoch {epoch:03d} loss {float(loss):.4f} "
                f"val_ap {cur_val[-1]:.4f} test_ap {cur_test[-1][2]:.4f}"
            )
        state = _step_decay(
            state, epoch, lr_holder, lr_decay_factor, lr_decay_step_size
        )
    # best val AP (reference :428); all-NaN val AP (degenerate split
    # columns) falls back to the last epoch
    vals = np.asarray(cur_val)
    best = int(np.nanargmax(vals)) if not np.isnan(vals).all() else len(vals) - 1
    return CycleResult(
        best_val=cur_val[best],
        test_metrics=cur_test[best],
        history=history,
        duration=time.perf_counter() - t0,
    )


def train_val_cycles_regression(
    graph: GraphData,
    cycles: np.ndarray,
    model,
    *,
    split_ratio: float = 0.3,
    epochs: int = 100,
    lr: float = 1e-2,
    lr_decay_factor: float = 0.5,
    lr_decay_step_size: int = 50,
    weight_decay: float = 0.0,
    seed: int = 1234,
    logger: Optional[Callable[[str], None]] = None,
) -> CycleResult:
    """Per-node cycle-count regression on one graph's node split with
    deep-supervision aux losses `/10` (reference
    `train_val_cycles_regression`, `kernel/train_eval.py:446-561`)."""
    t0 = time.perf_counter()
    cyc = np.asarray(cycles, np.float32)
    spec, batch, n, true, state, rng = _single_graph_setup(
        graph, cyc, model, lr, weight_decay, seed
    )
    tr, va, te = node_split(n, split_ratio, seed)
    tr_m, va_m, te_m = _split_masks(true.shape[0], (tr, va, te))
    step = _make_cycle_step(model, "mse", lambda k: 0.1)
    predict = _make_predict(model)
    true_j = jnp.asarray(true)
    tr_j = jnp.asarray(tr_m)

    history, cur_val, cur_test = [], [], []
    lr_holder = [lr]
    for epoch in range(1, epochs + 1):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, batch, true_j, tr_j, sub)
        pred = np.asarray(predict(state.params, state.batch_stats, batch))
        w = min(pred.shape[1], cyc.shape[1])
        cur_val.append(_reg_metrics(cyc[va, :w], pred[va, :w])[1])
        cur_test.append(_reg_metrics(cyc[te, :w], pred[te, :w]))
        history.append(
            {"epoch": epoch, "train_loss": float(loss),
             "val_mae": cur_val[-1], "test_mae": cur_test[-1][1]}
        )
        if logger:
            logger(
                f"epoch {epoch:03d} loss {float(loss):.4f} "
                f"val_mae {cur_val[-1]:.4f} test_mae {cur_test[-1][1]:.4f}"
            )
        state = _step_decay(
            state, epoch, lr_holder, lr_decay_factor, lr_decay_step_size
        )
    best = int(np.argmin(cur_val))  # best val MAE (reference :542)
    return CycleResult(
        best_val=cur_val[best],
        test_metrics=cur_test[best],
        history=history,
        duration=time.perf_counter() - t0,
    )


def _chunk_targets(chunk: Sequence[GraphData], cycles, spec, width):
    """Padded (rows, width) targets + row mask for one batch chunk:
    rows are segments for node-copy graphs (contiguous per graph,
    `batching.py _batch_segments`), nodes otherwise."""
    nested = bool((chunk[0].extras or {}).get("num_subgraphs", 0))
    rows = spec.num_segments if nested else spec.num_nodes
    t = np.zeros((rows, width), np.float32)
    m = np.zeros(rows, bool)
    off = 0
    for g, c in zip(chunk, cycles):
        k = int((g.extras or {})["num_subgraphs"]) if nested else g.num_nodes
        c = np.asarray(c, np.float32)
        assert c.shape[0] == k, (c.shape, k)
        t[off:off + k] = c[:, :width]
        m[off:off + k] = True
        off += k
    return t, m


def train_val_cycles_regression_GC(
    graphs: Sequence[GraphData],
    cycles: Sequence[np.ndarray],
    model,
    *,
    split_ratio: float = 0.3,
    epochs: int = 100,
    batch_size: int = 32,
    lr: float = 1e-2,
    lr_decay_factor: float = 0.5,
    lr_decay_step_size: int = 50,
    weight_decay: float = 0.0,
    seed: int = 1234,
    logger: Optional[Callable[[str], None]] = None,
) -> CycleResult:
    """Graph-split cycle regression over a multi-graph dataset with
    batched loaders; aux losses `/ len(ys)` (reference
    `train_val_cycles_regression_GC`, `kernel/train_eval.py:564-691`)."""
    t0 = time.perf_counter()
    rng_np = np.random.default_rng(seed)
    g_idx = rng_np.permutation(len(graphs))
    a = int(split_ratio * len(graphs))
    b = int((split_ratio + 1) / 2 * len(graphs))
    tr, va, te = g_idx[:a], g_idx[a:b], g_idx[b:]

    spec = BatchSpec.from_graphs(list(graphs), batch_size=batch_size)
    assert spec.uniform_nodes == 0, "dense uniform layout unsupported here"
    width = int(np.asarray(cycles[0]).shape[1])

    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.inject_hyperparams(optax.adam)(learning_rate=lr),
    )
    rng = jax.random.key(seed)
    first = pad_and_batch([graphs[i] for i in tr[:batch_size]], spec)
    variables = model.init(rng, jax.tree.map(jnp.asarray, first))
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), tx
    )
    step = _make_cycle_step(model, "mse", lambda k: 1.0 / k)
    predict = _make_predict(model)

    def batches_of(ids):
        for i in range(0, len(ids), batch_size):
            chunk_ids = ids[i:i + batch_size]
            chunk = [graphs[j] for j in chunk_ids]
            batch = pad_and_batch(chunk, spec)
            t, m = _chunk_targets(
                chunk, [cycles[j] for j in chunk_ids], spec, width
            )
            yield jax.tree.map(jnp.asarray, batch), t, m

    # eval pools built once (fixed order)
    def eval_pool(ids):
        return [
            (bt, t, m) for bt, t, m in batches_of(ids)
        ]

    va_pool, te_pool = eval_pool(va), eval_pool(te)

    def eval_metrics(pool):
        preds, trues = [], []
        for bt, t, m in pool:
            out = np.asarray(predict(state.params, state.batch_stats, bt))
            w = min(out.shape[1], width)
            preds.append(out[m, :w])
            trues.append(t[m, :w])
        return _reg_metrics(np.concatenate(trues), np.concatenate(preds))

    history, cur_val, cur_test = [], [], []
    lr_holder = [lr]
    for epoch in range(1, epochs + 1):
        order = rng_np.permutation(tr)  # reference reshuffles train ids
        total, cnt = 0.0, 0
        for bt, t, m in batches_of(order):
            rng, sub = jax.random.split(rng)
            state, loss = step(
                state, bt, jnp.asarray(t), jnp.asarray(m), sub
            )
            total += float(loss)
            cnt += 1
        cur_val.append(eval_metrics(va_pool)[1])
        cur_test.append(eval_metrics(te_pool))
        history.append(
            {"epoch": epoch, "train_loss": total / max(cnt, 1),
             "val_mae": cur_val[-1], "test_mae": cur_test[-1][1]}
        )
        if logger:
            logger(
                f"epoch {epoch:03d} loss {total / max(cnt, 1):.4f} "
                f"val_mae {cur_val[-1]:.4f} test_mae {cur_test[-1][1]:.4f}"
            )
        state = _step_decay(
            state, epoch, lr_holder, lr_decay_factor, lr_decay_step_size
        )
    best = int(np.argmin(cur_val))
    return CycleResult(
        best_val=cur_val[best],
        test_metrics=cur_test[best],
        history=history,
        duration=time.perf_counter() - t0,
    )
