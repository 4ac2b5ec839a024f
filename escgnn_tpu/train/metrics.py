"""Metrics + losses for the benchmark drivers.

Replaces the reference's OGB `Evaluator` + sklearn calls
(`run_ogb_mol.py:148-149`, `kernel/train_eval.py:306-318`): ROC-AUC and
average precision computed host-side (sklearn), NaN-masked BCE on device
(`run_ogb_mol.py:65-72` masks unlabeled targets the same way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.container import GraphBatch


def masked_bce_with_logits(logits: jax.Array, batch: GraphBatch) -> jax.Array:
    """BCE over labeled (non-NaN) entries of real graphs."""
    y = batch.y
    labeled = ~jnp.isnan(y) & batch.graph_mask[:, None]
    y_safe = jnp.where(labeled, y, 0.0)
    per = optax_sigmoid_bce(logits, y_safe)
    per = jnp.where(labeled, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(labeled), 1.0)


def optax_sigmoid_bce(logits, labels):
    # log(1 + exp(-|x|)) formulation for stability
    zeros = jnp.zeros_like(logits)
    relu_logits = jnp.maximum(logits, zeros)
    return relu_logits - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def rocauc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Mean ROC-AUC over tasks with both classes present (OGB convention)."""
    from sklearn.metrics import roc_auc_score

    aucs = []
    for t in range(y_true.shape[1]):
        m = ~np.isnan(y_true[:, t])
        yt = y_true[m, t]
        if len(np.unique(yt)) < 2:
            continue
        aucs.append(roc_auc_score(yt, y_score[m, t]))
    return float(np.mean(aucs)) if aucs else float("nan")


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Mean AP over tasks with positives (ogbg-molpcba's metric)."""
    from sklearn.metrics import average_precision_score

    aps = []
    for t in range(y_true.shape[1]):
        m = ~np.isnan(y_true[:, t])
        yt = y_true[m, t]
        if yt.sum() == 0 or yt.sum() == len(yt):
            continue
        aps.append(average_precision_score(yt, y_score[m, t]))
    return float(np.mean(aps)) if aps else float("nan")


def link_pair_loss(node_emb: jax.Array, batch: GraphBatch) -> jax.Array:
    """Dot-decoded link-prediction BCE over labeled pairs.

    `node_emb` is the (N, D) output of the inductive-edge head
    (models/gps.py head="inductive_edge"); pairs/labels/masks come from
    the batcher's pair arrays (the reference scores
    x[edge_index_labeled] via a dot decoder and BCEs against
    edge_label — GraphGPS/graphgps/head/inductive_edge.py:39,49-56 with
    cfg.model.edge_decoding='dot')."""
    ex = batch.extras
    pi = ex["pair_index"].astype(jnp.int32)
    v1 = jnp.take(node_emb, pi[0], axis=0)
    v2 = jnp.take(node_emb, pi[1], axis=0)
    logits = jnp.sum(v1 * v2, axis=-1)
    mask = ex["pair_mask"]
    per = optax_sigmoid_bce(logits, ex["pair_label"].astype(jnp.float32))
    return jnp.sum(jnp.where(mask, per, 0.0)) / jnp.maximum(
        jnp.sum(mask), 1
    )


def eval_mrr(y_pred_pos: np.ndarray, y_pred_neg: np.ndarray) -> dict:
    """Hits@{1,3,10} + MRR of positives ranked against their negatives.

    Mirrors the reference's `_eval_mrr`
    (GraphGPS/graphgps/head/inductive_edge.py:115-139, itself the OGB
    linkproppred evaluator): the positive score is prepended to its
    negative row, rows are argsorted descending, and the positive's
    rank (1-based) yields hits@k / reciprocal rank. Stable argsort, so
    score ties resolve in favor of the positive — same optimistic tie
    rule as torch.argsort on the reference's path.

    y_pred_pos: (B,); y_pred_neg: (B, num_neg). Returns per-edge
    arrays under 'hits@k_list' / 'mrr_list' keys like the reference."""
    y_pred = np.concatenate(
        [y_pred_pos.reshape(-1, 1), y_pred_neg], axis=1
    )
    argsort = np.argsort(-y_pred, axis=1, kind="stable")
    ranking = np.nonzero(argsort == 0)[1] + 1
    return {
        "hits@1_list": (ranking <= 1).astype(np.float64),
        "hits@3_list": (ranking <= 3).astype(np.float64),
        "hits@10_list": (ranking <= 10).astype(np.float64),
        "mrr_list": 1.0 / ranking.astype(np.float64),
    }


def graph_link_mrr(scores: np.ndarray, pair_index: np.ndarray,
                   pair_label: np.ndarray, num_nodes: int) -> dict:
    """One graph's MRR/hits from a dense (M, M) score matrix.

    Mirrors `compute_mrr` (inductive_edge.py:62-113): for every
    positive (i, j), the candidate set is j's score among ALL nodes of
    the graph except the true tail itself (self-loops included, other
    positives of i included — exactly the reference's neg_mask).
    Returns {} when the graph has no positive pairs (the reference
    emits empty stats)."""
    pos = pair_index[:, pair_label == 1]
    n_pos = pos.shape[1]
    if n_pos == 0:
        return {}
    pred = scores[:num_nodes, :num_nodes]
    pred_pos = pred[pos[0], pos[1]]
    neg_mask = np.ones((n_pos, num_nodes), bool)
    neg_mask[np.arange(n_pos), pos[1]] = False
    pred_neg = pred[pos[0]][neg_mask].reshape(n_pos, -1)
    out = eval_mrr(pred_pos, pred_neg)
    return {k[: -len("_list")]: float(v.mean()) for k, v in out.items()}
