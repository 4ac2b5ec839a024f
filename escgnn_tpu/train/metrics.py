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
