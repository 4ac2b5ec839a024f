"""Graph pooling zoo.

TPU-native equivalents of the reference's pooling layers (used by the TU
baselines `kernel/set2set.py`, `kernel/sort_pool.py`, `kernel/top_k.py`,
`kernel/diff_pool.py`, `kernel/graclus.py`, `kernel/global_attention.py`
and the OGB GNN wrapper's pooling switch, reference `ogb_mol_gnn.py:224-248`).

Static-shape notes:
  * `global_sort_pool` and `dense_diff_pool` work on a dense per-graph
    (G, M, F) view built by `to_dense_batch` — graphs here are small
    molecules, so M is tiny and the dense form is MXU-friendly.
  * `TopKPool` keeps the node set static: instead of compacting the kept
    nodes it gates dropped nodes to zero and returns an updated node mask
    — semantically identical for every masked op downstream.
  * `graclus_cluster` (greedy edge matching) is host-side numpy, run at
    featurize/collate time like every other irregular computation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import TorchDense
from escgnn_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


def to_dense_batch(x, batch: GraphBatch, max_nodes: int):
    """(N, F) node features -> (G, M, F) dense per-graph view + (G, M) mask.

    Uses `node_local` (index within own graph) so each graph's nodes land
    in rows [0, n_g); padding rows are zero. The PyG `to_dense_batch`
    equivalent (used by the reference's DiffPool/SortPool baselines)."""
    G = batch.num_graphs
    flat = batch.node_graph * max_nodes + batch.node_local
    dense = segment_sum(
        x, flat, G * max_nodes, mask=batch.node_mask
    ).reshape(G, max_nodes, x.shape[-1])
    mask = segment_sum(
        jnp.ones(x.shape[0], jnp.float32), flat, G * max_nodes,
        mask=batch.node_mask,
    ).reshape(G, max_nodes) > 0
    return dense, mask


class GlobalAttentionPool(nn.Module):
    """gate_nn softmax-weighted sum (PyG GlobalAttention; reference
    `kernel/global_attention.py`, `ogb_mol_gnn.py:214`-ish zoo entry)."""

    gate_hidden: int = 0  # 0 -> single linear gate

    @nn.compact
    def __call__(self, x, batch: GraphBatch):
        g = x
        if self.gate_hidden:
            g = nn.relu(TorchDense(self.gate_hidden, name="gate_hidden")(g))
        gate = TorchDense(1, name="gate")(g)[:, 0]
        attn = segment_softmax(
            gate, batch.node_graph, batch.num_graphs, mask=batch.node_mask
        )
        return segment_sum(
            x * attn[:, None], batch.node_graph, batch.num_graphs,
            mask=batch.node_mask,
        )


class Set2Set(nn.Module):
    """Set2Set pooling (Vinyals et al.; PyG Set2Set, reference
    `kernel/set2set.py`): `processing_steps` rounds of LSTM query ->
    attention over nodes -> readout; returns (G, 2F)."""

    processing_steps: int = 3

    @nn.compact
    def __call__(self, x, batch: GraphBatch, ids=None, mask=None):
        # ids/mask default to node->graph; pass segment->graph ids to
        # pool subgraph rows instead (OgbGNN two-level path)
        ids = batch.node_graph if ids is None else ids
        mask = batch.node_mask if mask is None else mask
        G = batch.num_graphs
        F = x.shape[-1]
        lstm = nn.OptimizedLSTMCell(F, name="lstm")
        carry = (
            jnp.zeros((G, F), x.dtype),
            jnp.zeros((G, F), x.dtype),
        )
        q_star = jnp.zeros((G, 2 * F), x.dtype)
        for _ in range(self.processing_steps):
            carry, q = lstm(carry, q_star)
            e = jnp.sum(x * q[ids], axis=-1)
            a = segment_softmax(e, ids, G, mask=mask)
            r = segment_sum(x * a[:, None], ids, G, mask=mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star


def global_sort_pool(x, batch: GraphBatch, k: int, max_nodes: int):
    """DGCNN SortPooling (PyG global_sort_pool; reference
    `kernel/sort_pool.py`): sort each graph's nodes by the last feature
    channel (descending), keep the first k rows (zero-padded), flatten to
    (G, k * F)."""
    dense, mask = to_dense_batch(x, batch, max_nodes)
    key = jnp.where(mask, dense[..., -1], -jnp.inf)
    order = jnp.argsort(-key, axis=1)[:, :k]  # (G, k)
    top = jnp.take_along_axis(dense, order[..., None], axis=1)
    kept = jnp.take_along_axis(mask, order, axis=1)
    top = jnp.where(kept[..., None], top, 0.0)
    return top.reshape(dense.shape[0], k * x.shape[-1])


class TopKPool(nn.Module):
    """TopK pooling (Gao & Ji; PyG TopKPooling, reference
    `kernel/top_k.py`) in mask form: score = x . p / |p|; nodes whose
    within-graph score rank >= ceil(ratio * n_g) are gated to zero and
    masked out. Returns (x', node_mask')."""

    ratio: float = 0.8

    @nn.compact
    def __call__(self, x, batch: GraphBatch, node_mask):
        p = self.param("weight", nn.initializers.normal(0.1), (x.shape[-1],))
        score = x @ p / jnp.maximum(jnp.linalg.norm(p), 1e-12)
        G = batch.num_graphs
        n = x.shape[0]
        # Within-graph descending rank: globally sort by (graph id asc,
        # score desc) — masked-out nodes sink to the bottom of their graph —
        # then rank_i = sorted position - first sorted position in graph.
        s = jnp.where(node_mask, score, -jnp.inf)
        by_score = jnp.argsort(-s)  # descending score
        perm = by_score[jnp.argsort(batch.node_graph[by_score], stable=True)]
        pos_sorted = jnp.zeros(n, jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        min_pos = -segment_max(
            -pos_sorted.astype(jnp.float32), batch.node_graph, G
        )
        rank = pos_sorted.astype(jnp.float32) - min_pos[batch.node_graph]
        n_per_graph = segment_sum(
            node_mask.astype(jnp.float32), batch.node_graph, G
        )
        keep_n = jnp.ceil(self.ratio * n_per_graph)
        keep = (rank < keep_n[batch.node_graph]) & node_mask
        gate = jnp.tanh(score)
        x_out = jnp.where(keep[:, None], x * gate[:, None], 0.0)
        return x_out, keep


def dense_diff_pool(x_dense, adj_dense, s_logits, mask):
    """DiffPool (Ying et al.; PyG dense_diff_pool, reference
    `kernel/diff_pool.py`): S = softmax(s_logits); X' = S^T X;
    A' = S^T A S; returns (x', adj', link_loss, ent_loss)."""
    s = jax.nn.softmax(s_logits, axis=-1)
    s = jnp.where(mask[..., None], s, 0.0)
    x_out = jnp.einsum("bnk,bnf->bkf", s, x_dense)
    adj_out = jnp.einsum("bnk,bnm,bml->bkl", s, adj_dense, s)
    link = adj_dense - jnp.einsum("bnk,bmk->bnm", s, s)
    denom = jnp.maximum(jnp.sum(mask, axis=(1,)), 1)
    link_loss = jnp.sum(link * link, axis=(1, 2)) / (
        denom.astype(link.dtype) ** 2
    )
    ent = -jnp.sum(
        jnp.where(s > 1e-15, s * jnp.log(s + 1e-15), 0.0), axis=-1
    )
    ent_loss = jnp.sum(jnp.where(mask, ent, 0.0), axis=1) / denom
    return x_out, adj_out, jnp.mean(link_loss), jnp.mean(ent_loss)


def batch_dense_adj(batch: GraphBatch, max_nodes: int):
    """Dense (G, M, M) adjacency from the padded edge list."""
    G = batch.num_graphs
    eg = jnp.take(batch.node_graph, batch.receivers)
    flat = (
        eg * max_nodes * max_nodes
        + jnp.take(batch.node_local, batch.senders) * max_nodes
        + jnp.take(batch.node_local, batch.receivers)
    )
    adj = segment_sum(
        jnp.ones(batch.senders.shape[0], jnp.float32),
        flat, G * max_nodes * max_nodes, mask=batch.edge_mask,
    )
    return adj.reshape(G, max_nodes, max_nodes)


def graclus_cluster(
    edge_index: np.ndarray,
    num_nodes: int,
    edge_weight: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """Greedy heavy-edge matching (graclus; torch_cluster.graclus
    equivalent used by reference `kernel/graclus.py`). Host-side numpy.
    Returns (N,) cluster ids in [0, num_clusters)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(num_nodes)
    cluster = np.full(num_nodes, -1, np.int64)
    src, dst = edge_index[0], edge_index[1]
    if edge_weight is None:
        edge_weight = np.ones(src.shape[0], np.float64)
    # adjacency lists
    adj: list[list[tuple[int, float]]] = [[] for _ in range(num_nodes)]
    for s, d, w in zip(src.tolist(), dst.tolist(), edge_weight.tolist()):
        if s != d:
            adj[s].append((d, float(w)))
    next_id = 0
    for v in order.tolist():
        if cluster[v] >= 0:
            continue
        best, best_w = -1, -1.0
        for u, w in adj[v]:
            if cluster[u] < 0 and w > best_w:
                best, best_w = u, w
        cluster[v] = next_id
        if best >= 0:
            cluster[best] = next_id
        next_id += 1
    return cluster


def pool_by_cluster(x, cluster, num_clusters: int, mask=None, how="avg"):
    """avg/max pool node rows into cluster rows (k_gnn avg_pool / PyG
    avg_pool_x equivalents)."""
    if how == "avg":
        return segment_mean(x, cluster, num_clusters, mask=mask)
    if how == "max":
        return segment_max(x, cluster, num_clusters, mask=mask)
    return segment_sum(x, cluster, num_clusters, mask=mask)


def graph_pool(module: nn.Module, how: str, x, batch: GraphBatch, sort_k=10):
    """Pooling dispatcher used by the model wrappers."""
    G = batch.num_graphs
    if how == "add":
        return segment_sum(x, batch.node_graph, G, mask=batch.node_mask)
    if how == "mean":
        return segment_mean(x, batch.node_graph, G, mask=batch.node_mask)
    if how == "max":
        return segment_max(x, batch.node_graph, G, mask=batch.node_mask)
    if how == "attention":
        return GlobalAttentionPool(name="attn_pool")(x, batch)
    if how == "set2set":
        return Set2Set(name="set2set")(x, batch)
    if how == "sort":
        # static per-graph budget: the batcher guarantees
        # num_nodes >= num_graphs * max_nodes_per_graph
        m = max(-(-x.shape[0] // max(G, 1)), sort_k)
        return global_sort_pool(x, batch, sort_k, m)
    if how == "center":
        # root node of each graph = local index 0 (reference 'center'
        # pooling picks the subgraph root, ogb_mol_gnn.py:224-248)
        is_root = (batch.node_local == 0) & batch.node_mask
        return segment_sum(
            jnp.where(is_root[:, None], x, 0.0), batch.node_graph, G
        )
    raise ValueError(how)
