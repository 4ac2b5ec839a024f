"""NestedPPGN — two-level Provably Powerful Graph Network.

Capability mirror of reference `kernel/ppgn.py:21-240` (also
`ogb_mol_gnn.py:1058-1212`): a dense PPGN runs inside every node-rooted
subgraph copy, each subgraph is pooled with max+mean+min diag/offdiag
pooling into an embedding, and a second dense PPGN runs at graph level
with the subgraph embeddings on the diagonal and the ORIGINAL graph's
adjacency as the edge channel (`kernel/ppgn.py:158-205`).

TPU design: both levels are channels-last dense tensors built on device
from the copies GraphBatch with masked scatters — the subgraph level is
(S, M, M, C) where S is the padded subgraph budget and M the static
max-nodes-per-subgraph; the graph level is (G, K, K, C) where K is the
static max-subgraphs-per-graph (the padded `orig_adj` width emitted by
the batcher). All pooling is mask-aware; RegularBlocks are shared with
the flat PPGN (`escgnn_tpu/models/ppgn.py`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import TorchDense
from escgnn_tpu.models.ppgn import RegularBlock, _pair_mask
from escgnn_tpu.ops.segment import segment_min


NEG = -1e9


def diag_offdiag_pool_masked(x, node_mask_dense, op: str):
    """(B, N, N, C) -> (B, 2C): [diag pool ‖ offdiag pool] with masks.

    Matches reference `modules/ppgn_layers.py` diag_offdiag_{max,mean,min}pool
    restricted to real rows/pairs.
    """
    m = node_mask_dense  # (B, N) bool
    diag = jnp.einsum("bnnc->bnc", x)
    pair = m[:, :, None] & m[:, None, :]
    off = pair & ~jnp.eye(m.shape[1], dtype=bool)[None]
    if op == "mean":
        # f32 accumulation of (possibly bf16) reads — identical math to
        # casting the grid first, half the kernel's bytes (the same
        # change as ppgn.diag_offdiag_meanpool, round 5)
        n_real = jnp.maximum(
            jnp.sum(m, axis=1, dtype=jnp.float32), 1.0
        )
        d = jnp.sum(
            jnp.where(m[..., None], diag, 0), axis=1, dtype=jnp.float32
        ) / n_real[:, None]
        denom = jnp.maximum(n_real * n_real - n_real, 1.0)
        o = jnp.sum(
            jnp.where(off[..., None], x, 0), axis=(1, 2),
            dtype=jnp.float32,
        ) / denom[:, None]
        return jnp.concatenate([d, o], axis=-1)
    sign = 1.0 if op == "max" else -1.0
    xs = (sign * x).astype(jnp.float32)
    ds = (sign * diag).astype(jnp.float32)
    d = jnp.max(jnp.where(m[..., None], ds, NEG), axis=1)
    o = jnp.max(jnp.where(off[..., None], xs, NEG), axis=(1, 2))
    d = jnp.where(d <= NEG, 0.0, d)
    o = jnp.where(o <= NEG, 0.0, o)
    return sign * jnp.concatenate([d, o], axis=-1)


def _local_index(global_idx, segment, num_segments, mask, budget):
    """Index of each element within its (contiguous) segment, clipped to
    [0, budget). MASKED entries return `budget` (out of range) so dense
    (..., budget) scatters DROP them — padding segments can carry
    in-range parent ids (batching.py parks them on the last real graph),
    and an in-range local slot would let their scatter collide with a
    real slot (observed: a padding segment's `.set(False)` stomping a
    real segment's mask bit)."""
    first = segment_min(
        global_idx.astype(jnp.float32), segment, num_segments, mask=mask
    )
    loc = global_idx - first[segment].astype(jnp.int32)
    return jnp.where(mask, jnp.minimum(loc, budget - 1), budget)


@dataclasses.dataclass(frozen=True)
class NestedPPGNConfig:
    emb_dim: int = 64
    num_rb_layers: int = 2
    depth_of_mlp: int = 2
    num_tasks: int = 2
    use_z: bool = True
    use_rd: bool = False
    graph_pred: bool = True  # False -> per-subgraph (node-level) outputs
    max_nodes_per_subgraph: int = 16  # M (static dense budget)
    classify: bool = True  # log_softmax head
    # float32 | bfloat16 RegularBlock stacks (the flat PPGN's bf16
    # recipe gave 1.28x at equal shapes — flagship playbook, round 5)
    compute_dtype: str = "float32"


class NestedPPGN(nn.Module):
    cfg: NestedPPGNConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        cfg = self.cfg
        M = cfg.max_nodes_per_subgraph
        S = batch.segment_mask.shape[0]
        G = batch.num_graphs
        node_mask = batch.node_mask

        # ---- node embedding: [z_emb (+rd) ‖ x] (`kernel/ppgn.py:105-117`)
        x = batch.x
        x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        if cfg.use_z or cfg.use_rd:
            z_emb = 0.0
            if cfg.use_z:
                zt = nn.Embed(
                    1000, 8, embedding_init=nn.initializers.normal(1.0),
                    name="z_embedding",
                )(batch.extras["z"].astype(jnp.int32))
                z_emb = jnp.sum(zt, axis=1)
            if cfg.use_rd:
                z_emb = z_emb + TorchDense(8, name="rd_projection")(
                    batch.extras["rd"].astype(jnp.float32)
                )
            x = jnp.concatenate([z_emb, x], axis=-1)

        # ---- dense per-subgraph build (S, M, M, C)
        idx = jnp.arange(batch.num_nodes, dtype=jnp.int32)
        nloc = _local_index(idx, batch.node_segment, S, node_mask, M)
        nm = jnp.zeros((S, M), bool).at[batch.node_segment, nloc].set(
            node_mask
        )
        e_seg = jnp.take(batch.node_segment, batch.receivers)
        src_l = jnp.take(nloc, batch.senders)
        dst_l = jnp.take(nloc, batch.receivers)
        ea = batch.edge_attr
        if ea is None:
            edge_feat = batch.edge_mask[:, None].astype(jnp.float32)
        else:
            ea = ea.astype(jnp.float32).reshape(ea.shape[0], -1)
            edge_feat = jnp.concatenate(
                [batch.edge_mask[:, None].astype(jnp.float32), ea], axis=-1
            ) * batch.edge_mask[:, None]
        C_e = edge_feat.shape[-1]
        dense_edges = jnp.zeros((S, M, M, C_e), jnp.float32).at[
            e_seg, src_l, dst_l, :
        ].add(edge_feat)
        # node embedding on the diagonal (`kernel/ppgn.py:148-149`)
        xm = jnp.where(node_mask[:, None], x, 0.0)
        diag = jnp.zeros((S, M, x.shape[-1]), jnp.float32).at[
            batch.node_segment, nloc, :
        ].add(xm)
        diag_dense = jnp.einsum(
            "smc,mk->smkc", diag, jnp.eye(M, dtype=jnp.float32)
        )
        z = jnp.concatenate([dense_edges, diag_dense], axis=-1)

        cdt = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32
        )
        rb_dtype = cdt if cfg.compute_dtype == "bfloat16" else None
        pmask = _pair_mask(nm)
        z = (z * pmask).astype(cdt)
        for i in range(cfg.num_rb_layers):
            z = RegularBlock(cfg.emb_dim, cfg.depth_of_mlp,
                             dtype=rb_dtype, name=f"rb{i}")(
                z, pmask
            )

        # subgraph pooling: max + mean + min (`kernel/ppgn.py:176`)
        pooled = (
            diag_offdiag_pool_masked(z, nm, "max")
            + diag_offdiag_pool_masked(z, nm, "mean")
            + diag_offdiag_pool_masked(z, nm, "min")
        )  # (S, 2 emb)
        h = pooled
        # ppgn_fc_g: FullyConnected(2 emb -> emb), (emb -> emb)
        h = nn.relu(TorchDense(cfg.emb_dim, name="fc_g0")(h))
        h = nn.relu(TorchDense(cfg.emb_dim, name="fc_g1")(h))
        h = h * batch.segment_mask[:, None]

        # ---- graph-level dense (G, K, K, emb + 1)
        orig_adj = batch.extras["orig_adj"].astype(jnp.float32)  # (G, K, K)
        K = orig_adj.shape[1]
        sidx = jnp.arange(S, dtype=jnp.int32)
        sloc = _local_index(
            sidx, batch.segment_graph, G, batch.segment_mask, K
        )
        sm = jnp.zeros((G, K), bool).at[batch.segment_graph, sloc].set(
            batch.segment_mask
        )
        diag_g = jnp.zeros((G, K, cfg.emb_dim), jnp.float32).at[
            batch.segment_graph, sloc, :
        ].add(h)
        diag_g_dense = jnp.einsum(
            "gkc,kl->gklc", diag_g, jnp.eye(K, dtype=jnp.float32)
        )
        zg = jnp.concatenate([orig_adj[..., None], diag_g_dense], axis=-1)
        pmask_g = _pair_mask(sm)
        zg = (zg * pmask_g).astype(cdt)
        for i in range(cfg.num_rb_layers):
            zg = RegularBlock(cfg.emb_dim, cfg.depth_of_mlp,
                              dtype=rb_dtype, name=f"rb_g{i}")(
                zg, pmask_g
            )

        if cfg.graph_pred:
            pooled_g = (
                diag_offdiag_pool_masked(zg, sm, "max")
                + diag_offdiag_pool_masked(zg, sm, "mean")
                + diag_offdiag_pool_masked(zg, sm, "min")
            )  # (G, 2 emb)
            out = nn.relu(TorchDense(cfg.emb_dim, name="fc0")(pooled_g))
            out = TorchDense(cfg.num_tasks, name="fc1")(out)
            return nn.log_softmax(out, axis=-1) if cfg.classify else out

        # node-level: diag + row/col sums per subgraph slot, back to the
        # flat subgraph axis (subgraph s <-> original node s under
        # self-loop nesting; reference `kernel/ppgn.py:219-240`)
        row = jnp.sum(jnp.where(pmask_g > 0, zg, 0), axis=2,
                      dtype=jnp.float32)
        col = jnp.sum(jnp.where(pmask_g > 0, zg, 0), axis=1,
                      dtype=jnp.float32)
        dg = jnp.einsum("gkkc->gkc", zg).astype(jnp.float32)
        feat = jnp.concatenate([dg, row + col - 2 * dg], axis=-1)  # (G,K,2emb)
        flat = feat[batch.segment_graph, sloc]  # (S, 2 emb)
        out = nn.relu(TorchDense(cfg.emb_dim, name="fc0")(flat))
        out = TorchDense(cfg.num_tasks, name="fc1")(out)
        return out * batch.segment_mask[:, None]
