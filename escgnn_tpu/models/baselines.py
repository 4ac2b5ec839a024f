"""Baseline message-passing convolutions and the TU-benchmark model zoo.

TPU-native re-implementations of the reference's baseline stack
(reference `kernel/*.py`, `zinc_models.py:42-113,648-794`): plain GCN /
GraphSAGE / GIN / GAT / RGCN / PNA convolutions, the experimental
directional GCNConv (reference `kernel/gcn_conv.py:169-246`), and a
configurable `BaselineGNN` wrapper covering the reference's TU models
(GCN `kernel/gcn.py:10`, NestedGCN `kernel/gcn.py:166`, GraphSAGE
`kernel/graph_sage.py`, GIN0/GIN `kernel/gin.py`, GAT `kernel/gat.py`)
plus the RGCN QM9 baseline (`zinc_models.py:42-113`).

All convolutions run over the padded edge list of a `GraphBatch`:
gather sender rows, mask, masked sorted segment reduction — no scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import MLP, MaskedBatchNorm, TorchDense
from escgnn_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)


def _degree(receivers, num_nodes, edge_mask):
    ones = edge_mask.astype(jnp.float32)
    return segment_sum(ones, receivers, num_nodes, indices_are_sorted=True)


class GCNConv(nn.Module):
    """PyG-semantics GCNConv: out_i = sum_j 1/sqrt(d_i d_j) * (x_j W) + b.

    `add_self_loops=True` adds the analytic self contribution x_i W / d_i
    instead of materializing loop edges (degrees include the loop), which
    keeps the padded edge budget untouched. Fills the role of PyG's
    `GCNConv` in the reference TU baselines (`kernel/gcn.py:10-163`).
    """

    features: int
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, edge_weight=None):
        n = x.shape[0]
        h = TorchDense(self.features, use_bias=False, name="lin")(x)
        deg = _degree(receivers, n, edge_mask)
        if edge_weight is not None:
            deg = segment_sum(
                edge_weight, receivers, n, mask=edge_mask,
                indices_are_sorted=True,
            )
        if self.add_self_loops:
            deg = deg + 1.0
        inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12)), 0.0)
        w = inv_sqrt[senders] * inv_sqrt[receivers]
        if edge_weight is not None:
            w = w * edge_weight
        agg = segment_sum(
            jnp.take(h, senders, axis=0) * w[:, None],
            receivers, n, mask=edge_mask, indices_are_sorted=True,
        )
        if self.add_self_loops:
            agg = agg + h * (inv_sqrt * inv_sqrt)[:, None]
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return agg + bias


class DirectionalGCNConv(nn.Module):
    """The reference's experimental hop-directional GCNConv
    (`kernel/gcn_conv.py:169-246`): gcn-normalized messages are split by
    the *hop-label direction* of each edge and aggregated with `add` on
    "up" edges and `min` on "down" edges, then summed. The up predicate is
    replicated literally (including its integer-arithmetic precedence):
    up = ((s < r) & (z_s == z_r)).astype(int) + z_s < z_r.
    """

    features: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, z):
        n = x.shape[0]
        h = TorchDense(self.features, use_bias=False, name="lin")(x)
        deg = _degree(receivers, n, edge_mask) + 1.0
        inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
        w = inv_sqrt[senders] * inv_sqrt[receivers]
        zs = z[senders].astype(jnp.int32)
        zr = z[receivers].astype(jnp.int32)
        tie = ((senders < receivers) & (zs == zr)).astype(jnp.int32)
        up = (tie + zs) < zr
        msg = jnp.take(h, senders, axis=0) * w[:, None]
        agg_up = segment_sum(
            msg, receivers, n, mask=edge_mask & up, indices_are_sorted=True
        )
        agg_dn = segment_min(
            msg, receivers, n, mask=edge_mask & (~up), indices_are_sorted=True
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return agg_up + agg_dn + bias


class SAGEConv(nn.Module):
    """GraphSAGE mean-aggregator conv (reference `kernel/graph_sage.py`)."""

    features: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask):
        n = x.shape[0]
        agg = segment_mean(
            jnp.take(x, senders, axis=0), receivers, n,
            mask=edge_mask, indices_are_sorted=True,
        )
        return TorchDense(self.features, name="lin_l")(agg) + TorchDense(
            self.features, use_bias=False, name="lin_r"
        )(x)


class GINConv(nn.Module):
    """PyG GINConv: mlp((1 + eps) x + sum_j x_j). `train_eps=False` is the
    reference's GIN0 (`kernel/gin.py:10-100`)."""

    mlp: nn.Module
    train_eps: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, node_mask=None, **kw):
        n = x.shape[0]
        agg = segment_sum(
            jnp.take(x, senders, axis=0), receivers, n,
            mask=edge_mask, indices_are_sorted=True,
        )
        if self.train_eps:
            eps = self.param("eps", nn.initializers.zeros, ())
        else:
            eps = 0.0
        return self.mlp((1.0 + eps) * x + agg, node_mask, **kw)


class GATConv(nn.Module):
    """PyG-semantics GATConv with `heads` attention heads
    (reference `kernel/gat.py`): alpha = softmax_i(LeakyReLU(
    a_src . (W x_j) + a_dst . (W x_i))), out = concat_h sum_j alpha * W x_j.
    Self-loops are added analytically (a padded-edge-budget-free loop term
    entering the same softmax via an exp-sum correction is equivalent to
    appending (i, i) edges)."""

    features: int  # per-head
    heads: int = 1
    negative_slope: float = 0.2
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask):
        n = x.shape[0]
        H, F = self.heads, self.features
        h = TorchDense(H * F, use_bias=False, name="lin")(x).reshape(n, H, F)
        a_src = self.param("att_src", nn.initializers.normal(0.1), (H, F))
        a_dst = self.param("att_dst", nn.initializers.normal(0.1), (H, F))
        alpha_src = jnp.sum(h * a_src, axis=-1)  # (N, H)
        alpha_dst = jnp.sum(h * a_dst, axis=-1)
        logits = nn.leaky_relu(
            alpha_src[senders] + alpha_dst[receivers], self.negative_slope
        )  # (E, H)
        if not self.add_self_loops:
            attn = segment_softmax(
                logits, receivers, n, mask=edge_mask, indices_are_sorted=True
            )
            out = segment_sum(
                jnp.take(h, senders, axis=0) * attn[..., None],
                receivers, n, mask=edge_mask, indices_are_sorted=True,
            )
            return out.reshape(n, H * F)
        # softmax over {neighbors} u {self}: subtract the shared max, then
        # normalize the edge terms and the self term by the combined sum.
        self_logit = nn.leaky_relu(
            alpha_src + alpha_dst, self.negative_slope
        )  # (N, H)
        mx = segment_max(
            logits, receivers, n, mask=edge_mask, indices_are_sorted=True,
            empty_value=-jnp.inf,
        )
        mx = jnp.maximum(mx, self_logit)
        ex_e = jnp.where(
            edge_mask[:, None], jnp.exp(logits - mx[receivers]), 0.0
        )
        ex_s = jnp.exp(self_logit - mx)
        denom = (
            segment_sum(ex_e, receivers, n, indices_are_sorted=True) + ex_s
        )
        denom = jnp.maximum(denom, 1e-16)
        num = segment_sum(
            jnp.take(h, senders, axis=0) * ex_e[..., None],
            receivers, n, indices_are_sorted=True,
        ) + h * ex_s[..., None]
        return (num / denom[..., None]).reshape(n, H * F)


class RGCNConv(nn.Module):
    """Relational GCN conv (reference `zinc_models.py:59-65` uses PyG
    RGCNConv with aggr='add' over bond types): out = x W_root +
    sum_r sum_{j in N_r(i)} x_j W_r. Relations arrive as int ids or as
    one-hot rows (argmax is taken). The per-relation transform is one
    batched matmul (E, F) x (R, F, F') contracted through the relation
    one-hot — MXU-friendly, no per-relation gather."""

    features: int
    num_relations: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, edge_type):
        n = x.shape[0]
        if edge_type.ndim == 2:
            edge_type = jnp.argmax(edge_type, axis=-1)
        edge_type = edge_type.astype(jnp.int32).reshape(-1)
        w_rel = self.param(
            "w_rel",
            nn.initializers.lecun_normal(),
            (self.num_relations, x.shape[-1], self.features),
        )
        # (E, R) one-hot  x  (R, F*F') -> per-edge weight, then row matvec
        # is O(E F F' R). For the small R here (bond types), instead gather
        # the relation matrix per edge: (E, F, F')
        w_e = jnp.take(w_rel, edge_type, axis=0)
        msg = jnp.einsum(
            "ef,efg->eg", jnp.take(x, senders, axis=0), w_e,
            preferred_element_type=jnp.float32,
        )
        agg = segment_sum(
            msg, receivers, n, mask=edge_mask, indices_are_sorted=True
        )
        return agg + TorchDense(self.features, name="lin_root")(x)


class PNAConv(nn.Module):
    """Principal Neighbourhood Aggregation conv — TPU-native equivalent of
    the reference's local PNAConv copy (`zinc_models.py:648-794`):
    aggregators (mean, min, max, std) x scalers (identity, amplification,
    attenuation), tower split, pre/post per-tower MLPs.

    `avg_deg_log` is E[log(d + 1)] over the training graphs (the reference
    computes it from a degree histogram, `run_ogb_mol.py:377-387`).
    """

    features: int
    towers: int = 1
    avg_deg_log: float = 1.0
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, edge_attr=None):
        n = x.shape[0]
        F_in = x.shape[-1]
        assert F_in % self.towers == 0 and self.features % self.towers == 0
        f_in = F_in // self.towers
        f_out = self.features // self.towers
        xt = x.reshape(n, self.towers, f_in)
        src = jnp.take(xt, senders, axis=0)
        dst = jnp.take(xt, receivers, axis=0)
        parts = [dst, src]
        if edge_attr is not None and self.edge_dim is not None:
            e = TorchDense(f_in, name="lin_edge")(
                edge_attr.astype(jnp.float32).reshape(edge_attr.shape[0], -1)
            )
            parts.append(jnp.broadcast_to(e[:, None, :], src.shape))
        m = jnp.concatenate(parts, axis=-1)
        # pre-tower MLP (one Dense per tower, batched via einsum)
        w_pre = self.param(
            "w_pre", nn.initializers.lecun_normal(),
            (self.towers, m.shape[-1], f_in),
        )
        b_pre = self.param("b_pre", nn.initializers.zeros, (self.towers, f_in))
        m = nn.relu(jnp.einsum("eti,tio->eto", m, w_pre) + b_pre)

        mean = segment_mean(m, receivers, n, mask=edge_mask, indices_are_sorted=True)
        mx = segment_max(m, receivers, n, mask=edge_mask, indices_are_sorted=True)
        mn = segment_min(m, receivers, n, mask=edge_mask, indices_are_sorted=True)
        sq = segment_mean(m * m, receivers, n, mask=edge_mask, indices_are_sorted=True)
        std = jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0) + 1e-5)
        agg = jnp.concatenate([mean, mn, mx, std], axis=-1)  # (N, T, 4 f_in)

        deg = _degree(receivers, n, edge_mask)
        ld = jnp.log(deg + 1.0)
        amp = (ld / self.avg_deg_log)[:, None, None]
        att = (self.avg_deg_log / jnp.maximum(ld, 1e-5))[:, None, None]
        scaled = jnp.concatenate([agg, agg * amp, agg * att], axis=-1)
        scaled = jnp.concatenate([xt, scaled], axis=-1)  # (N, T, f_in(1+12))

        w_post = self.param(
            "w_post", nn.initializers.lecun_normal(),
            (self.towers, scaled.shape[-1], f_out),
        )
        b_post = self.param("b_post", nn.initializers.zeros, (self.towers, f_out))
        out = jnp.einsum("nti,tio->nto", scaled, w_post) + b_post
        return TorchDense(self.features, name="lin_out")(
            out.reshape(n, self.towers * f_out)
        )


@dataclasses.dataclass(frozen=True)
class BaselineGNNConfig:
    conv: str = "gcn"  # gcn | gcn_dir | sage | gin0 | gin | gat | rgcn | pna
    hidden: int = 64
    num_layers: int = 3
    out_dim: int = 2
    dropout: float = 0.5
    pool: str = "mean"  # mean | add | max | attention | set2set | sort
    nested: bool = False  # two-level pooling over subgraph copies (NestedGCN)
    gat_heads: int = 4
    num_relations: int = 4
    classify: bool = True  # log_softmax head (TU classification)
    sort_k: int = 10
    node_embed_vocab: int = 0  # int node types -> embedding
    jk: bool = False  # jumping-knowledge concat of all layers
    # node-level cycle heads (reference kernel/gcn.py use_cycle=True,
    # kernel/train_eval.py:333-530 cycle trainers): skip graph pooling
    # and emit one prediction per original node
    node_level: bool = False
    # deep supervision: per-layer auxiliary predictions ys[i] from the
    # JK-concat of layers <= i (reference kernel/gcn.py:104-113
    # multi_lin/multi_bn/multi_lin2 heads); forward returns (out, ys)
    multi_layer: bool = False


class BaselineGNN(nn.Module):
    """Configurable TU-benchmark model: conv stack + (optionally nested
    two-level) pooling + 2-layer head. Covers the reference's kernel/
    model zoo (GCN/NestedGCN/GraphSAGE/GIN0/GIN/GAT, `kernel/gcn.py:10,166`
    etc.); `nested=True` pools node -> subgraph (mean) -> graph (mean) via
    the copy-based batch's segment indices, the reference's NestedGCN
    scheme (`kernel/gcn.py:166-240`)."""

    cfg: BaselineGNNConfig

    def _conv(self, name):
        cfg = self.cfg
        H = cfg.hidden
        if cfg.conv == "gcn":
            return GCNConv(H, name=name)
        if cfg.conv == "gcn_dir":
            return DirectionalGCNConv(H, name=name)
        if cfg.conv == "sage":
            return SAGEConv(H, name=name)
        if cfg.conv in ("gin0", "gin"):
            return GINConv(
                mlp=MLP(features=(H, H), dropout=0.0, act=nn.relu),
                train_eps=cfg.conv == "gin",
                name=name,
            )
        if cfg.conv == "gat":
            assert H % cfg.gat_heads == 0
            return GATConv(H // cfg.gat_heads, heads=cfg.gat_heads, name=name)
        if cfg.conv == "rgcn":
            return RGCNConv(H, cfg.num_relations, name=name)
        if cfg.conv == "pna":
            return PNAConv(H, towers=1, name=name)
        raise ValueError(cfg.conv)

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        cfg = self.cfg
        kw = dict(
            deterministic=deterministic, use_running_average=use_running_average
        )
        node_mask, edge_mask = batch.node_mask, batch.edge_mask
        x = batch.x
        if cfg.node_embed_vocab:
            from escgnn_tpu.models.layers import EmbedMM

            x = EmbedMM(
                cfg.node_embed_vocab, cfg.hidden,
                embedding_init=nn.initializers.normal(1.0),
                name="node_type_embedding",
            )(x.astype(jnp.int32).reshape(x.shape[0]))
        x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[:, None]

        z = None
        if batch.extras and "z" in batch.extras:
            z = batch.extras["z"]
            if z.ndim == 2:
                z = z[:, 0]

        xs = []
        h = x
        for i in range(cfg.num_layers):
            conv = self._conv(f"conv{i + 1}")
            if cfg.conv == "gcn_dir":
                h = conv(h, batch.senders, batch.receivers, edge_mask, z)
            elif cfg.conv in ("gin0", "gin"):
                h = conv(h, batch.senders, batch.receivers, edge_mask,
                         node_mask, **kw)
            elif cfg.conv == "rgcn":
                h = conv(h, batch.senders, batch.receivers, edge_mask,
                         batch.edge_attr)
            elif cfg.conv == "pna":
                h = conv(h, batch.senders, batch.receivers, edge_mask,
                         batch.edge_attr)
            else:
                h = conv(h, batch.senders, batch.receivers, edge_mask)
            if cfg.conv not in ("gin0", "gin"):
                h = nn.relu(h)
            xs.append(h)
        if cfg.jk:
            h = jnp.concatenate(xs, axis=-1)

        def to_rows(feats):
            """Per-original-node rows: with node copies, mean-pool each
            copy's nodes to its segment (one segment per original node,
            reference `kernel/gcn.py:131-135`)."""
            if cfg.nested:
                assert batch.node_segment is not None, "nested pool needs copies"
                return segment_mean(
                    feats, batch.node_segment, batch.segment_mask.shape[0],
                    mask=node_mask,
                )
            return feats

        ys = []
        if cfg.multi_layer:
            # one aux head per layer after the first: predict from the
            # JK-concat of layers <= i (reference kernel/gcn.py:104-113);
            # aux rows live at the same level as the main head (node rows
            # for the node-split trainers, graph rows for the GC trainer,
            # reference kernel/train_eval.py:445-476 vs :564-603)
            row_mask = batch.segment_mask if cfg.nested else node_mask
            for i in range(1, cfg.num_layers):
                a = to_rows(jnp.concatenate(xs[:i], axis=-1))
                a_mask = row_mask
                if not cfg.node_level:
                    if cfg.nested:
                        a = segment_mean(
                            a, batch.segment_graph, batch.num_graphs,
                            mask=batch.segment_mask,
                        )
                    else:
                        a = segment_mean(
                            a, batch.node_graph, batch.num_graphs,
                            mask=node_mask,
                        )
                    a_mask = batch.graph_mask
                a = TorchDense(cfg.hidden, name=f"multi_lin{i}")(a)
                a = MaskedBatchNorm(name=f"multi_bn{i}")(
                    a, mask=a_mask, use_running_average=use_running_average
                )
                a = nn.Dropout(cfg.dropout, deterministic=deterministic)(a)
                a = nn.relu(a)
                # aux head i predicts the first 2i-1 target columns
                # (reference kernel/gcn.py:51 multi_lin2 -> 2*i-1 dims)
                ys.append(TorchDense(
                    min(2 * i - 1, cfg.out_dim), name=f"multi_lin2{i}"
                )(a))

        from escgnn_tpu.models.pooling import graph_pool  # cycle-free late import

        if cfg.node_level:
            h = to_rows(h)
        elif cfg.nested:
            h = to_rows(h)
            h = segment_mean(
                h, batch.segment_graph, batch.num_graphs,
                mask=batch.segment_mask,
            )
        else:
            h = graph_pool(
                self, cfg.pool, h, batch, sort_k=cfg.sort_k
            )

        h = nn.relu(TorchDense(cfg.hidden, name="lin1")(h))
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        h = TorchDense(cfg.out_dim, name="lin2")(h)
        if cfg.classify:
            h = nn.log_softmax(h, axis=-1)
        if cfg.multi_layer:
            return h, ys
        return h


@dataclasses.dataclass(frozen=True)
class RGCNBaselineConfig:
    """The reference's QM9 'GNN' RGCN baseline (`zinc_models.py:42-113`)."""

    num_layers: int = 5
    edge_attr_dim: int = 5
    use_pos: bool = False
    concat: bool = False
    # node-level head (reference zinc_cycle_models.py GNN variant): skip
    # the graph pooling, fc head per node
    node_level: bool = False


class RGCNBaseline(nn.Module):
    cfg: RGCNBaselineConfig

    @nn.compact
    def __call__(self, batch: GraphBatch, **_):
        cfg = self.cfg
        xi = batch.x.astype(jnp.int32).reshape(batch.x.shape[0])
        from escgnn_tpu.models.layers import EmbedMM

        x = EmbedMM(
            100, 8, embedding_init=nn.initializers.normal(1.0),
            name="node_type_embedding",
        )(xi)
        x = jnp.concatenate([x, xi[:, None].astype(jnp.float32)], axis=-1)
        if cfg.use_pos:
            x = jnp.concatenate([x, batch.pos.astype(jnp.float32)], axis=-1)
        xs = []
        widths = [32] + [64] * (cfg.num_layers - 1)
        for i, w in enumerate(widths):
            x = nn.elu(
                RGCNConv(w, cfg.edge_attr_dim, name=f"conv{i + 1}")(
                    x, batch.senders, batch.receivers, batch.edge_mask,
                    batch.edge_attr,
                )
            )
            xs.append(x)
        if cfg.concat:
            x = jnp.concatenate(xs, axis=-1)
        if not cfg.node_level:
            x = segment_mean(
                x, batch.node_graph, batch.num_graphs, mask=batch.node_mask
            )
        x = nn.elu(TorchDense(32, name="fc1")(x))
        x = nn.elu(TorchDense(16, name="fc2")(x))
        return TorchDense(1, name="fc3")(x)
