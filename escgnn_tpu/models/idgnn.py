"""ID-GNN layers — identity-aware message passing.

Capability mirror of reference `kernel/idgnn.py`: each conv keeps two
weight sets, the ordinary one and an *identity* one that is additionally
applied to the root/identity nodes (reference pattern: `x = x @ W;
x.index_add_(0, id, x_id @ W_id)` before propagation — `kernel/idgnn.py:
112-160` GCNID, `:217-300` SAGEID, `:305-390` GATID, `:396-430` GINID).

TPU form: `id` index lists become a boolean `is_root` mask over the padded
node axis; the identity transform is gated by the mask (one fused
where/add instead of an index_add scatter).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import MLP, TorchDense
from escgnn_tpu.ops.segment import segment_mean, segment_softmax, segment_sum


def _id_transform(x, is_root, features, name):
    """x @ W, plus x @ W_id added on identity rows."""
    h = TorchDense(features, use_bias=False, name=f"{name}_w")(x)
    h_id = TorchDense(features, use_bias=False, name=f"{name}_w_id")(x)
    return jnp.where(is_root[:, None], h + h_id, h)


class GINIDConv(nn.Module):
    """GINIDConvLayer (`kernel/idgnn.py:396-430`): h = (1+eps) x + sum_j x_j;
    out = nn(h) (+ nn_id(h) on identity rows)."""

    mlp: nn.Module
    mlp_id: nn.Module
    train_eps: bool = False

    @nn.compact
    def __call__(
        self, x, senders, receivers, edge_mask, is_root, node_mask=None, **kw
    ):
        n = x.shape[0]
        agg = segment_sum(
            jnp.take(x, senders, axis=0), receivers, n,
            mask=edge_mask & (senders != receivers),  # remove_self_loops
            indices_are_sorted=True,
        )
        eps = (
            self.param("eps", nn.initializers.zeros, ())
            if self.train_eps
            else 0.0
        )
        h = (1.0 + eps) * x + agg
        out = self.mlp(h, node_mask, **kw)
        out_id = self.mlp_id(h, node_mask, **kw)
        return jnp.where(is_root[:, None], out + out_id, out)


class GCNIDConv(nn.Module):
    """GCNIDConvLayer (`kernel/idgnn.py:112-214`): gcn-normalized propagate
    of the identity-transformed features."""

    features: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, is_root):
        n = x.shape[0]
        h = _id_transform(x, is_root, self.features, "lin")
        ones = edge_mask.astype(jnp.float32)
        deg = segment_sum(ones, receivers, n, indices_are_sorted=True) + 1.0
        inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
        w = inv_sqrt[senders] * inv_sqrt[receivers]
        agg = segment_sum(
            jnp.take(h, senders, axis=0) * w[:, None], receivers, n,
            mask=edge_mask, indices_are_sorted=True,
        )
        agg = agg + h * (inv_sqrt * inv_sqrt)[:, None]  # self loop
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return agg + bias


class SAGEIDConv(nn.Module):
    """SAGEIDConvLayer (`kernel/idgnn.py:217-300`): mean aggregation of
    identity-transformed features + bias."""

    features: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, is_root):
        n = x.shape[0]
        h = _id_transform(x, is_root, self.features, "lin")
        agg = segment_mean(
            jnp.take(h, senders, axis=0), receivers, n,
            mask=edge_mask, indices_are_sorted=True,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return agg + h + bias


class GATIDConv(nn.Module):
    """GATIDConvLayer (`kernel/idgnn.py:305-390`): identity transform, then
    standard GAT attention (self-loops included in the softmax)."""

    features: int  # per-head
    heads: int = 1
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, is_root):
        n = x.shape[0]
        H, F = self.heads, self.features
        h = _id_transform(x, is_root, H * F, "lin").reshape(n, H, F)
        att = self.param("att", nn.initializers.normal(0.1), (H, 2 * F))
        a_i, a_j = att[:, :F], att[:, F:]
        alpha_dst = jnp.sum(h * a_i, axis=-1)  # x_i part
        alpha_src = jnp.sum(h * a_j, axis=-1)  # x_j part
        logits = nn.leaky_relu(
            alpha_src[senders] + alpha_dst[receivers], self.negative_slope
        )
        self_logit = nn.leaky_relu(
            alpha_src + alpha_dst, self.negative_slope
        )
        from escgnn_tpu.ops.segment import segment_max

        mx = segment_max(
            logits, receivers, n, mask=edge_mask, indices_are_sorted=True,
            empty_value=-jnp.inf,
        )
        mx = jnp.maximum(mx, self_logit)
        ex_e = jnp.where(edge_mask[:, None], jnp.exp(logits - mx[receivers]), 0.0)
        ex_s = jnp.exp(self_logit - mx)
        denom = segment_sum(ex_e, receivers, n, indices_are_sorted=True) + ex_s
        denom = jnp.maximum(denom, 1e-16)
        num = segment_sum(
            jnp.take(h, senders, axis=0) * ex_e[..., None], receivers, n,
            indices_are_sorted=True,
        ) + h * ex_s[..., None]
        bias = self.param("bias", nn.initializers.zeros, (H * F,))
        return (num / denom[..., None]).reshape(n, H * F) + bias


@dataclasses.dataclass(frozen=True)
class IDGNNConfig:
    conv: str = "gin"  # gin | gcn | sage | gat
    hidden: int = 64
    num_layers: int = 3
    out_dim: int = 2
    dropout: float = 0.5
    pool: str = "mean"  # graph pooling (nested two-level when copies exist)
    classify: bool = True
    gat_heads: int = 4


class IDGNN(nn.Module):
    """ID-GNN over node-rooted subgraph copies: the identity index of each
    copy is its root (local index 0); pooling is node -> subgraph -> graph
    (the reference runs these layers inside the NGNN nesting harness)."""

    cfg: IDGNNConfig

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
        x = batch.x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[:, None]

        # identity = root of each copy: first node of its segment.
        if batch.node_segment is not None:
            n = x.shape[0]
            idx = jnp.arange(n, dtype=jnp.int32)
            S = batch.segment_mask.shape[0]
            from escgnn_tpu.ops.segment import segment_min

            first_idx = segment_min(
                idx.astype(jnp.float32), batch.node_segment, S,
                mask=node_mask, empty_value=-1.0,
            )
            is_root = (
                idx.astype(jnp.float32)
                == first_idx[batch.node_segment]
            ) & node_mask
        else:
            is_root = (batch.node_local == 0) & node_mask

        h = x
        H = cfg.hidden
        for i in range(cfg.num_layers):
            name = f"conv{i + 1}"
            if cfg.conv == "gin":
                h = GINIDConv(
                    mlp=MLP(features=(H, H), act=nn.relu),
                    mlp_id=MLP(features=(H, H), act=nn.relu),
                    name=name,
                )(h, batch.senders, batch.receivers, edge_mask, is_root,
                  node_mask, **kw)
            elif cfg.conv == "gcn":
                h = nn.relu(GCNIDConv(H, name=name)(
                    h, batch.senders, batch.receivers, edge_mask, is_root
                ))
            elif cfg.conv == "sage":
                h = nn.relu(SAGEIDConv(H, name=name)(
                    h, batch.senders, batch.receivers, edge_mask, is_root
                ))
            elif cfg.conv == "gat":
                assert H % cfg.gat_heads == 0
                h = nn.relu(GATIDConv(
                    H // cfg.gat_heads, heads=cfg.gat_heads, name=name
                )(h, batch.senders, batch.receivers, edge_mask, is_root))
            else:
                raise ValueError(cfg.conv)

        if batch.node_segment is not None:
            h = segment_mean(
                h, batch.node_segment, batch.segment_mask.shape[0],
                mask=node_mask,
            )
            h = segment_mean(
                h, batch.segment_graph, batch.num_graphs,
                mask=batch.segment_mask,
            )
        else:
            h = segment_mean(h, batch.node_graph, batch.num_graphs, mask=node_mask)

        h = nn.relu(TorchDense(H, name="lin1")(h))
        h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        h = TorchDense(cfg.out_dim, name="lin2")(h)
        return nn.log_softmax(h, axis=-1) if cfg.classify else h
