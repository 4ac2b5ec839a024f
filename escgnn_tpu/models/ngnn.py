"""NGNN — nested GNN over node-rooted subgraph copies.

Capability mirror of reference `zinc_models.py:306-405`: per-layer z-label
embeddings (+ optional rd projections) concatenated onto node features,
custom GINConv with an edge-type embedding in the message
(`zinc_models.py:615-645`), BN + ELU + residual per layer, two-level
pooling (mean over `node_to_subgraph`, then mean over
`subgraph_to_graph`), and an fc1/fc2/fc3 head.

Runs on the copies-graph produced by
`featurize.node_subgraphs.create_node_subgraphs`; the two-level pooling
is two masked segment-means over the batch's segment index vectors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import MaskedBatchNorm, TorchDense
from escgnn_tpu.ops.segment import segment_mean, segment_sum


@dataclasses.dataclass(frozen=True)
class NGNNConfig:
    num_layers: int = 5
    hidden: int = 64
    node_type_dim: int = 8
    z_vocab: int = 100
    edge_vocab: int = 5
    use_rd: bool = False
    subgraph_pooling: str = "mean"  # mean | center
    out_dim: int = 1
    residual: bool = True
    compute_dtype: str = "float32"  # bfloat16: bf16 conv einsums
    # node-level head (reference zinc_cycle_models.py NGNN variant): the
    # subgraph rows ARE the original nodes (one copy per node), so stop
    # at the subgraph level and run the fc head per row
    node_level: bool = False


class NGNNGINConv(nn.Module):
    """GIN conv with edge-type embedded messages (zinc_models.py:615-645).

    `nodes_per_seg`: uniform per-copy layout (data/uniform_copies.py) —
    gather/scatter run as per-copy one-hot einsums on the MXU instead of
    a global XLA scatter-add over the copy union (the profiled 15x-off-
    roofline bottleneck of the ragged layout, results_archive/
    profile_i2gnn/)."""

    m_in: int
    m_out: int
    edge_vocab: int
    nodes_per_seg: "int | None" = None
    # two-size bucketed copy layout (GraphBatch.seg_regions) — takes
    # precedence over nodes_per_seg when set
    seg_regions: "tuple | None" = None
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self, x, senders, receivers, edge_attr, edge_mask, node_mask=None,
        *, use_running_average: bool,
    ):
        from escgnn_tpu.models.layers import EmbedMM, _dense_local_aggregate

        eps = self.param("eps", nn.initializers.zeros, ())
        e = EmbedMM(
            self.edge_vocab, self.m_in,
            embedding_init=nn.initializers.normal(1.0), name="edge_encoder",
        )(edge_attr.astype(jnp.int32).reshape(edge_attr.shape[0]))
        if self.compute_dtype == "bfloat16":
            # bf16 message/aggregation path (flagship convention: f32
            # master params, BN statistics stay f32 inside)
            x = x.astype(jnp.bfloat16)
            e = e.astype(jnp.bfloat16)
        if self.seg_regions is not None:
            from escgnn_tpu.models.layers import (
                _dense_local_aggregate_regions,
            )

            agg = _dense_local_aggregate_regions(
                x, senders, receivers, e, edge_mask, self.seg_regions
            )
        elif self.nodes_per_seg is not None:
            agg = _dense_local_aggregate(
                x, senders, receivers, e, edge_mask, self.nodes_per_seg
            )
        else:
            msg = nn.relu(jnp.take(x, senders, axis=0) + e)
            agg = segment_sum(
                msg, receivers, num_segments=x.shape[0], mask=edge_mask,
                indices_are_sorted=True,
            )
        h = (1.0 + eps) * x + agg
        h = TorchDense(2 * self.m_in, name="mlp_0")(h)
        # node_mask keeps padding out of the training batch statistics
        h = MaskedBatchNorm(name="mlp_bn")(h, node_mask, use_running_average)
        h = nn.relu(h)
        return TorchDense(self.m_out, name="mlp_1")(h)


class NGNN(nn.Module):
    cfg: NGNNConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        cfg = self.cfg
        x_raw = batch.x
        z = batch.extras["z"]  # (N, z_cols) int
        node_mask = batch.node_mask

        from escgnn_tpu.models.layers import EmbedMM

        xt = EmbedMM(
            100, cfg.node_type_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="node_type_embedding",
        )(x_raw.astype(jnp.int32).reshape(x_raw.shape[0]))
        x = jnp.concatenate(
            [xt, x_raw.reshape(x_raw.shape[0], -1).astype(jnp.float32)], axis=-1
        )

        m_in = x.shape[-1]
        h = x
        h_prev = None
        for layer in range(cfg.num_layers):
            zt = EmbedMM(
                cfg.z_vocab, m_in,
                embedding_init=nn.initializers.normal(1.0),
                name=f"z_embedding_{layer}",
            )(z.astype(jnp.int32))
            z_emb = jnp.sum(zt, axis=1)  # sum over z columns
            if cfg.use_rd:
                z_emb = z_emb + TorchDense(m_in, name=f"rd_projection_{layer}")(
                    batch.extras["rd"].astype(jnp.float32)
                )
            h = jnp.concatenate([h, z_emb], axis=-1)
            h = NGNNGINConv(
                m_in=2 * m_in, m_out=cfg.hidden, edge_vocab=cfg.edge_vocab,
                nodes_per_seg=batch.nodes_per_seg,
                seg_regions=batch.seg_regions,
                compute_dtype=cfg.compute_dtype,
                name=f"conv{layer}",
            )(
                h, batch.senders, batch.receivers, batch.edge_attr,
                batch.edge_mask, node_mask,
                use_running_average=use_running_average,
            )
            h = MaskedBatchNorm(name=f"norm{layer}")(
                h, node_mask, use_running_average
            )
            h = nn.elu(h)
            if layer > 0 and cfg.residual:
                h = h + h_prev
            h_prev = h
            m_in = cfg.hidden

        # two-level pooling: node -> subgraph -> graph
        from escgnn_tpu.ops.segment import pool_copy_blocks

        S = batch.segment_mask.shape[0]
        if cfg.subgraph_pooling == "center":
            if batch.nodes_per_seg is not None and \
                    batch.num_nodes == S * batch.nodes_per_seg:
                # uniform copy blocks: the root is local slot 0 of each
                sub = h.reshape(S, batch.nodes_per_seg, -1)[:, 0]
            else:
                # center = root = first node of each copy (the transform
                # places the root first): min node index per segment.
                idx = jnp.arange(batch.num_nodes)
                big = jnp.where(batch.node_mask, idx, batch.num_nodes)
                first = jax.ops.segment_min(big, batch.node_segment, S)
                first = jnp.minimum(first, batch.num_nodes - 1)
                sub = jnp.take(h, first, axis=0)
        else:
            sub = pool_copy_blocks(h, batch, S, reduce="mean")
            if sub is None:
                sub = segment_mean(h, batch.node_segment, S, mask=node_mask)
        if cfg.node_level:
            g = sub  # one row per original node
        else:
            g = segment_mean(
                sub, batch.segment_graph, batch.num_graphs,
                mask=batch.segment_mask,
            )

        g = nn.elu(TorchDense(32, name="fc1")(g))
        g = nn.elu(TorchDense(16, name="fc2")(g))
        return TorchDense(cfg.out_dim, name="fc3")(g)
