"""I²GNN — nested GNN over (root, neighbor)-pair subgraph copies.

Capability mirror of reference `zinc_models.py:116-303`: per-layer z-label
embedding (+ 2-column rd projection), GINConv with edge-type message, BN
+ ELU + residual, then the hierarchical pooling cascade
(`graph_pooling`, `zinc_models.py:200-248`):

  subgraph2 level: mean | add | center | mean-center | mean-center-side
                   (optionally gated by sigmoid(z_emb))
  subgraph level:  mean | add | mean-context (concat per-original-node mean)
  graph level:     mean | add

All pools are masked segment reductions over the batch's three segment
index levels; `center_idx` gathers replace the reference's fancy-index
center pooling. Runs on `featurize.pair_subgraphs.create_pair_subgraphs`
output.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import MaskedBatchNorm, TorchDense
from escgnn_tpu.models.ngnn import NGNNGINConv
from escgnn_tpu.ops.segment import (
    pool_copy_blocks,
    segment_mean,
    segment_sum,
)


@dataclasses.dataclass(frozen=True)
class I2GNNConfig:
    num_layers: int = 5
    hidden: int = 64
    node_type_dim: int = 8
    z_vocab: int = 100
    edge_vocab: int = 5
    use_rd: bool = False
    compute_dtype: str = "float32"  # bfloat16: bf16 conv einsums
    subgraph_pooling: str = "mean"  # mean | add | mean-context
    subgraph2_pooling: str = "mean"  # mean | add | center | mean-center | mean-center-side
    graph_aggr: str = "mean"  # mean | add
    gate: bool = False
    out_dim: int = 1
    residual: bool = True
    # node-level head (reference zinc_cycle_models.py I2GNN variant): the
    # root-subgraph rows correspond 1:1 to original nodes, so stop at the
    # subgraph level and run the fc head per row
    node_level: bool = False
    # re-inject the pooled subgraph context into every layer
    # (reference `zinc_models.py:272-276`): x = double_nn([x ‖ pool(x)
    # broadcast back through node_to_original_node])
    double_pooling: bool = False
    # width-preserving Linear-ReLU-Linear after the subgraph2-level and
    # subgraph-level pools (reference `use_pooling_nn`,
    # `zinc_models.py:182-187,225-226,241-242`)
    use_pooling_nn: bool = False


class I2GNN(nn.Module):
    cfg: I2GNNConfig

    def _pool(self, x, batch: GraphBatch, z_emb, gate_fn,
              node_emb_only: bool = False, pool_nn=None):
        cfg = self.cfg
        S = batch.segment_mask.shape[0]
        S2 = batch.segment2_mask.shape[0]
        nm = batch.node_mask

        if cfg.subgraph_pooling == "mean-context":
            x_node = segment_mean(
                x, batch.node_original, batch.original_mask.shape[0], mask=nm
            )

        def s2_reduce(v, reduce):
            # uniform per-copy layout -> masked reshape; else segment op
            b = pool_copy_blocks(v, batch, S2, reduce=reduce)
            if b is not None:
                return b
            fn = segment_mean if reduce == "mean" else segment_sum
            return fn(v, batch.node_segment2, S2, mask=nm)

        sp2 = cfg.subgraph2_pooling
        if sp2 in ("mean", "mean-center-side") and cfg.gate and gate_fn:
            x = gate_fn(z_emb) * x
        if sp2 == "mean":
            h2 = s2_reduce(x, "mean")
        elif sp2 == "add":
            h2 = s2_reduce(x, "sum")
        elif sp2 == "center":
            h2 = jnp.take(x, batch.center_idx[:, 0], axis=0)
        elif sp2 == "mean-center":
            h2 = jnp.concatenate(
                [
                    s2_reduce(x, "mean"),
                    jnp.take(x, batch.center_idx[:, 0], axis=0),
                ],
                axis=-1,
            )
        elif sp2 == "mean-center-side":
            h2 = jnp.concatenate(
                [
                    s2_reduce(x, "mean"),
                    jnp.take(x, batch.center_idx[:, 0], axis=0),
                    jnp.take(x, batch.center_idx[:, 1], axis=0),
                ],
                axis=-1,
            )
        else:
            raise ValueError(sp2)

        if pool_nn is not None:
            h2 = pool_nn["e1"](nn.relu(pool_nn["e0"](h2)))

        s2m = batch.segment2_mask
        if cfg.subgraph_pooling == "add":
            h1 = segment_sum(h2, batch.segment2_parent, S, mask=s2m)
        else:
            h1 = segment_mean(h2, batch.segment2_parent, S, mask=s2m)
        if cfg.subgraph_pooling == "mean-context":
            # one subgraph per original node, so rows align
            h1 = jnp.concatenate([h1, x_node[:S]], axis=-1)
        # the double_pooling context path returns before node_pooling_nn
        # (reference node_emb_only, zinc_models.py:238-242)
        if pool_nn is not None and not node_emb_only:
            h1 = pool_nn["n1"](nn.relu(pool_nn["n0"](h1)))
        return h1

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
        z = batch.extras["z"]
        nm = batch.node_mask

        from escgnn_tpu.models.layers import EmbedMM

        xt = EmbedMM(
            100, cfg.node_type_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="node_type_embedding",
        )(x_raw.astype(jnp.int32).reshape(x_raw.shape[0]))
        h = jnp.concatenate(
            [xt, x_raw.reshape(x_raw.shape[0], -1).astype(jnp.float32)],
            axis=-1,
        )

        def z_embed(layer, m_in):
            zt = EmbedMM(
                cfg.z_vocab, m_in,
                embedding_init=nn.initializers.normal(1.0),
                name=f"z_embedding_{layer}",
            )(z.astype(jnp.int32))
            z_emb = jnp.sum(zt, axis=1)
            if cfg.use_rd:
                z_emb = z_emb + TorchDense(m_in, name=f"rd_projection_{layer}")(
                    batch.extras["rd"].astype(jnp.float32)
                )
            return z_emb

        pool_nn = None
        if cfg.use_pooling_nn:
            # shared width-preserving MLPs after the s2/subgraph pools
            # (reference builds ONE Sequential each, zinc_models.py:182-187)
            s2_dim = {"mean": 1, "add": 1, "center": 1,
                      "mean-center": 2, "mean-center-side": 3}[
                cfg.subgraph2_pooling]
            w2 = s2_dim * cfg.hidden
            w1 = w2 + (cfg.hidden
                       if cfg.subgraph_pooling == "mean-context" else 0)
            pool_nn = {
                "e0": TorchDense(w2, name="edge_pooling_nn_0"),
                "e1": TorchDense(w2, name="edge_pooling_nn_1"),
                "n0": TorchDense(w1, name="node_pooling_nn_0"),
                "n1": TorchDense(w1, name="node_pooling_nn_1"),
            }

        m_in = h.shape[-1]
        h_prev = None
        for layer in range(cfg.num_layers):
            z_emb = z_embed(layer, m_in)
            h = jnp.concatenate([h, z_emb], axis=-1)
            h = NGNNGINConv(
                m_in=2 * m_in, m_out=cfg.hidden, edge_vocab=cfg.edge_vocab,
                nodes_per_seg=batch.nodes_per_seg,
                seg_regions=batch.seg_regions,
                compute_dtype=cfg.compute_dtype,
                name=f"conv{layer}",
            )(
                h, batch.senders, batch.receivers, batch.edge_attr,
                batch.edge_mask, nm,
                use_running_average=use_running_average,
            )
            if cfg.double_pooling:
                # pooled per-subgraph context broadcast back to the copy
                # nodes; subgraph s is rooted at original node s so
                # node_original indexes the subgraph axis directly
                ctx = self._pool(h, batch, z_emb, None, node_emb_only=True,
                                 pool_nn=pool_nn)
                S = ctx.shape[0]
                idx = jnp.minimum(batch.node_original, S - 1)
                h = jnp.concatenate(
                    [h, jnp.take(ctx, idx, axis=0)], axis=-1
                )
                h = TorchDense(128, name=f"double_nn_{layer}_0")(h)
                h = nn.relu(h)
                h = TorchDense(cfg.hidden, name=f"double_nn_{layer}_1")(h)
            h = MaskedBatchNorm(name=f"norm{layer}")(
                h, nm, use_running_average
            )
            if layer < cfg.num_layers - 1:
                h = nn.elu(h)
            if layer > 0 and cfg.residual:
                h = h + h_prev
            h_prev = h
            m_in = cfg.hidden

        # final pooling with its own z embedding
        z_emb = z_embed(cfg.num_layers, cfg.hidden)
        gate_fn = None
        if cfg.gate:
            def gate_fn(ze):
                g = TorchDense(cfg.hidden, name="subgraph_gate")(ze)
                return nn.sigmoid(g)

        h1 = self._pool(h, batch, z_emb, gate_fn, pool_nn=pool_nn)
        if cfg.node_level:
            g = h1  # one row per original node (root subgraph)
        else:
            g = (
                segment_sum(h1, batch.segment_graph, batch.num_graphs,
                            mask=batch.segment_mask)
                if cfg.graph_aggr == "add"
                else segment_mean(h1, batch.segment_graph, batch.num_graphs,
                                  mask=batch.segment_mask)
            )

        g = nn.elu(TorchDense(32, name="fc1")(g))
        g = nn.elu(TorchDense(16, name="fc2")(g))
        return TorchDense(cfg.out_dim, name="fc3")(g)
