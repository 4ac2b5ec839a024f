"""NestedGIN_eff — the flagship ESC-GNN model family.

One configurable flax module covering the reference's per-benchmark
variants:
  * counting (node-level, ReLU, x_embedding prepended to the JK concat) —
    reference `run_graphcount.py:39-194`;
  * ZINC (graph-level, ELU, node/edge type embeddings, z_emb concatenated
    with an edge-type embedding, add-pool) — reference
    `zinc_models.py:504-611`;
  * generic dense-feature graph/node regression (kernel/gin.py family).

The structural embedding path is shared: per-edge weighted gather over the
1800-row z_initial table (TPU-native replacement of the reference's
gather + global_add_pool at `zinc_models.py:590` / `run_graphcount.py:155`),
then the z_embedding MLP; the result is the edge feature of every GINE
layer over the original graph.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import MLP, MaskedBatchNorm, TorchDense, TorchEmbed
from escgnn_tpu.ops.segment import pool_nodes_to_graphs
from escgnn_tpu.ops.zemb import (
    expand_rows,
    zemb_from_batch,
    zemb_unique_rows,
)
from escgnn_tpu.models.layers import GINEConv


@dataclasses.dataclass(frozen=True)
class NestedGINEffConfig:
    hidden: int = 256
    num_layers: int = 5
    dropout: float = 0.0
    z_dim: int = 1800
    out_dim: int = 1
    act: str = "relu"  # relu (counting) | elu (zinc/qm9)
    graph_pred: bool = False  # False -> node-level head
    pool: str = "mean"  # mean | add (graph_pred only)
    use_x_embedding_jk: bool = True  # counting variant: extra JK entry
    head_order: str = "act_dropout"  # act_dropout (count) | dropout_act (zinc)
    # input featurization
    node_embed_vocab: int = 0  # >0: x are int type ids -> Embedding(vocab, dim)
    node_embed_dim: int = 32
    edge_embed_vocab: int = 0  # >0: concat edge-type embedding onto z_emb
    edge_embed_dim: int = 32
    # QM9 variant (reference qm9_models.py:25-139):
    concat_pos: bool = False  # x = [x ‖ pos]
    node_add_embed_vocab: int = 0  # >0: x += Embedding(vocab)(node_type)
    edge_float_attr: bool = False  # concat continuous edge_attr onto z_emb
    compute_dtype: str = "float32"  # float32 | bfloat16 for conv stacks
    # edge-partitioned execution: edges sharded over this mesh axis, nodes
    # replicated; partial aggregations psum over ICI (see parallel/)
    edge_shard_axis: Optional[str] = None
    # receiver-range node+edge sharding (parallel/halo.py): the batch
    # holds only this shard's node rows and receiver-owned edges (built
    # by `build_halo_batch`); sender halo rows arrive via one boundary
    # all_gather per conv and EVERY BatchNorm psums its masked statistics
    # over the axis so all shards normalize globally. Width enc layout
    # required (per-edge rows shard exactly); node-level heads only.
    halo_axis: Optional[str] = None


def _act(name: str):
    return {"relu": nn.relu, "elu": nn.elu}[name]


class NestedGINEff(nn.Module):
    cfg: NestedGINEffConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
    ):
        cfg = self.cfg
        act = _act(cfg.act)
        kw = dict(
            deterministic=deterministic, use_running_average=use_running_average
        )
        H = cfg.hidden
        node_mask = batch.node_mask
        edge_mask = batch.edge_mask
        # BN statistic axes: under halo sharding node rows are split, so
        # node-row BNs must psum; under edge_shard_axis nodes are
        # replicated (identical stats per shard) and only edge-row BNs
        # (the z MLP) psum.
        node_ax = cfg.halo_axis
        edge_ax = cfg.halo_axis or cfg.edge_shard_axis
        halo_ctx = None
        if cfg.halo_axis is not None:
            halo_ctx = {
                "boundary_send": batch.extras["halo_boundary_send"],
                "halo_src": batch.extras["halo_src"],
            }

        # --- node input features ---
        x = batch.x
        if cfg.node_embed_vocab:
            emb = TorchEmbed(
                cfg.node_embed_vocab,
                cfg.node_embed_dim,
                name="node_type_embedding",
            )
            x = emb(x.astype(jnp.int32).reshape(x.shape[0]))
        x = x.astype(jnp.float32)
        if cfg.concat_pos:
            x = jnp.concatenate([x, batch.pos.astype(jnp.float32)], axis=-1)
        if cfg.node_add_embed_vocab:
            node_type = batch.extras["node_type"].astype(jnp.int32)
            x = x + TorchEmbed(
                cfg.node_add_embed_vocab,
                x.shape[-1],
                name="node_type_embedding",
            )(node_type.reshape(node_type.shape[0]))

        # --- per-edge structural embedding ---
        z_table = self.param(
            "z_initial", nn.initializers.normal(1.0), (cfg.z_dim, H)
        )
        z_mlp = MLP(
            features=(H,), dropout=cfg.dropout, act=act, pre_act=True,
            axis_name=edge_ax, name="z_embedding",
        )
        u = (
            zemb_unique_rows(z_table, batch)
            if cfg.dropout == 0.0 and cfg.halo_axis is None
            else None
        )
        if u is not None and getattr(batch, "enc_row_weight", None) is not None:
            # dedup layout, no dropout: run the z MLP on the R unique rows
            # with multiplicity-weighted BN (bit-identical statistics to
            # the per-edge form, since equal rows have equal values), then
            # expand to edges with one take — R ~ 0.3 E on ZINC batches,
            # so the whole z pipeline shrinks accordingly. Dropout would
            # correlate edges sharing a row, hence the dropout == 0 gate.
            u = z_mlp(u, batch.enc_row_weight, **kw)
            z_emb = expand_rows(u, batch)
        else:
            z_emb = zemb_from_batch(z_table, batch)
            z_emb = z_mlp(z_emb, edge_mask, **kw)
        if cfg.edge_embed_vocab:
            eemb = TorchEmbed(
                cfg.edge_embed_vocab,
                cfg.edge_embed_dim,
                name="edge_type_embedding",
            )
            ea = batch.edge_attr
            z_emb = jnp.concatenate(
                [z_emb, eemb(ea.astype(jnp.int32).reshape(ea.shape[0]))], axis=-1
            )
        if cfg.edge_float_attr:
            ea = batch.edge_attr.astype(jnp.float32)
            z_emb = jnp.concatenate(
                [z_emb, ea.reshape(ea.shape[0], -1)], axis=-1
            )

        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # --- GINE stack over the original graph ---
        def conv(name):
            return GINEConv(
                mlp=MLP(
                    features=(H, H), dropout=cfg.dropout, act=act,
                    axis_name=node_ax,
                ),
                edge_dim=z_emb.shape[-1],
                edge_shard_axis=cfg.edge_shard_axis,
                halo_axis=cfg.halo_axis,
                uniform_nodes=(
                    None if cfg.halo_axis else batch.nodes_per_graph
                ),
                name=name,
            )

        xs = []
        if cfg.use_x_embedding_jk:
            x0 = MLP(
                features=(H, H), dropout=cfg.dropout, act=act,
                axis_name=node_ax, name="x_embedding",
            )(batch.x.astype(jnp.float32), node_mask, **kw)
            xs.append(x0)

        hcur = conv("conv1")(
            x.astype(cdt),
            batch.senders,
            batch.receivers,
            z_emb.astype(cdt),
            edge_mask,
            node_mask,
            halo_ctx=halo_ctx,
            **kw,
        )
        xs.append(hcur)
        for i in range(cfg.num_layers - 1):
            hcur = conv(f"conv{i + 2}")(
                hcur.astype(cdt),
                batch.senders,
                batch.receivers,
                z_emb.astype(cdt),
                edge_mask,
                node_mask,
                halo_ctx=halo_ctx,
                **kw,
            )
            xs.append(hcur)

        # JK concat + pooling stay in the conv compute dtype (the f32
        # concat alone was 21 MB x2 of HBM traffic at flagship shapes);
        # the head runs in f32 from the pooled (G, .) tensor on
        h = jnp.concatenate([a.astype(cdt) for a in xs], axis=-1)

        # --- head ---
        head_ax = node_ax
        if cfg.graph_pred:
            if cfg.halo_axis is not None:
                # node rows are range-sharded: pool LOCAL partial
                # per-graph sums (node_graph carries global graph ids),
                # then one psum makes the (G, .) rows exact and
                # REPLICATED — the head below runs identically on every
                # shard, so its BN must NOT psum (axis None keeps the
                # batch statistics bit-equal to the single-device step)
                G = batch.graph_mask.shape[0]
                hf = jnp.where(node_mask[:, None], h.astype(jnp.float32), 0.0)
                s = jax.lax.psum(
                    jax.ops.segment_sum(hf, batch.node_graph, G),
                    cfg.halo_axis,
                )
                if cfg.pool == "add":
                    h = s
                else:
                    cnt = jax.lax.psum(
                        jax.ops.segment_sum(
                            node_mask.astype(jnp.float32), batch.node_graph, G
                        ),
                        cfg.halo_axis,
                    )
                    h = s / jnp.maximum(cnt, 1.0)[:, None]
                head_ax = None
            else:
                h = pool_nodes_to_graphs(
                    h, batch, reduce="sum" if cfg.pool == "add" else "mean"
                )
            head_mask = batch.graph_mask
        else:
            head_mask = node_mask
        h = h.astype(jnp.float32)

        h = TorchDense(H, name="lin1")(h)
        h = MaskedBatchNorm(axis_name=head_ax, name="bn_lin1")(
            h, head_mask, use_running_average
        )
        if cfg.head_order == "act_dropout":
            h = act(h)
            h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
        else:
            h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
            h = act(h)
        h = TorchDense(cfg.out_dim, name="lin2")(h)
        return h
