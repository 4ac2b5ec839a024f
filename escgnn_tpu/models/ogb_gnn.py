"""OGB molecule models — the GNN / GNN_node_efficient family.

Capability mirror of reference `ogb_mol_gnn.py`:
  * AtomEncoder / BondEncoder: sums of per-feature embeddings over the
    OGB categorical feature vocabularies (`ogb_mol_gnn.py:264-296`).
  * GINConvEff (`ogb_mol_gnn.py:323-358`): GIN conv whose edge embedding
    is BondEncoder(edge_attr) + Linear(z_emb) — the ESC structural
    encoding enters every layer through `edge_encoder_pos`.
  * GNNNodeEfficient (`ogb_mol_gnn.py:614-792`): shared z_emb across
    layers, per-layer virtual-node broadcast + add-pool update, BN,
    dropout (no ReLU on last layer), optional residual, JK last/sum.
  * GNN wrapper (`ogb_mol_gnn.py:66-261`): graph pooling zoo
    (sum/mean/max/attention/set2set/sort/combine-with-PNA-scalers),
    subgraph pooling stage for two-level (copy-based) batches
    (sum/mean/max/attention/center/combine, `ogb_mol_gnn.py:172-207,
    218-233,255-258`) + prediction head.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import (
    MLP,
    MaskedBatchNorm,
    TorchDense,
    _dense_local_aggregate,
)
from escgnn_tpu.ops.segment import (
    pool_nodes_to_graphs,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)
from escgnn_tpu.ops.zemb import (
    expand_rows,
    zemb_from_batch,
    zemb_unique_rows,
)

# OGB categorical vocab sizes (ogb.utils.features get_atom/bond_feature_dims)
ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)


class FeatureSumEncoder(nn.Module):
    """Sum of one embedding table per categorical feature column.

    TPU layout: the sum of per-column lookups is ONE count-matrix
    matmul. Column ids are offset into a concatenated vocabulary, the
    (N, V_total) 0/1 indicator C is built by a broadcast compare, and
    out = C @ concat(tables) — forward AND backward (C^T @ dY) are
    single MXU matmuls. nn.Embed's gather would transpose to a serial
    per-row scatter-add: profiled ~45 us per table gradient on the
    molhiv train step, 27 tables = ~0.9 ms/step, the single largest
    cost of the un-optimized OgbGNN path. Param paths stay
    `emb_{i}/embedding` (xavier_uniform, as in OGB's encoders)."""

    vocab_sizes: Sequence[int]
    emb_dim: int

    @nn.compact
    def __call__(self, feats):  # (N, num_feats) int
        init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
        tables = [
            self.param(
                f"emb_{i}",
                lambda key, shape: {"embedding": init(key, shape)},
                (vocab, self.emb_dim),
            )["embedding"]
            for i, vocab in enumerate(self.vocab_sizes)
        ]
        stacked = jnp.concatenate(tables, axis=0)  # (V_total, d)
        offs = np.concatenate(
            [[0], np.cumsum(self.vocab_sizes[:-1])]
        ).astype(np.int32)
        ids = feats.astype(jnp.int32) + offs[None, :]  # (N, F) global ids
        V = int(np.sum(self.vocab_sizes))
        C = (
            ids[:, :, None] == jnp.arange(V, dtype=jnp.int32)[None, None, :]
        ).astype(stacked.dtype).sum(axis=1)  # (N, V) counts
        return jnp.matmul(C, stacked, preferred_element_type=jnp.float32)


class GINConvEff(nn.Module):
    """GIN conv with Bond + structural edge embeddings (see module doc).

    `float_edge_attr`: linear encoder on continuous edge features
    (ogbg-ppa's 7-dim floats, reference PPAEdgeEncoder) instead of the
    per-column bond-vocabulary embedding sum."""

    emb_dim: int
    float_edge_attr: bool = False
    # uniform per-graph block layout (batch.nodes_per_graph): gather and
    # scatter run as per-graph one-hot einsums on the MXU instead of a
    # global take + segment_sum — the flagship NestedGIN_eff playbook
    # (models/layers.py `_dense_local_aggregate`); opt in via
    # BatchSpec.uniform
    uniform_nodes: Optional[int] = None

    @nn.compact
    def __call__(
        self, x, senders, receivers, edge_attr, z_emb, edge_mask,
        node_mask=None,
        *, deterministic: bool, use_running_average: bool,
    ):
        eps = self.param("eps", nn.initializers.zeros, ())
        if self.float_edge_attr:
            e = TorchDense(self.emb_dim, name="edge_encoder")(
                edge_attr.astype(jnp.float32)
            )
        else:
            e = FeatureSumEncoder(
                BOND_FEATURE_DIMS, self.emb_dim, name="edge_encoder"
            )(edge_attr)
        e = e + TorchDense(self.emb_dim, name="edge_encoder_pos")(z_emb)
        if self.uniform_nodes is not None:
            agg = _dense_local_aggregate(
                x, senders, receivers, e.astype(x.dtype), edge_mask,
                self.uniform_nodes,
            )
        else:
            msg = nn.relu(jnp.take(x, senders, axis=0) + e)
            agg = segment_sum(
                msg, receivers, num_segments=x.shape[0], mask=edge_mask,
                indices_are_sorted=True,
            )
        h = (1.0 + eps) * x + agg
        # mlp: Linear(d, 2d) -> BN -> ReLU -> Linear(2d, d); node_mask
        # keeps padding rows out of the training batch statistics
        h = TorchDense(2 * self.emb_dim, name="mlp_0")(h)
        h = MaskedBatchNorm(name="mlp_bn")(h, node_mask, use_running_average)
        h = nn.relu(h)
        return TorchDense(self.emb_dim, name="mlp_1")(h)


@dataclasses.dataclass(frozen=True)
class OgbGNNConfig:
    num_tasks: int = 1
    num_layers: int = 5
    emb_dim: int = 300
    dropout: float = 0.5
    virtual_node: bool = True
    residual: bool = False
    jk: str = "last"  # last | sum
    # sum | mean | max | attention | combine | set2set | sort
    graph_pooling: str = "mean"
    # applied between node and graph level when the batch carries
    # subgraph-copy segments (node_segment/segment_graph):
    # sum | mean | max | attention | center | combine
    subgraph_pooling: str = "mean"
    sort_k: int = 20  # reference `self.k = 20` (ogb_mol_gnn.py:148)
    z_dim: int = 1800
    # random node initialization: h0 += U(-1, 1) per feature, an
    # expressiveness baseline (`ogb_mol_gnn.py:719-721`); uses the
    # "rni" rng stream, active only when deterministic=False
    rni: bool = False
    # feed raw batch.x as h0 (ogbg-ppa-style, `ogb_mol_gnn.py:705-708`)
    skip_node_encoder: bool = False
    # float32 | bfloat16 conv stacks (f32 master params, f32 BN stats and
    # head) — the flagship NestedGIN_eff precision recipe
    compute_dtype: str = "float32"
    # ogbg-ppa featurization (reference encoder/ppa_encoder.py): one
    # uniform learned node embedding (no node features) and a linear
    # encoder on the 7-dim float edge features
    ppa_encoders: bool = False
    # random-walk return-probability features: number of walk steps
    # (0 = off). The reference projects extras['rp'] into the node-level
    # initial state (`ogb_mol_gnn.py:449-450,531-535` — there via
    # z_emb += rp_proj then h0 += z_emb; here z_emb is edge-level, so
    # the projection adds to h0 directly, the same node-level sum)
    use_rp: int = 0


class GNNNodeEfficient(nn.Module):
    cfg: OgbGNNConfig

    @nn.compact
    def __call__(
        self, batch: GraphBatch, *, deterministic: bool,
        use_running_average: bool, perturb=None,
    ):
        cfg = self.cfg
        d = cfg.emb_dim
        N = batch.num_nodes
        G = batch.num_graphs
        node_mask, edge_mask = batch.node_mask, batch.edge_mask
        kw = dict(
            deterministic=deterministic, use_running_average=use_running_average
        )

        if cfg.ppa_encoders:
            # featureless ppa nodes: one uniform learned embedding row
            h = jnp.broadcast_to(
                self.param("node_const", nn.initializers.normal(1.0), (d,)),
                (N, d),
            )
        elif cfg.skip_node_encoder:
            h = batch.x.astype(jnp.float32)
        else:
            h = FeatureSumEncoder(ATOM_FEATURE_DIMS, d, name="node_encoder")(
                batch.x.astype(jnp.int32)
            )
        if cfg.use_rp:
            rp = (batch.extras or {}).get("rp")
            assert rp is not None, "use_rp set but batch carries no 'rp'"
            h = h + TorchDense(d, name="rp_projection")(
                rp.astype(jnp.float32)[:, : cfg.use_rp]
            )
        if cfg.rni and not deterministic:
            h = h + jax.random.uniform(
                self.make_rng("rni"), h.shape, h.dtype, -1.0, 1.0
            )
        if perturb is not None:
            # FLAG-style adversarial input perturbation
            # (`ogb_mol_gnn.py:726-727`): added to h0 so its gradient
            # drives the ascent step in the training loop
            h = h + perturb

        z_table = self.param(
            "z_initial", nn.initializers.normal(1.0), (cfg.z_dim, d)
        )
        z_mlp = MLP(
            features=(d,), dropout=cfg.dropout, act=nn.relu, pre_act=True,
            name="z_embedding",
        )
        # dedup layout, no dropout: z MLP on the R unique encoding rows
        # with multiplicity-weighted BN (bit-identical statistics), then
        # one expand to edges — the flagship recipe
        # (models/nested_gin_eff.py). Dropout would correlate edges that
        # share a row, hence the gate.
        u = zemb_unique_rows(z_table, batch) if cfg.dropout == 0.0 else None
        if u is not None and getattr(batch, "enc_row_weight", None) is not None:
            u = z_mlp(u, batch.enc_row_weight, **kw)
            z_emb = expand_rows(u, batch)
        else:
            z_emb = zemb_from_batch(z_table, batch)
            z_emb = z_mlp(z_emb, edge_mask, **kw)

        if cfg.virtual_node:
            vn = jnp.zeros((G, d), h.dtype) + self.param(
                "virtualnode_embedding", nn.initializers.zeros, (d,)
            )

        # center_pool_virtual (`ogb_mol_gnn.py:731-738`): with center
        # subgraph pooling on a two-level batch, the virtual node reaches
        # only each copy's root node instead of every node
        center_vn = (
            cfg.virtual_node
            and cfg.subgraph_pooling == "center"
            and batch.node_segment is not None
        )
        if center_vn:
            _, is_root = _segment_roots(
                node_mask, batch.node_segment, batch.segment_mask.shape[0]
            )

        cdt = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        uniform_nodes = (
            None
            if batch.node_segment is not None
            else getattr(batch, "nodes_per_graph", None)
        )
        h_list = [h]
        for layer in range(cfg.num_layers):
            hcur = h_list[layer]
            if cfg.virtual_node:
                if uniform_nodes is not None and N == G * uniform_nodes:
                    # uniform blocks: the broadcast is a reshape, whose
                    # transpose is a fast axis-1 reduction — jnp.take's
                    # transpose is a serial scatter-add (~86 us/layer
                    # profiled on the molhiv step)
                    vn_nodes = jnp.broadcast_to(
                        vn[:, None, :], (G, uniform_nodes, d)
                    ).reshape(N, d)
                else:
                    vn_nodes = jnp.take(vn, batch.node_graph, axis=0)
                if center_vn:
                    vn_nodes = jnp.where(is_root[:, None], vn_nodes, 0.0)
                hcur = hcur + vn_nodes
                h_list[layer] = hcur
            h = GINConvEff(
                d, float_edge_attr=cfg.ppa_encoders,
                uniform_nodes=uniform_nodes, name=f"conv{layer}"
            )(
                hcur.astype(cdt), batch.senders, batch.receivers,
                batch.edge_attr, z_emb.astype(cdt), edge_mask, node_mask,
                **kw,
            )
            h = MaskedBatchNorm(name=f"batch_norm{layer}")(
                h, node_mask, use_running_average
            )
            if layer == cfg.num_layers - 1:
                h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
            else:
                h = nn.Dropout(cfg.dropout, deterministic=deterministic)(
                    nn.relu(h)
                )
            if cfg.residual:
                h = h + h_list[layer]
            h_list.append(h)

            if cfg.virtual_node and layer < cfg.num_layers - 1:
                vn_tmp = (
                    pool_nodes_to_graphs(h_list[layer], batch, reduce="sum")
                    + vn
                )
                vn_new = MLP(
                    features=(2 * d, d), dropout=0.0, act=nn.relu,
                    name=f"mlp_virtualnode_{layer}",
                )(vn_tmp, batch.graph_mask, **kw)
                vn_new = nn.Dropout(cfg.dropout, deterministic=deterministic)(
                    vn_new
                )
                vn = vn + vn_new if cfg.residual else vn_new

        if cfg.jk == "last":
            return h_list[-1]
        return sum(h_list[: cfg.num_layers])


def _segment_roots(node_mask, node_segment, num_segments):
    """(first-node index per segment, is-root node indicator). The copy
    transforms place each copy's root first, so the root is the minimum
    node index within the segment."""
    n = node_mask.shape[0]
    idx = jnp.where(node_mask, jnp.arange(n), n)
    first = jax.ops.segment_min(idx, node_segment, num_segments)
    is_root = (idx == jnp.take(first, node_segment)) & node_mask
    return jnp.minimum(first, n - 1), is_root


def _std_pool(h, ids, G, mask):
    mean = segment_mean(h, ids, G, mask=mask)
    sq = segment_mean(h * h, ids, G, mask=mask)
    return jnp.sqrt(jnp.maximum(sq - mean * mean, 0.0) + 1e-5)


class OgbGNN(nn.Module):
    """GNN wrapper: node embeddings -> graph pooling -> prediction head."""

    cfg: OgbGNNConfig

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        *,
        deterministic: bool = True,
        use_running_average: bool = True,
        perturb=None,
    ):
        cfg = self.cfg
        kw = dict(
            deterministic=deterministic, use_running_average=use_running_average
        )
        h = GNNNodeEfficient(cfg, name="gnn_node")(
            batch, perturb=perturb, **kw
        )
        ids, G, mask = batch.node_graph, batch.num_graphs, batch.node_mask

        if batch.node_segment is not None:
            # two-level (copy-based) batch: subgraph pooling stage first
            # (reference GNN.forward, ogb_mol_gnn.py:255-258), then the
            # graph pooling below runs over subgraph rows
            h = self._subpool(h, batch, use_running_average)
            ids, mask = batch.segment_graph, batch.segment_mask

        if cfg.graph_pooling == "sum":
            if batch.node_segment is None:
                g = pool_nodes_to_graphs(h, batch, reduce="sum")
            else:
                g = segment_sum(h, ids, G, mask=mask)
        elif cfg.graph_pooling == "mean":
            if batch.node_segment is None:
                g = pool_nodes_to_graphs(h, batch, reduce="mean")
            else:
                g = segment_mean(h, ids, G, mask=mask)
        elif cfg.graph_pooling == "max":
            g = segment_max(h, ids, G, mask=mask)
        elif cfg.graph_pooling == "attention":
            gate = TorchDense(2 * cfg.emb_dim, name="gate_0")(h)
            gate = MaskedBatchNorm(name="gate_bn")(
                gate, mask, use_running_average
            )
            gate = TorchDense(1, name="gate_1")(nn.relu(gate))[:, 0]
            w = segment_softmax(gate, ids, G, mask=mask)
            g = segment_sum(h * w[:, None], ids, G, mask=mask)
        elif cfg.graph_pooling == "combine":
            # PNA-style aggregator x scaler zoo (`ogb_mol_gnn.py:224-248`):
            # [mean, max, min, std] x [identity, amplification, attenuation]
            agg = jnp.concatenate(
                [
                    segment_mean(h, ids, G, mask=mask),
                    segment_max(h, ids, G, mask=mask),
                    segment_min(h, ids, G, mask=mask),
                    _std_pool(h, ids, G, mask),
                ],
                axis=-1,
            )
            deg = segment_sum(mask.astype(h.dtype), ids, G)[:, None]
            logd = jnp.log(deg + 1.0)
            avg_logd = jnp.sum(logd * deg) / jnp.maximum(jnp.sum(deg), 1.0)
            g = jnp.concatenate(
                [agg, agg * logd / avg_logd, agg * avg_logd / (logd + 1e-6)],
                axis=-1,
            )
            g = TorchDense(cfg.emb_dim, name="graph_nn_0")(g)
            g = nn.relu(g)
            g = TorchDense(cfg.emb_dim, name="graph_nn_1")(g)
            g = nn.relu(g)
        elif cfg.graph_pooling == "set2set":
            # Set2Set(emb_dim, processing_steps=2) -> (G, 2*emb_dim) head
            # (ogb_mol_gnn.py:146-147,165-166)
            from escgnn_tpu.models.pooling import Set2Set

            g = Set2Set(processing_steps=2, name="set2set")(
                h, batch, ids=ids, mask=mask
            )
        elif cfg.graph_pooling == "sort":
            # DGCNN sort-pool readout (ogb_mol_gnn.py:147-161):
            # top-k node rows -> Conv1d(1,16,D,stride D) == per-slot
            # dense -> MaxPool1d(2,2) -> Conv1d(16,32,5) -> flatten
            if batch.node_segment is not None:
                raise ValueError(
                    "graph_pooling='sort' supports flat batches only"
                )
            from escgnn_tpu.models.pooling import global_sort_pool

            k = cfg.sort_k
            m = max(-(-h.shape[0] // max(G, 1)), k)
            z = global_sort_pool(h, batch, k, m).reshape(G, k, cfg.emb_dim)
            c = nn.relu(TorchDense(16, name="conv1d_params1")(z))
            # MaxPool1d(2, 2): trailing element dropped when k is odd
            c = jnp.max(
                c[:, : 2 * (k // 2)].reshape(G, k // 2, 2, 16), axis=2
            )
            c = nn.relu(
                nn.Conv(32, (5,), padding="VALID", name="conv1d_params2")(c)
            )
            g = c.reshape(G, -1)
        else:
            raise ValueError(cfg.graph_pooling)

        return TorchDense(cfg.num_tasks, name="graph_pred_linear")(g)

    def _subpool(self, h, batch: GraphBatch, use_running_average: bool):
        """node -> subgraph-copy pooling (reference `subpool`,
        ogb_mol_gnn.py:172-207; combine = cat[mean,max,min,std,center]
        x [identity, amplification, attenuation] -> sub_nn,
        `combine_pool_sub` ogb_mol_gnn.py:225-233)."""
        cfg = self.cfg
        ids, mask = batch.node_segment, batch.node_mask
        S = batch.segment_mask.shape[0]

        def center(x):
            first, _ = _segment_roots(mask, ids, S)
            return jnp.take(x, first, axis=0)

        if cfg.subgraph_pooling == "sum":
            return segment_sum(h, ids, S, mask=mask)
        if cfg.subgraph_pooling == "mean":
            return segment_mean(h, ids, S, mask=mask)
        if cfg.subgraph_pooling == "max":
            return segment_max(h, ids, S, mask=mask)
        if cfg.subgraph_pooling == "center":
            return center(h)
        if cfg.subgraph_pooling == "attention":
            gate = TorchDense(2 * cfg.emb_dim, name="sub_gate_0")(h)
            gate = MaskedBatchNorm(name="sub_gate_bn")(
                gate, mask, use_running_average
            )
            gate = TorchDense(1, name="sub_gate_1")(nn.relu(gate))[:, 0]
            w = segment_softmax(gate, ids, S, mask=mask)
            return segment_sum(h * w[:, None], ids, S, mask=mask)
        if cfg.subgraph_pooling == "combine":
            agg = jnp.concatenate(
                [
                    segment_mean(h, ids, S, mask=mask),
                    segment_max(h, ids, S, mask=mask),
                    segment_min(h, ids, S, mask=mask),
                    _std_pool(h, ids, S, mask),
                    center(h),
                ],
                axis=-1,
            )
            deg = segment_sum(mask.astype(h.dtype), ids, S)[:, None]
            logd = jnp.log(deg + 1.0)
            avg_logd = jnp.sum(logd * deg) / jnp.maximum(jnp.sum(deg), 1.0)
            g = jnp.concatenate(
                [agg, agg * logd / avg_logd, agg * avg_logd / (logd + 1e-6)],
                axis=-1,
            )
            g = nn.relu(TorchDense(cfg.emb_dim, name="sub_nn_0")(g))
            return nn.relu(TorchDense(cfg.emb_dim, name="sub_nn_1")(g))
        raise ValueError(cfg.subgraph_pooling)
