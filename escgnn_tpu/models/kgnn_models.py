"""k-GNN models — higher-order WL networks over k-set graphs.

Capability mirror of the reference's k-gnn stack:
  * `GraphConv` (reference `software/k-gnn-master/k_gnn/graph_conv.py:9-73`):
    out_r = (1/deg_r) * sum_{(r,c) in E_k} (x W)_c + x_r W_root + b.
  * `avg_pool(x, assignment)` (reference `k_gnn/pool.py:4-16`): mean of the
    member-node rows into each set row.
  * QM9 model family (reference `qm9_models.py`): `k1_GNN` (`:142-207`,
    3 NNConv layers + pooling + fc head) and the nested variants
    `Nested_k12_GNN` / `Nested_k13_GNN` / `Nested_k123_GNN`
    (`qm9_models.py:291-377,379-466,468-570`): NNConv over the subgraph
    copies, per-subgraph mean (x_1), then per level k: avg_pool onto
    k-sets ‖ one-hot iso types, 2 GraphConvs over the set graph,
    mean back to subgraphs (x_k); concat, graph mean pool, fc1/2/3.

TPU form: set graphs arrive as padded extras from the batcher
(`kset{k}_senders/receivers/iso/assign_*/to_subgraph`, see
`featurize/kset.py`); every reduction is a masked segment op; the
per-edge NNConv weight matrices are one batched einsum on the MXU.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.models.layers import TorchDense
from escgnn_tpu.ops.segment import segment_mean, segment_sum


class NNConv(nn.Module):
    """PyG-semantics NNConv (edge-conditioned conv, aggr='add'):
    out_i = x_i W_root + sum_j x_j . h(e_ij), h(e) reshaped (F_in, F_out).
    The reference's QM9 models build h = Linear(Fe,128) -> ReLU ->
    Linear(128, F_in * F_out) (`qm9_models.py:309-317`)."""

    features: int
    edge_hidden: int = 128

    @nn.compact
    def __call__(self, x, senders, receivers, edge_attr, edge_mask):
        n, f_in = x.shape
        e = edge_attr.astype(jnp.float32).reshape(edge_attr.shape[0], -1)
        w = nn.relu(TorchDense(self.edge_hidden, name="edge_nn_0")(e))
        w = TorchDense(f_in * self.features, name="edge_nn_1")(w)
        w = w.reshape(-1, f_in, self.features)
        msg = jnp.einsum(
            "ef,efg->eg", jnp.take(x, senders, axis=0), w,
            preferred_element_type=jnp.float32,
        )
        agg = segment_sum(
            msg, receivers, n, mask=edge_mask, indices_are_sorted=True
        )
        root = TorchDense(self.features, use_bias=True, name="root")(x)
        return agg + root


class KSetGraphConv(nn.Module):
    """k_gnn GraphConv over a padded set-graph edge list."""

    features: int

    @nn.compact
    def __call__(self, x, senders, receivers, edge_mask, set_mask):
        n = x.shape[0]
        h = TorchDense(self.features, use_bias=False, name="weight")(x)
        agg = segment_sum(
            jnp.take(h, senders, axis=0), receivers, n,
            mask=edge_mask, indices_are_sorted=True,
        )
        deg = segment_sum(
            edge_mask.astype(jnp.float32), receivers, n,
            indices_are_sorted=True,
        )
        agg = agg / jnp.maximum(deg, 1.0)[:, None]
        root = TorchDense(self.features, use_bias=True, name="root")(x)
        return agg + root


def avg_pool_assignment(x, assign_node, assign_set, assign_mask, num_sets):
    """k_gnn avg_pool: mean of member-node features into set rows."""
    return segment_mean(
        jnp.take(x, assign_node, axis=0), assign_set, num_sets,
        mask=assign_mask,
    )


@dataclasses.dataclass(frozen=True)
class KGNNConfig:
    levels: tuple = (2,)  # () = k1_GNN; (2,) = k12; (3,) = k13; (2,3) = k123
    num_iso_2: int = 75  # one-hot width of 2-set iso types
    num_iso_3: int = 250
    node_type_dim: int = 8
    z_vocab: int = 1000
    use_rd: bool = False
    use_pos: bool = False
    nested: bool = True  # copies-graph with two-level pooling
    out_dim: int = 1


class KGNN(nn.Module):
    """k1/Nested_k12/k13/k123 QM9 models (see module docstring)."""

    cfg: KGNNConfig

    @nn.compact
    def __call__(self, batch: GraphBatch, **_):
        cfg = self.cfg
        ex = batch.extras
        node_mask = batch.node_mask

        # input embedding: node_type emb + z emb (+ rd) ‖ x (+ pos)
        z_emb = 0.0
        if ex and "z" in ex:
            zt = nn.Embed(
                cfg.z_vocab, 8, embedding_init=nn.initializers.normal(1.0),
                name="z_embedding",
            )(ex["z"].astype(jnp.int32))
            z_emb = jnp.sum(zt, axis=1)
        if cfg.use_rd and ex and "rd" in ex:
            z_emb = z_emb + TorchDense(8, name="rd_projection")(
                ex["rd"].astype(jnp.float32)
            )
        nt = ex["node_type"] if ex and "node_type" in ex else jnp.argmax(
            batch.x.reshape(batch.x.shape[0], -1), axis=-1
        )
        x0 = nn.Embed(
            5, cfg.node_type_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="node_type_embedding",
        )(nt.astype(jnp.int32).reshape(-1)) + z_emb
        x = jnp.concatenate(
            [x0, batch.x.reshape(batch.x.shape[0], -1).astype(jnp.float32)],
            axis=-1,
        )
        if cfg.use_pos and batch.pos is not None:
            x = jnp.concatenate([x, batch.pos.astype(jnp.float32)], axis=-1)

        # 3 NNConv layers over the (copies-)graph
        for i, width in enumerate((32, 64, 64)):
            x = nn.elu(NNConv(width, name=f"conv{i + 1}")(
                x, batch.senders, batch.receivers, batch.edge_attr,
                batch.edge_mask,
            ))

        if cfg.nested:
            S = batch.segment_mask.shape[0]
            x_1 = segment_mean(x, batch.node_segment, S, mask=node_mask)
        else:
            x_1 = segment_mean(
                x, batch.node_graph, batch.num_graphs, mask=node_mask
            )
        parts = [x_1]

        conv_i = 4
        for lvl in cfg.levels:
            num_sets = ex[f"kset{lvl}_mask"].shape[0]
            xs = avg_pool_assignment(
                x,
                ex[f"kset{lvl}_assign_node"],
                ex[f"kset{lvl}_assign_set"],
                ex[f"kset{lvl}_assign_mask"],
                num_sets,
            )
            num_iso = cfg.num_iso_2 if lvl == 2 else cfg.num_iso_3
            iso = jnp.clip(ex[f"kset{lvl}_iso"].astype(jnp.int32), 0,
                           num_iso - 1)
            onehot = jnp.zeros((num_sets, num_iso), xs.dtype).at[
                jnp.arange(num_sets), iso
            ].set(ex[f"kset{lvl}_mask"].astype(xs.dtype))
            xs = jnp.concatenate([xs, onehot], axis=-1)
            for _ in range(2):
                xs = nn.elu(KSetGraphConv(64, name=f"conv{conv_i}")(
                    xs,
                    ex[f"kset{lvl}_senders"],
                    ex[f"kset{lvl}_receivers"],
                    ex[f"kset{lvl}_edge_mask"],
                    ex[f"kset{lvl}_mask"],
                ))
                conv_i += 1
            if cfg.nested:
                x_k = segment_mean(
                    xs, ex[f"kset{lvl}_to_subgraph"], S,
                    mask=ex[f"kset{lvl}_mask"],
                )
            else:
                x_k = segment_mean(
                    xs, ex[f"kset{lvl}_graph"], batch.num_graphs,
                    mask=ex[f"kset{lvl}_mask"],
                )
            parts.append(x_k)

        h = jnp.concatenate(parts, axis=-1)
        if cfg.nested:
            h = segment_mean(
                h, batch.segment_graph, batch.num_graphs,
                mask=batch.segment_mask,
            )
        h = nn.elu(TorchDense(64, name="fc1")(h))
        h = nn.elu(TorchDense(32, name="fc2")(h))
        return TorchDense(cfg.out_dim, name="fc3")(h)
