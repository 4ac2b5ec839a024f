"""Round-5 flagship-playbook application to GINE+ and NestedPPGN
(VERDICT r04 weak #4): the uniform-block einsum scatter must equal the
ragged segment_sum exactly (f32), and the bf16 stacks must track f32
within bf16 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData


def _mol_graphs(num=6, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        n = int(rng.integers(8, 14))
        src = list(range(n - 1)) + list(range(1, n))
        dst = list(range(1, n)) + list(range(n - 1))
        ei = np.stack([src, dst]).astype(np.int32)
        out.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=np.stack([rng.integers(0, 5, n) for _ in range(9)],
                       axis=1).astype(np.int32),
            edge_attr=np.stack([rng.integers(0, 3, ei.shape[1])
                                for _ in range(3)], axis=1).astype(np.int32),
            y=np.asarray([float(rng.random() > 0.5)], np.float32),
        ))
    return out


def _ginep_feats():
    from escgnn_tpu.featurize.multihop import make_multihop_edges

    return [make_multihop_edges(g, k=3) for g in _mol_graphs()]


def _loss(model, batch):
    from escgnn_tpu.train.loop import bce_graph_loss

    b = jax.tree.map(jnp.asarray, batch)
    var = model.init(jax.random.key(0), b)

    @jax.jit
    def f(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": var.get("batch_stats", {})},
            b, deterministic=True, use_running_average=False,
            mutable=["batch_stats"],
        )
        return bce_graph_loss(out, b)

    return jax.value_and_grad(f)(var["params"])


def test_ginep_uniform_scatter_equals_ragged():
    from escgnn_tpu.models.gine_plus import (
        GINEPlusConfig,
        GINEPlusNetwork,
    )

    feats = _ginep_feats()
    cfgkw = dict(hidden=16, out_dim=1, num_layers=3, dropout=0.0, k=3,
                 virtual_node=True)
    ragged = pad_and_batch(
        feats, BatchSpec.from_graphs(feats, batch_size=len(feats))
    )
    uniform = pad_and_batch(
        feats, BatchSpec.uniform(feats, batch_size=len(feats))
    )
    model = GINEPlusNetwork(GINEPlusConfig(**cfgkw))
    l0, g0 = _loss(model, ragged)
    l1, g1 = _loss(model, uniform)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_ginep_bf16_tracks_f32():
    from escgnn_tpu.models.gine_plus import (
        GINEPlusConfig,
        GINEPlusNetwork,
    )

    feats = _ginep_feats()
    batch = pad_and_batch(
        feats, BatchSpec.uniform(feats, batch_size=len(feats))
    )
    losses = {}
    for dt in ("float32", "bfloat16"):
        model = GINEPlusNetwork(GINEPlusConfig(
            hidden=16, out_dim=1, num_layers=3, dropout=0.0, k=3,
            virtual_node=True, compute_dtype=dt,
        ))
        losses[dt], _ = _loss(model, batch)
    np.testing.assert_allclose(
        float(losses["float32"]), float(losses["bfloat16"]),
        rtol=3e-2,
    )


def test_nested_ppgn_bf16_tracks_f32():
    from escgnn_tpu.featurize.node_subgraphs import (
        NodeSubgraphConfig,
        create_node_subgraphs,
    )
    from escgnn_tpu.models.nested_ppgn import NestedPPGN, NestedPPGNConfig

    feats = [
        create_node_subgraphs(
            g, NodeSubgraphConfig(h=2, use_rd=True, keep_orig_adj=True)
        )
        for g in _mol_graphs(num=4)
    ]
    spec = BatchSpec.from_graphs(feats, batch_size=len(feats))
    batch = pad_and_batch(feats, spec)
    max_sub = max(
        int(np.bincount(np.asarray(g.extras["node_to_subgraph"])).max())
        for g in feats
    )
    losses = {}
    for dt in ("float32", "bfloat16"):
        model = NestedPPGN(NestedPPGNConfig(
            emb_dim=16, num_rb_layers=2, num_tasks=1, use_rd=True,
            max_nodes_per_subgraph=max_sub, classify=False,
            compute_dtype=dt,
        ))
        losses[dt], g = _loss(model, batch)
        gn = sum(float(jnp.sum(jnp.abs(x)))
                 for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0
    np.testing.assert_allclose(
        float(losses["float32"]), float(losses["bfloat16"]),
        rtol=3e-2,
    )
