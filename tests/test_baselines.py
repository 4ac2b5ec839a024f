"""Baseline conv zoo + pooling zoo + ID-GNN forward/shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.models.baselines import (
    BaselineGNN,
    BaselineGNNConfig,
    RGCNBaseline,
    RGCNBaselineConfig,
)
from escgnn_tpu.models.idgnn import IDGNN, IDGNNConfig
from escgnn_tpu.models.pooling import (
    TopKPool,
    batch_dense_adj,
    dense_diff_pool,
    graclus_cluster,
    to_dense_batch,
)
from tests.conftest import random_graph


def make_graphs(rng, k=3, with_z=False, int_x=False):
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=8)
        x = (
            rng.integers(0, 10, n).astype(np.int32)[:, None]
            if int_x
            else rng.normal(size=(n, 6)).astype(np.float32)
        )
        extras = None
        if with_z:
            extras = {"z": rng.integers(0, 4, n).astype(np.int64)[:, None]}
        graphs.append(
            GraphData(
                num_nodes=n,
                edge_index=ei,
                x=x,
                edge_attr=rng.integers(0, 4, ei.shape[1]).astype(np.int32),
                y=np.asarray([rng.integers(0, 2)], np.int64),
                extras=extras,
            )
        )
    return graphs


def batch_of(graphs, bs=None):
    spec = BatchSpec.from_graphs(graphs, batch_size=bs or len(graphs))
    return jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))


@pytest.mark.parametrize(
    "conv", ["gcn", "gcn_dir", "sage", "gin0", "gin", "gat", "rgcn", "pna"]
)
def test_baseline_convs_forward(rng, conv):
    graphs = make_graphs(rng, 3, with_z=(conv == "gcn_dir"))
    b = batch_of(graphs)
    cfg = BaselineGNNConfig(conv=conv, hidden=16, num_layers=2, out_dim=3)
    model = BaselineGNN(cfg)
    v = model.init(jax.random.key(0), b)
    out, _ = model.apply(
        v, b, deterministic=True, use_running_average=False,
        mutable=["batch_stats"],
    )
    assert out.shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # log_softmax rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-5
    )


@pytest.mark.parametrize(
    "pool", ["add", "mean", "max", "attention", "set2set", "sort"]
)
def test_pooling_zoo(rng, pool):
    graphs = make_graphs(rng, 3)
    b = batch_of(graphs)
    cfg = BaselineGNNConfig(
        conv="gcn", hidden=8, num_layers=1, out_dim=2, pool=pool
    )
    model = BaselineGNN(cfg)
    v = model.init(jax.random.key(0), b)
    out, _ = model.apply(
        v, b, deterministic=True, use_running_average=False,
        mutable=["batch_stats"],
    )
    assert out.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pool_masks_padding(rng):
    """Padding nodes must not leak into pooled outputs: grow the node
    budget and check outputs are unchanged."""
    graphs = make_graphs(rng, 2)
    s1 = BatchSpec.from_graphs(graphs, batch_size=2)
    s2 = BatchSpec(
        num_graphs=2,
        num_nodes=s1.num_nodes + 16,
        num_edges=s1.num_edges + 128,
    )
    b1 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s1))
    b2 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s2))
    cfg = BaselineGNNConfig(conv="gcn", hidden=8, num_layers=1, out_dim=2,
                            pool="attention")
    model = BaselineGNN(cfg)
    v = model.init(jax.random.key(0), b1)
    o1 = model.apply(v, b1, deterministic=True, use_running_average=True)
    o2 = model.apply(v, b2, deterministic=True, use_running_average=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_rgcn_baseline(rng):
    graphs = make_graphs(rng, 2, int_x=True)
    b = batch_of(graphs)
    model = RGCNBaseline(RGCNBaselineConfig(num_layers=2))
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_to_dense_batch_roundtrip(rng):
    graphs = make_graphs(rng, 2)
    b = batch_of(graphs)
    M = 16
    dense, mask = to_dense_batch(b.x, b, M)
    for gi, g in enumerate(graphs):
        np.testing.assert_allclose(
            np.asarray(dense)[gi, : g.num_nodes], g.x, atol=1e-6
        )
        assert np.asarray(mask)[gi].sum() == g.num_nodes


def test_topk_pool_keeps_ratio(rng):
    graphs = make_graphs(rng, 2)
    b = batch_of(graphs)
    pool = TopKPool(ratio=0.5)
    v = pool.init(jax.random.key(0), b.x, b, b.node_mask)
    _, keep = pool.apply(v, b.x, b, b.node_mask)
    keep = np.asarray(keep)
    for gi, g in enumerate(graphs):
        kept = keep[np.asarray(b.node_graph) == gi].sum()
        assert kept == int(np.ceil(0.5 * g.num_nodes))


def test_dense_diff_pool_shapes(rng):
    graphs = make_graphs(rng, 2)
    b = batch_of(graphs)
    M, K = 16, 4
    dense, mask = to_dense_batch(b.x, b, M)
    adj = batch_dense_adj(b, M)
    s_logits = jnp.asarray(np.random.default_rng(1).normal(size=(2, M, K)))
    x2, a2, l_link, l_ent = dense_diff_pool(dense, adj, s_logits, mask)
    assert x2.shape == (2, K, dense.shape[-1])
    assert a2.shape == (2, K, K)
    assert np.isfinite(float(l_link)) and np.isfinite(float(l_ent))


def test_graclus_is_matching(rng):
    n, ei = random_graph(rng, n=12, p=0.4)
    cl = graclus_cluster(ei, n)
    # every cluster has size 1 or 2, and paired nodes are adjacent
    ids, counts = np.unique(cl, return_counts=True)
    assert counts.max() <= 2
    adj = set(map(tuple, ei.T.tolist()))
    for c in ids[counts == 2]:
        u, v = np.flatnonzero(cl == c)
        assert (u, v) in adj or (v, u) in adj


@pytest.mark.parametrize("conv", ["gin", "gcn", "sage", "gat"])
def test_idgnn_forward(rng, conv):
    graphs = make_graphs(rng, 3)
    b = batch_of(graphs)
    model = IDGNN(IDGNNConfig(conv=conv, hidden=16, num_layers=2, out_dim=2))
    v = model.init(jax.random.key(0), b)
    out, _ = model.apply(
        v, b, deterministic=True, use_running_average=False,
        mutable=["batch_stats"],
    )
    assert out.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_idgnn_identity_matters(rng):
    """The identity weights must change root-node outputs (not a plain GIN)."""
    graphs = make_graphs(rng, 2)
    b = batch_of(graphs)
    model = IDGNN(IDGNNConfig(conv="gin", hidden=8, num_layers=1, out_dim=2))
    v = model.init(jax.random.key(0), b)
    out1 = model.apply(v, b, deterministic=True, use_running_average=True)
    # zero out the identity MLP (field-passed modules are auto-named in call
    # order: MLP_0 = mlp, MLP_1 = mlp_id) -> output changes
    v2 = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.zeros_like(x) if "MLP_1" in jax.tree_util.keystr(p) else x, v
    )
    out2 = model.apply(v2, b, deterministic=True, use_running_average=True)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
