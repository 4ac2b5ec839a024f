import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.pair_subgraphs import (
    PairSubgraphConfig,
    create_pair_subgraphs,
)
from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig
from tests.conftest import random_graph


def make_pair_graphs(rng, k=2, use_rd=True):
    cfg = PairSubgraphConfig(h=2, use_rd=use_rd)
    out = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 10, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        out.append((g, create_pair_subgraphs(g, cfg)))
    return out


def test_pair_transform_structure(rng):
    n, ei = random_graph(rng, n=6, p=0.5)
    g = GraphData(num_nodes=n, edge_index=ei,
                  x=np.arange(n, dtype=np.int32)[:, None])
    big = create_pair_subgraphs(g, PairSubgraphConfig(h=2, use_rd=True))
    ex = big.extras
    deg = np.bincount(ei[0], minlength=n)
    # one copy per (root, neighbor): total copies = sum max(deg, 1)
    assert ex["num_subgraphs2"] == int(np.maximum(deg, 1).sum())
    assert ex["num_subgraphs"] == n
    # each copy's center pair: root has z label 0 unless overwritten,
    # neighbor has label 2
    z = ex["z"][:, 0]
    for c in range(ex["num_subgraphs2"]):
        r_idx, n_idx = ex["center_idx"][c]
        assert z[n_idx] == 2
    # rd col0 is distance to root: zero at the root itself
    roots = ex["center_idx"][:, 0]
    assert np.allclose(ex["rd"][roots, 0], 0.0, atol=1e-5)
    # edges stay within copies
    s2 = ex["node_to_subgraph2"]
    assert np.all(s2[big.edge_index[0]] == s2[big.edge_index[1]])


@pytest.mark.parametrize(
    "s2pool", ["mean", "center", "mean-center-side"]
)
def test_i2gnn_forward(rng, s2pool):
    pairs = make_pair_graphs(rng, 2)
    feats = [p[1] for p in pairs]
    spec = BatchSpec.from_graphs(feats, batch_size=2)
    assert spec.num_segments2 > 0
    b = jax.tree.map(jnp.asarray, pad_and_batch(feats, spec))
    model = I2GNN(
        I2GNNConfig(num_layers=2, hidden=16, use_rd=True,
                    subgraph2_pooling=s2pool, gate=(s2pool != "center"))
    )
    variables = model.init(jax.random.key(0), b)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_i2gnn_double_pooling(rng):
    graphs = [big for _, big in make_pair_graphs(rng, 2)]
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = I2GNN(I2GNNConfig(
        num_layers=2, hidden=16, use_rd=True, double_pooling=True,
        subgraph2_pooling="mean-center-side",
    ))
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_i2gnn_pooling_nn(rng):
    pairs = make_pair_graphs(rng, 2)
    graphs = [b for _, b in pairs]
    from escgnn_tpu.data.batching import BatchSpec as BS
    spec = BS.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    cfg = I2GNNConfig(
        num_layers=2, hidden=8, use_rd=True, use_pooling_nn=True,
        subgraph2_pooling="mean-center-side", double_pooling=True,
    )
    model = I2GNN(cfg)
    variables = model.init(jax.random.key(0), b)
    assert "edge_pooling_nn_0" in variables["params"]
    assert "node_pooling_nn_0" in variables["params"]
    out = model.apply(variables, b)
    assert out.shape == (b.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))
