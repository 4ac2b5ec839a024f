"""Edge-copy transform goldens + NGNN-on-edge-copies forward."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.edge_subgraphs import (
    EdgeSubgraphConfig,
    canonical_edge_list,
    create_edge_subgraphs,
)
from escgnn_tpu.models.ngnn import NGNN, NGNNConfig
from tests.conftest import random_graph


def test_canonical_edge_list():
    ei = np.asarray([[0, 1, 2, 2], [1, 0, 2, 0]])  # has a (2,2) loop
    out = canonical_edge_list(ei, 3, self_loop=True)
    # loop removed, then one loop per node appended
    assert out.shape == (2, 3 + 3)
    np.testing.assert_array_equal(out[:, :3], [[0, 1, 2], [1, 0, 0]])
    np.testing.assert_array_equal(out[:, 3:], [[0, 1, 2], [0, 1, 2]])


def test_edge_copy_structure(rng):
    n, ei = random_graph(rng, n=7, p=0.4)
    g = GraphData(
        num_nodes=n, edge_index=ei,
        x=np.arange(n, dtype=np.int32)[:, None],
    )
    cfg = EdgeSubgraphConfig(h=2, use_rd=True, self_loop=True)
    big = create_edge_subgraphs(g, cfg)
    ex = big.extras
    E_orig = ei.shape[1]
    assert ex["num_subgraphs"] == E_orig + n  # edges + self loops
    seg = ex["node_to_subgraph"]
    firsts = np.searchsorted(seg, np.arange(ex["num_subgraphs"]))
    # copy e of a real edge (u, v): first node is u with z = (0, d(u,v))
    canon = canonical_edge_list(ei, n, True)
    for e in range(ex["num_subgraphs"]):
        u, v = int(canon[0, e]), int(canon[1, e])
        f = firsts[e]
        assert big.x[f, 0] == u
        assert ex["z"][f, 0] == 0  # distance to root u
        if u == v:
            assert ex["z"][f, 1] == 0
    # rd of the root is 0
    assert np.allclose(ex["rd"][firsts, 0], 0.0, atol=1e-5)
    # edges stay within copies
    assert np.all(seg[big.edge_index[0]] == seg[big.edge_index[1]])


def test_edge_copy_z_is_pair_distance(rng):
    # path 0-1-2: copy of edge (0,1) contains 0,1,2 (h=2) with
    # z = (d0, d1) = (0,1),(1,0),(2,1)
    ei = np.asarray([[0, 1, 1, 2], [1, 0, 2, 1]], np.int32)
    g = GraphData(num_nodes=3, edge_index=ei)
    big = create_edge_subgraphs(g, EdgeSubgraphConfig(h=2, self_loop=False))
    ex = big.extras
    seg = ex["node_to_subgraph"]
    nodes0 = np.flatnonzero(seg == 0)  # copy of edge (0, 1)
    z0 = ex["z"][nodes0]
    got = set(map(tuple, z0.tolist()))
    assert got == {(0, 1), (1, 0), (2, 1)}


def test_ngnn_runs_on_edge_copies(rng):
    cfg = EdgeSubgraphConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=6)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 10, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=np.asarray([0.5], np.float32),
        )
        graphs.append(create_edge_subgraphs(g, cfg))
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = NGNN(NGNNConfig(num_layers=2, hidden=16, use_rd=True))
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))
