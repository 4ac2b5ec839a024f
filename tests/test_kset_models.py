"""k-set featurize/batching golden tests + KGNN model forwards."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.kset import attach_kset_graphs
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.models.kgnn_models import KGNN, KGNNConfig
from tests.conftest import random_graph


def _triangle_plus_tail():
    # triangle 0-1-2 plus tail 2-3
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    ei = np.asarray(
        [[a for a, b in pairs] + [b for a, b in pairs],
         [b for a, b in pairs] + [a for a, b in pairs]], np.int32
    )
    return 4, ei


def test_kset2_all_pairs_golden():
    n, ei = _triangle_plus_tail()
    g = GraphData(
        num_nodes=n, edge_index=ei,
        x=np.eye(5, dtype=np.float32)[[0, 1, 0, 2]],
    )
    out = attach_kset_graphs(g, ks=(2,), connected=False, malkin=True)
    ex = out.extras
    assert ex["num_kset2"] == 6  # C(4,2) pairs
    # iso types: label pair (sorted) + adjacency bit * 25
    labels = [0, 1, 0, 2]
    adj = {(0, 1), (1, 2), (0, 2), (2, 3)}
    want_iso = []
    for u, v in itertools.combinations(range(4), 2):
        a, b = sorted((labels[u], labels[v]))
        want_iso.append(a * 5 + b + 25 * ((u, v) in adj))
    assert ex["kset2_iso"].tolist() == want_iso
    # assignment covers each set twice (2 members)
    assert ex["kset2_assign"].shape == (2, 12)
    # malkin set-graph edges are symmetric, no self loops
    s, r = ex["kset2_edge_index"]
    assert np.all(s != r)
    pairs = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_kset3_connected_golden():
    n, ei = _triangle_plus_tail()
    g = GraphData(
        num_nodes=n, edge_index=ei,
        x=np.eye(5, dtype=np.float32)[[0, 0, 0, 0]],
    )
    out = attach_kset_graphs(g, ks=(2, 3), malkin=True)
    ex = out.extras
    # connected 3-sets: {0,1,2} (triangle) and every path of length 2:
    # {0,2,3}, {1,2,3} -> 3 sets
    assert ex["num_kset3"] == 3
    # 2->3 incidences: 3 per 3-set
    assert ex["num_assign_2to3"] == 9
    row, col = ex["assign_2to3"]
    assert row.max() < ex["num_kset2"] and col.max() < ex["num_kset3"]


def test_kset_batching_offsets(rng):
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=6)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=np.eye(5, dtype=np.float32)[
                rng.integers(0, 5, n)
            ],
        )
        graphs.append(
            attach_kset_graphs(g, ks=(2, 3), malkin=True)
        )
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    assert spec.num_kset2 > 0 and spec.num_kset3 > 0
    b = pad_and_batch(graphs, spec)
    ex = b.extras
    n2_0 = graphs[0].extras["num_kset2"]
    # graph 1's sets start right after graph 0's
    np.testing.assert_array_equal(
        ex["kset2_iso"][n2_0:n2_0 + graphs[1].extras["num_kset2"]],
        graphs[1].extras["kset2_iso"],
    )
    assert ex["kset2_graph"][0] == 0
    assert ex["kset2_graph"][n2_0] == 1
    # assignment nodes of graph 1 are shifted by graph 0's node count
    a_mask = ex["kset2_assign_mask"]
    a_node = ex["kset2_assign_node"][a_mask]
    na0 = graphs[0].extras["kset2_assign"].shape[1]
    assert a_node[na0:].min() >= graphs[0].num_nodes
    # 2to3 incidence offsets stay within each graph's set ranges
    m23 = ex["assign_2to3_mask"]
    na23_0 = graphs[0].extras["num_assign_2to3"]
    rows = ex["assign_2to3_row"][m23]
    assert rows[:na23_0].max() < n2_0
    if m23.sum() > na23_0:
        assert rows[na23_0:].min() >= n2_0


def make_qm9ish_copy_graphs(rng, k=2, levels=(2,)):
    cfg = NodeSubgraphConfig(h=2, use_rd=True)
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=6)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=np.eye(5, dtype=np.float32)[rng.integers(0, 5, n)],
            edge_attr=rng.normal(size=(ei.shape[1], 5)).astype(np.float32),
            y=np.asarray([rng.normal()], np.float32),
        )
        big = create_node_subgraphs(g, cfg)
        big = attach_kset_graphs(
            big, ks=levels, malkin=True
        )
        graphs.append(big)
    return graphs


def test_kgnn_nested_k12_forward(rng):
    graphs = make_qm9ish_copy_graphs(rng, 2, levels=(2,))
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = KGNN(KGNNConfig(levels=(2,), use_rd=True))
    v = model.init(jax.random.key(0), b)
    out = jax.jit(lambda v, x: model.apply(v, x))(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_kgnn_nested_k123_forward(rng):
    graphs = make_qm9ish_copy_graphs(rng, 2, levels=(2, 3))
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = KGNN(KGNNConfig(levels=(2, 3), use_rd=True))
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_kgnn_k1_plain_forward(rng):
    # non-nested k1_GNN path: plain graphs, no copies
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=6)
        graphs.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=np.eye(5, dtype=np.float32)[rng.integers(0, 5, n)],
            edge_attr=rng.normal(size=(ei.shape[1], 5)).astype(np.float32),
            y=np.asarray([0.0], np.float32),
        ))
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = KGNN(KGNNConfig(levels=(), nested=False))
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_kgnn_padding_invariance(rng):
    import dataclasses

    graphs = make_qm9ish_copy_graphs(rng, 2, levels=(2,))
    s1 = BatchSpec.from_graphs(graphs, batch_size=2)
    s2 = dataclasses.replace(
        s1, num_nodes=s1.num_nodes + 16, num_edges=s1.num_edges + 128,
        num_kset2=s1.num_kset2 + 8, num_kset2_edges=s1.num_kset2_edges + 128,
        num_kset2_assign=s1.num_kset2_assign + 128,
    )
    b1 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s1))
    b2 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s2))
    model = KGNN(KGNNConfig(levels=(2,), use_rd=True))
    v = model.init(jax.random.key(0), b1)
    o1 = model.apply(v, b1)
    o2 = model.apply(v, b2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)