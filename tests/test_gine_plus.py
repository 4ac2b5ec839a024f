"""Multihop transform golden tests + GINE+ forward."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.multihop import make_multihop_edges
from escgnn_tpu.models.gine_plus import GINEPlusConfig, GINEPlusNetwork
from tests.conftest import random_graph


def _path_graph(n):
    src = np.arange(n - 1)
    ei = np.stack([np.concatenate([src, src + 1]),
                   np.concatenate([src + 1, src])]).astype(np.int32)
    return ei


def test_multihop_path_golden():
    """On the path 0-1-2-3 with k=2: dist-1 pairs are the 6 chain pairs,
    dist-2 pairs are (0,2),(2,0),(1,3),(3,1)."""
    ei = _path_graph(4)
    g = GraphData(
        num_nodes=4, edge_index=ei,
        edge_attr=np.arange(ei.shape[1], dtype=np.int32)[:, None] + 1,
    )
    out = make_multihop_edges(g, k=2)
    d = out.extras["edge_distance"]
    pairs = set(zip(out.edge_index[0].tolist(), out.edge_index[1].tolist()))
    d1 = {tuple(p) for p, dd in zip(out.edge_index.T.tolist(), d) if dd == 1}
    d2 = {tuple(p) for p, dd in zip(out.edge_index.T.tolist(), d) if dd == 2}
    assert d1 == {(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)}
    assert d2 == {(0, 2), (2, 0), (1, 3), (3, 1)}
    assert len(pairs) == out.edge_index.shape[1]  # no duplicates
    # original edge_attr rides on its distance-1 row
    for (s, r), a in zip(ei.T.tolist(), g.edge_attr):
        row = np.flatnonzero(
            (out.edge_index[0] == s) & (out.edge_index[1] == r)
        )[0]
        assert out.edge_attr[row, 0] == a[0]
        assert d[row] == 1
    # distance-2 rows carry zero edge_attr
    for s, r in [(0, 2), (1, 3)]:
        row = np.flatnonzero(
            (out.edge_index[0] == s) & (out.edge_index[1] == r)
        )[0]
        assert out.edge_attr[row, 0] == 0


def test_multihop_matches_bfs(rng):
    """Multihop distances agree with an independent per-source BFS."""
    n, ei = random_graph(rng, n=10, p=0.3)
    g = GraphData(num_nodes=n, edge_index=ei)
    k = 3
    out = make_multihop_edges(g, k)
    # reference BFS distances
    import collections

    adj = collections.defaultdict(list)
    for s, r in ei.T.tolist():
        adj[s].append(r)
    dist = np.full((n, n), 10**6)
    for s0 in range(n):
        dist[s0, s0] = 0
        q = collections.deque([s0])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if dist[s0, v] > dist[s0, u] + 1:
                    dist[s0, v] = dist[s0, u] + 1
                    q.append(v)
    got = {
        (s, r): dd
        for (s, r), dd in zip(out.edge_index.T.tolist(),
                              out.extras["edge_distance"].tolist())
    }
    want = {
        (s, r): int(dist[s, r])
        for s in range(n)
        for r in range(n)
        if 1 <= dist[s, r] <= k
    }
    assert got == want


def _ogb_style_graphs(rng, k=3):
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 2, (n, 9)).astype(np.int32),
            edge_attr=rng.integers(0, 2, (ei.shape[1], 3)).astype(np.int32),
            y=np.asarray([1.0], np.float32),
        )
        graphs.append(make_multihop_edges(g, k=3))
    return graphs


def test_gine_plus_forward(rng):
    graphs = _ogb_style_graphs(rng, 3)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    assert "edge_distance" in b.extras
    # distance-1 edge count in the batch == sum of original (deduped) edges
    d = np.asarray(b.extras["edge_distance"])
    em = np.asarray(b.edge_mask)
    n_d1 = int(((d == 1) & em).sum())
    assert n_d1 == sum(
        int((np.asarray(g.extras["edge_distance"]) == 1).sum()) for g in graphs
    )

    model = GINEPlusNetwork(
        GINEPlusConfig(hidden=16, out_dim=4, num_layers=3, k=3,
                       virtual_node=True)
    )
    v = model.init(jax.random.key(0), b)
    out, _ = model.apply(
        v, b, deterministic=True, use_running_average=False,
        mutable=["batch_stats"],
    )
    assert out.shape == (3, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gine_plus_padding_invariance(rng):
    graphs = _ogb_style_graphs(rng, 2)
    s1 = BatchSpec.from_graphs(graphs, batch_size=2)
    s2 = dataclasses_replace(s1, num_nodes=s1.num_nodes + 8,
                             num_edges=s1.num_edges + 128)
    b1 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s1))
    b2 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s2))
    model = GINEPlusNetwork(GINEPlusConfig(hidden=8, out_dim=2, num_layers=2))
    v = model.init(jax.random.key(0), b1)
    o1 = model.apply(v, b1, deterministic=True, use_running_average=True)
    o2 = model.apply(v, b2, deterministic=True, use_running_average=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def dataclasses_replace(spec, **kw):
    import dataclasses

    return dataclasses.replace(spec, **kw)
