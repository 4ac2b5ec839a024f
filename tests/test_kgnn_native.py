"""Golden tests of the native k-set graph featurizer against a slow
Python mirror of the reference semantics."""

from itertools import combinations

import numpy as np
import pytest

from tests.conftest import random_graph

kgnn = pytest.importorskip("escgnn_tpu.native.kgnn")


def py_two_sets(n, adj, connected):
    sets = []
    for u in range(n):
        for v in range(u + 1, n):
            if not connected or adj[u, v]:
                sets.append((u, v))
    return sets


def py_three_connected_sets(n, adj):
    """Insertion order: u asc, v in sorted N(u), w in sorted N(v), w != u,
    dedup by sorted key — matching the reference's iteration."""
    seen = {}
    order = []
    nbrs = [sorted(np.flatnonzero(adj[i])) for i in range(n)]
    for u in range(n):
        for v in nbrs[u]:
            for w in nbrs[v]:
                if w == u:
                    continue
                key = tuple(sorted((u, v, w)))
                if key not in seen:
                    seen[key] = len(seen)
                    order.append(key)
    return order


def make(rng):
    n, ei = random_graph(rng, n=8, p=0.5)
    adj = np.zeros((n, n), bool)
    adj[ei[0], ei[1]] = True
    labels = rng.integers(0, 3, n)
    return n, ei, adj, labels


def test_two_connected_sets_and_iso(rng):
    n, ei, adj, labels = make(rng)
    res = kgnn.kgnn_set_graph(ei, labels, 3, n, k=2, connected=True)
    expect = py_two_sets(n, adj, True)
    assert res.iso_type.shape[0] == len(expect)
    # assignment lists each set's nodes with its id (sorted-key order)
    by_id = {}
    for node, sid in res.assignment.T:
        by_id.setdefault(int(sid), []).append(int(node))
    got = [tuple(sorted(by_id[i])) for i in range(len(by_id))]
    assert sorted(got) == sorted(expect)
    # iso types: sorted labels packed base num_labels
    for (u, v), sid in zip(expect, range(len(expect))):
        a, b = sorted((labels[u], labels[v]))
        # ids are insertion order == lexicographic for connected 2-sets
        assert res.iso_type[sid] == a * 3 + b


def test_two_unconnected_iso_adjacency_bit(rng):
    n, ei, adj, labels = make(rng)
    res = kgnn.kgnn_set_graph(ei, labels, 3, n, k=2, connected=False)
    sets = py_two_sets(n, adj, False)
    assert len(res.iso_type) == len(sets)
    for i, (u, v) in enumerate(sets):
        a, b = sorted((labels[u], labels[v]))
        expect = 9 * int(adj[u, v]) + a * 3 + b
        assert res.iso_type[i] == expect


def test_three_connected_count_matches(rng):
    n, ei, adj, labels = make(rng)
    res = kgnn.kgnn_set_graph(ei, labels, 3, n, k=3, connected=True)
    assert len(res.iso_type) == len(py_three_connected_sets(n, adj))


def test_local_edges_share_k_minus_1(rng):
    n, ei, adj, labels = make(rng)
    res = kgnn.kgnn_set_graph(ei, labels, 3, n, k=2, connected=True,
                              malkin=False)
    by_id = {}
    for node, sid in res.assignment.T:
        by_id.setdefault(int(sid), set()).add(int(node))
    for a, b in res.edge_index.T:
        sa, sb = by_id[int(a)], by_id[int(b)]
        assert len(sa & sb) == 1  # 2-sets connected in set-graph share 1 node
    # symmetric + no self loops
    e = set(map(tuple, res.edge_index.T.tolist()))
    assert all((b, a) in e for a, b in e)
    assert all(a != b for a, b in e)


def test_malkin_subset_of_local(rng):
    n, ei, adj, labels = make(rng)
    loc = kgnn.kgnn_set_graph(ei, labels, 3, n, k=3, connected=True,
                              malkin=False)
    mal = kgnn.kgnn_set_graph(ei, labels, 3, n, k=3, connected=True,
                              malkin=True)
    le = set(map(tuple, loc.edge_index.T.tolist()))
    me = set(map(tuple, mal.edge_index.T.tolist()))
    assert me <= le


def test_assignment_2to3(rng):
    n, ei, adj, labels = make(rng)
    a23 = kgnn.kgnn_assignment_2to3(ei, n)
    n3 = len(py_three_connected_sets(n, adj))
    assert a23.shape == (2, 3 * n3)
    # every 3-set contributes exactly its three 2-subsets
    n2 = n * (n - 1) // 2
    assert a23[0].max() < n2
