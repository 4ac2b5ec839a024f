"""negate_edge_index — recreates the reference's unit test
(`GraphGPS/unittests/test_negate_edge_index.py`) without networkx/PyG:
complement checked against a dense-adjacency oracle."""

import numpy as np

from escgnn_tpu.utils.graph import negate_edge_index
from tests.conftest import random_graph


def test_simple_path():
    # path 0 <-> 1 <-> 2 <-> 3 (the reference's hand case)
    ei = np.asarray([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    want = np.asarray([[0, 0, 1, 2, 3, 3], [2, 3, 3, 0, 0, 1]])
    np.testing.assert_array_equal(negate_edge_index(ei), want)


def _oracle(ei, n):
    adj = np.zeros((n, n), bool)
    adj[ei[0], ei[1]] = True
    np.fill_diagonal(adj, True)
    a, b = np.nonzero(~adj)
    return np.stack([a, b])


def test_random_graphs_match_dense_oracle(rng):
    for _ in range(10):
        n, ei = random_graph(rng, max_n=20)
        np.testing.assert_array_equal(
            negate_edge_index(ei), _oracle(ei, n)
        )


def test_batched_complement(rng):
    # two graphs, nodes contiguous: complements stay within each graph
    n1, e1 = random_graph(rng, n=5, p=0.5)
    n2, e2 = random_graph(rng, n=4, p=0.5)
    ei = np.concatenate([e1, e2 + n1], axis=1)
    batch = np.asarray([0] * n1 + [1] * n2)
    got = negate_edge_index(ei, batch)
    w1 = _oracle(e1, n1)
    w2 = _oracle(e2, n2) + n1
    np.testing.assert_array_equal(got, np.concatenate([w1, w2], axis=1))
