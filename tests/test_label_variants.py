import numpy as np

from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.featurize.rw import attach_return_prob
from tests.conftest import random_graph


def path_graph(n):
    a = np.arange(n - 1)
    return np.stack(
        [np.concatenate([a, a + 1]), np.concatenate([a + 1, a])]
    ).astype(np.int32)


def test_spd_labels_path_vs_cycle():
    # path 0-1-2-3: unique shortest paths -> z2 == 0 everywhere
    g = GraphData(num_nodes=4, edge_index=path_graph(4))
    big = create_node_subgraphs(g, NodeSubgraphConfig(h=2, node_label="spd"))
    z = big.extras["z"]
    assert z.shape[1] == 2
    assert np.all(z[:, 1] == 0)
    # root label is [1, 0]
    seg = big.extras["node_to_subgraph"]
    firsts = np.searchsorted(seg, np.arange(4))
    assert np.all(z[firsts, 0] == 1)

    # 4-cycle: the opposite node is reached via two paths -> z2 == z1
    c = np.array([[0, 1, 1, 2, 2, 3, 3, 0], [1, 0, 2, 1, 3, 2, 0, 3]])
    g = GraphData(num_nodes=4, edge_index=c)
    big = create_node_subgraphs(g, NodeSubgraphConfig(h=2, node_label="spd"))
    z = big.extras["z"]
    # each copy: root [1,0], two neighbors [2,0], opposite [3,3]
    two_enc = z[z[:, 1] > 0]
    assert len(two_enc) == 4  # one opposite node per copy
    assert np.all(two_enc[:, 0] == 3) and np.all(two_enc[:, 1] == 3)


def test_drnl_labels():
    c = np.array([[0, 1, 1, 2, 2, 3, 3, 0], [1, 0, 2, 1, 3, 2, 0, 3]])
    g = GraphData(num_nodes=4, edge_index=c)
    big = create_node_subgraphs(g, NodeSubgraphConfig(h=2, node_label="drnl"))
    z = big.extras["z"][:, 0]
    # drnl of the opposite node: 3 * (h+1) + 3 = 12
    assert (z == 12).sum() == 4
    assert (z == 1).sum() == 4  # roots


def test_return_prob_properties(rng):
    n, ei = random_graph(rng, n=8, p=0.5)
    g = GraphData(num_nodes=n, edge_index=ei)
    g = attach_return_prob(g, steps=10)
    rp = g.extras["rp"]
    assert rp.shape == (n, 10)
    # probabilities in [0, 1]
    assert rp.min() >= -1e-6 and rp.max() <= 1 + 1e-6
    # one-step return prob of the lazy walk = 1/deg_with_selfloop
    A = np.zeros((n, n))
    np.add.at(A, (ei[0], ei[1]), 1.0)
    deg = A.sum(1) + 1
    np.testing.assert_allclose(rp[:, 0], 1.0 / deg, rtol=1e-5)
