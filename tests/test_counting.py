import numpy as np

from escgnn_tpu.data.counting import count_cycles_per_node
from escgnn_tpu.data.graphlets import count_graphlets_per_node


def undirected(pairs):
    e = np.asarray(pairs).T
    return np.concatenate([e, e[::-1]], axis=1)


def test_cycles_triangle_square_k4():
    tri = undirected([(0, 1), (1, 2), (2, 0)])
    assert np.array_equal(
        count_cycles_per_node(3, tri), np.tile([1, 0, 0, 0], (3, 1))
    )
    sq = undirected([(0, 1), (1, 2), (2, 3), (3, 0)])
    assert np.array_equal(
        count_cycles_per_node(4, sq), np.tile([0, 1, 0, 0], (4, 1))
    )
    a, b = np.nonzero(1 - np.eye(4))
    k4 = np.stack([a, b])
    # K4: every node lies on 3 triangles and 3 4-cycles
    assert np.array_equal(
        count_cycles_per_node(4, k4), np.tile([3, 3, 0, 0], (4, 1))
    )


def test_cycles_petersen_five_cycles():
    # C5: one 5-cycle through every node
    c5 = undirected([(i, (i + 1) % 5) for i in range(5)])
    assert np.array_equal(
        count_cycles_per_node(5, c5), np.tile([0, 0, 1, 0], (5, 1))
    )


def test_graphlets_known_shapes():
    # P4 path: one P4, zero others
    p4 = undirected([(0, 1), (1, 2), (2, 3)])
    c = count_graphlets_per_node(4, p4)
    assert np.array_equal(c, np.tile([0, 0, 0, 1, 0], (4, 1)))

    # tailed triangle: triangle 0-1-2 + tail 2-3
    tt = undirected([(0, 1), (1, 2), (2, 0), (2, 3)])
    c = count_graphlets_per_node(4, tt)
    assert np.array_equal(c[:, 0], [1, 1, 1, 1])
    assert c[:, [1, 2, 3, 4]].sum() == 0

    # diamond (chordal cycle): C4 + one chord
    dm = undirected([(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    c = count_graphlets_per_node(4, dm)
    assert np.array_equal(c[:, 1], [1, 1, 1, 1])

    # K4: one 4-clique; no induced others
    a, b = np.nonzero(1 - np.eye(4))
    c = count_graphlets_per_node(4, np.stack([a, b]))
    assert np.array_equal(c[:, 2], [1, 1, 1, 1])
    assert c[:, [0, 1, 3, 4]].sum() == 0


def test_triangle_rectangle():
    # triangle 0-1-2 sharing node 2 with chordless 4-cycle 2-3-4-5
    tr = undirected(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 2)]
    )
    c = count_graphlets_per_node(6, tr)
    assert np.array_equal(c[:, 4], [1, 1, 1, 1, 1, 1])

    # adding a chord 3-5 destroys the chordless 4-cycle -> TR count 0
    tr_chord = undirected(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 2), (3, 5)]
    )
    c = count_graphlets_per_node(6, tr_chord)
    assert c[:, 4].sum() == 0

    # an extra edge between the triangle and the far rectangle corner
    # breaks inducedness (8 edges in the 6-node subgraph)
    tr_extra = undirected(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 2), (0, 4)]
    )
    c = count_graphlets_per_node(6, tr_extra)
    assert c[:, 4].sum() == 0


def test_graphlets_vectorized_equals_oracle():
    from escgnn_tpu.data.graphlets import count_graphlets_per_node_slow

    rng = np.random.default_rng(0)
    for _ in range(12):
        n = int(rng.integers(4, 14))
        upper = np.triu(rng.random((n, n)) < 0.35, k=1)
        a, b = np.nonzero(upper)
        ei = np.stack([np.concatenate([a, b]), np.concatenate([b, a])])
        fast = count_graphlets_per_node(n, ei)
        slow = count_graphlets_per_node_slow(n, ei)
        assert np.array_equal(fast, slow)
