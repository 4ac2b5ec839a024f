"""Planetoid citation-dataset reader (escgnn_tpu/data/planetoid.py).

Covers the raw-format loader (round-trip against files we synthesize in
the standard `ind.<name>.*` layout, reference `kernel/datasets.py:68-69`
Planetoid dispatch) and the synthetic fallback.
"""

import os
import pickle

import numpy as np
import pytest

import scipy.sparse as sp

from escgnn_tpu.data.planetoid import (
    PLANETOID_NAMES,
    get_planetoid,
    load_planetoid_raw,
    synthetic_planetoid,
)


def _write_raw(root: str, name: str):
    """Tiny hand-built Planetoid raw set: 8 nodes, 3 classes.

    Layout: allx covers nodes 0..5 (train+unlabeled), tx covers the test
    range 6..7 but listed OUT of order in test.index (7 before 6) to
    exercise the permutation fix-up.
    """
    low = name.lower()
    raw = os.path.join(root, name, "raw")
    os.makedirs(raw, exist_ok=True)
    d = 5
    rng = np.random.default_rng(0)
    full_x = (rng.random((8, d)) < 0.4).astype(np.float32)
    labels = np.array([0, 1, 2, 0, 1, 2, 0, 1])
    onehot = np.eye(3, dtype=np.float32)[labels]
    test_idx = np.array([7, 6])

    parts = {
        "x": sp.csr_matrix(full_x[:3]),
        "y": onehot[:3],
        "allx": sp.csr_matrix(full_x[:6]),
        "ally": onehot[:6],
        "tx": sp.csr_matrix(full_x[test_idx]),
        "ty": onehot[test_idx],
        "graph": {0: [1, 2], 1: [0], 2: [0, 7], 3: [4], 4: [3],
                  5: [6], 6: [5], 7: [2, 7]},  # 7->7 self loop dropped
    }
    for suffix, obj in parts.items():
        with open(os.path.join(raw, f"ind.{low}.{suffix}"), "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(os.path.join(raw, f"ind.{low}.test.index"), test_idx,
               fmt="%d")
    return full_x, labels


def test_raw_roundtrip(tmp_path):
    full_x, labels = _write_raw(str(tmp_path), "Cora")
    g = load_planetoid_raw(str(tmp_path), "Cora")
    assert g.num_nodes == 8
    # test rows (6, 7) must land at their test.index positions
    np.testing.assert_allclose(np.asarray(g.x), full_x)
    np.testing.assert_array_equal(np.asarray(g.y).ravel(), labels)
    ei = np.asarray(g.edge_index)
    pairs = set(map(tuple, ei.T.tolist()))
    # undirected closure of the graph dict, self loop dropped, coalesced
    expect = {(0, 1), (1, 0), (0, 2), (2, 0), (2, 7), (7, 2),
              (3, 4), (4, 3), (5, 6), (6, 5)}
    assert pairs == expect
    assert ei.shape[1] == len(expect)


def test_get_planetoid_prefers_raw(tmp_path):
    _write_raw(str(tmp_path), "Citeseer")
    g = get_planetoid("Citeseer", root=str(tmp_path))
    assert g.num_nodes == 8  # raw, not the 600-node synthetic


def test_synthetic_fallback_deterministic(tmp_path):
    g1 = get_planetoid("Cora", root=str(tmp_path / "missing"))
    g2 = synthetic_planetoid("Cora")
    assert g1.num_nodes == g2.num_nodes == 600
    np.testing.assert_array_equal(np.asarray(g1.edge_index),
                                  np.asarray(g2.edge_index))
    np.testing.assert_allclose(np.asarray(g1.x), np.asarray(g2.x))
    # symmetric edge set, no self loops
    ei = np.asarray(g1.edge_index)
    assert (ei[0] != ei[1]).all()
    pairs = set(map(tuple, ei.T.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


@pytest.mark.parametrize("name", PLANETOID_NAMES)
def test_names_give_distinct_graphs(name, tmp_path):
    g = get_planetoid(name, root=str(tmp_path))
    assert g.x is not None and g.y is not None
    assert np.asarray(g.y).min() >= 0


def test_pre_transform_applied(tmp_path):
    calls = []

    def pre(g):
        calls.append(g.num_nodes)
        return g

    get_planetoid("PubMed", root=str(tmp_path), pre_transform=pre)
    assert calls == [600]
