"""TU dataset loader + stratified CV harness tests."""

import os

import numpy as np

from escgnn_tpu.data.tu import (
    add_degree_features,
    get_tu_dataset,
    load_tu_dataset,
    synthetic_tu,
)
from escgnn_tpu.models import get_model
from escgnn_tpu.train.cv import cross_validation_with_val_set, k_fold


def test_k_fold_stratified():
    labels = np.asarray([0] * 30 + [1] * 20)
    splits = k_fold(labels, 5)
    assert len(splits) == 5
    seen_test = np.zeros(50, int)
    for tr, te, va in splits:
        # partition: no overlap, all covered
        assert len(set(tr) & set(te)) == 0
        assert len(set(tr) & set(va)) == 0
        assert len(set(te) & set(va)) == 0
        assert len(tr) + len(te) + len(va) == 50
        seen_test[te] += 1
        # stratification: each fold has both classes in proportion
        assert 4 <= (labels[te] == 0).sum() <= 8
        assert 2 <= (labels[te] == 1).sum() <= 6
    assert np.all(seen_test == 1)


def test_synthetic_tu_structure():
    graphs = synthetic_tu(num_graphs=20)
    assert len(graphs) == 20
    ys = [int(g.y[0]) for g in graphs]
    assert set(ys) == {0, 1}
    assert graphs[0].x is not None  # degree one-hot


def test_tu_raw_roundtrip(tmp_path):
    # write a tiny 2-graph TU dataset and read it back
    raw = tmp_path / "TOY" / "raw"
    os.makedirs(raw)
    # graph 1: triangle (nodes 1-3); graph 2: edge (nodes 4-5)
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (4, 5), (5, 4)]
    (raw / "TOY_A.txt").write_text(
        "\n".join(f"{a}, {b}" for a, b in edges)
    )
    (raw / "TOY_graph_indicator.txt").write_text(
        "\n".join(["1"] * 3 + ["2"] * 2)
    )
    (raw / "TOY_graph_labels.txt").write_text("1\n-1\n")
    (raw / "TOY_node_labels.txt").write_text("\n".join("01010"))
    graphs = load_tu_dataset(str(tmp_path), "TOY")
    assert len(graphs) == 2
    assert graphs[0].num_nodes == 3 and graphs[0].num_edges == 6
    assert graphs[1].num_nodes == 2 and graphs[1].num_edges == 2
    assert {int(g.y[0]) for g in graphs} == {0, 1}
    # node labels one-hot: vocab 2
    assert graphs[0].x.shape == (3, 2)
    np.testing.assert_array_equal(graphs[0].x.argmax(1), [0, 1, 0])


def test_degree_features():
    graphs = synthetic_tu(num_graphs=4)
    stripped = [
        type(g)(num_nodes=g.num_nodes, edge_index=g.edge_index, y=g.y)
        for g in graphs
    ]
    out = add_degree_features(stripped)
    for g in out:
        deg = np.zeros(g.num_nodes, int)
        np.add.at(deg, g.edge_index[1], 1)
        np.testing.assert_array_equal(g.x.argmax(1), deg)


def test_cv_harness_learns():
    """2 folds x few epochs of GIN0 on the synthetic 2-class task: runs end
    to end and beats chance at the selected epoch."""
    graphs = get_tu_dataset("NONEXISTENT", root="/tmp/definitely-missing")
    res = cross_validation_with_val_set(
        graphs,
        lambda: get_model(
            "BaselineGNN", conv="gin0", hidden=32, num_layers=3, out_dim=2,
            pool="mean",
        ),
        folds=3,
        epochs=20,
        batch_size=64,
        lr=1e-2,
    )
    assert 0.0 <= res.test_acc_mean <= 1.0
    assert res.test_acc_mean > 0.55, res


def test_zinc_pickle_roundtrip(tmp_path):
    """Fabricate a tiny artifact in the reference's ZINC.pkl format
    (reference dataset_zinc.py:45-73) and check the exact conversion."""
    import pickle

    import numpy as np

    from escgnn_tpu.data.molecules import load_zinc_pickle, zinc_splits

    def mol(n, pairs, types, y):
        A = np.zeros((4, n, n), np.float64)
        for (a, b), t in zip(pairs, types):
            A[t, a, b] = 1.0
            A[t, b, a] = 1.0
        x = np.eye(28)[np.arange(n) % 28]
        return {"x": x, "A": A, "y": np.asarray([0.0, float(y)])}

    splits_raw = (
        [mol(3, [(0, 1), (1, 2)], [1, 2], 0.5)],
        [mol(2, [(0, 1)], [3], -1.0)],
        [mol(4, [(0, 1), (2, 3)], [0, 1], 2.0)],
    )
    p = tmp_path / "ZINC.pkl"
    with open(p, "wb") as f:
        pickle.dump(splits_raw, f)
    out = load_zinc_pickle(str(p))
    g = out["train"][0]
    assert g.num_nodes == 3 and g.num_edges == 4  # undirected
    # edge types follow the bond-axis argmax
    for e in range(g.num_edges):
        a, b = int(g.edge_index[0, e]), int(g.edge_index[1, e])
        want = 1 if {a, b} == {0, 1} else 2
        assert int(g.edge_attr[e]) == want
    assert float(g.y[0]) == 0.5  # y = last target
    np.testing.assert_array_equal(g.x[:, 0], [0, 1, 2])

    # zinc_splits picks up the artifact from data_dir
    sp, is_real = zinc_splits(str(tmp_path))
    assert is_real and len(sp["val"]) == 1
