"""Real-format ingestion: the parsing branches that consume the actual
dataset artifacts (ZINC DGL-schema pickle, QM9 gdb9.sdf, OGB raw csv
directory) executed against committed mini-fixtures with hand-computed
expected tensors. tools/make_fixtures.py regenerates the fixtures.

Reference formats: dataset_zinc.py:45-73 (wrap2data), qm9.py:200-275
(SDF featurization), dataset_pyg.py:14-120 (PygGraphPropPredDataset's
raw layout).
"""

import os

import numpy as np

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


# ---------------------------------------------------------------- ZINC

def test_zinc_pickle_parses_fixture():
    from escgnn_tpu.data.molecules import load_zinc_pickle

    splits = load_zinc_pickle(os.path.join(FIX, "zinc_mini", "ZINC.pkl"))
    assert [len(splits[s]) for s in ("train", "val", "test")] == [3, 1, 1]

    # graph 0: path 0-1-2, bond types 1 then 2; y keeps the LAST target
    g = splits["train"][0]
    assert g.num_nodes == 3
    np.testing.assert_array_equal(
        g.edge_index, [[0, 1, 1, 2], [1, 0, 2, 1]]
    )
    np.testing.assert_array_equal(g.edge_attr, [1, 1, 2, 2])
    np.testing.assert_array_equal(g.x[:, 0], [0, 1, 2])  # argmax of one-hots
    np.testing.assert_allclose(g.y, [2.5])

    # triangle: 6 directed single-bond edges
    g = splits["train"][1]
    assert g.edge_index.shape == (2, 6)
    np.testing.assert_array_equal(g.edge_attr, [1] * 6)

    # star: heterogeneous bond types follow the (row, col) edge order
    g = splits["train"][2]
    np.testing.assert_array_equal(
        g.edge_index, [[0, 0, 0, 1, 2, 3], [1, 2, 3, 0, 0, 0]]
    )
    np.testing.assert_array_equal(g.edge_attr, [1, 2, 3, 1, 2, 3])
    np.testing.assert_allclose(g.y, [4.0])


def test_zinc_splits_picks_up_real_artifact():
    from escgnn_tpu.data.molecules import zinc_splits

    splits, is_real = zinc_splits(os.path.join(FIX, "zinc_mini"))
    assert is_real
    assert len(splits["train"]) == 3


def test_zinc_fixture_runs_through_featurizer():
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.data.molecules import load_zinc_pickle
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    splits = load_zinc_pickle(os.path.join(FIX, "zinc_mini", "ZINC.pkl"))
    graphs = featurize_many(
        splits["train"], EscConfig(h=2, use_rd=True, self_loop=True),
        num_workers=0,
    )
    b = pad_and_batch(graphs, BatchSpec.from_graphs(graphs, batch_size=3))
    assert b.enc_idx is not None
    assert int(np.sum(b.node_mask)) == sum(g.num_nodes for g in graphs)


# ----------------------------------------------------------------- QM9

def test_qm9_sdf_parses_fixture():
    from escgnn_tpu.data.qm9 import load_qm9_sdf

    root = os.path.join(FIX, "qm9_root", "qm9", "raw")
    graphs = load_qm9_sdf(
        os.path.join(root, "gdb9.sdf"), os.path.join(root, "gdb9.sdf.csv")
    )
    assert len(graphs) == 6  # no skip list passed

    # methane: C(+4H); x = [onehot(5) || atomic, acc, don, arom,
    # sp, sp2, sp3, num_hs]
    g = graphs[0]
    assert g.num_nodes == 5
    np.testing.assert_array_equal(g.extras["node_type"], [1, 0, 0, 0, 0])
    np.testing.assert_allclose(g.x[0, :5], [0, 1, 0, 0, 0])  # C one-hot
    assert g.x[0, 5] == 6.0 and g.x[1, 5] == 1.0  # atomic numbers
    assert g.x[0, 12] == 4.0  # C has 4 explicit H neighbors
    assert g.x[1, 12] == 0.0
    np.testing.assert_allclose(g.pos[1], [0.0, 0.0, 1.09], atol=1e-4)
    # 4 bonds -> 8 directed edges, all single (type one-hot col 0)
    assert g.edge_index.shape == (2, 8)
    np.testing.assert_allclose(g.edge_attr[:, 0], np.ones(8))
    # coalesced ordering: lexsorted by (row, col)
    order = np.lexsort((g.edge_index[1], g.edge_index[0]))
    np.testing.assert_array_equal(order, np.arange(8))
    # y: csv columns 1..19 were 1..19; PyG order moves A,B,C (=1,2,3)
    # to the end
    np.testing.assert_allclose(
        g.y, np.asarray(list(range(4, 20)) + [1, 2, 3], np.float32)
    )

    # methane C is sp3, H atoms carry no hybridization flags
    np.testing.assert_allclose(g.x[:, 9], 0)  # sp
    np.testing.assert_allclose(g.x[:, 10], 0)  # sp2
    np.testing.assert_allclose(g.x[:, 11], [1, 0, 0, 0, 0])  # sp3

    # CO2: two double bonds; cumulated C -> sp, terminal O -> sp2
    g = graphs[1]
    assert g.num_nodes == 3
    np.testing.assert_array_equal(g.extras["node_type"], [3, 1, 3])
    np.testing.assert_allclose(g.edge_attr[:, 1], np.ones(4))  # double
    np.testing.assert_allclose(g.y[-3:], [0.5, 1.0, 1.5])
    np.testing.assert_allclose(g.x[:, 9], [0, 1, 0])  # sp
    np.testing.assert_allclose(g.x[:, 10], [1, 0, 1])  # sp2


def test_qm9_aromaticity_and_hybridization():
    """The kekulized-SDF chemistry (VERDICT r03 #8 / ADVICE r03):
    ring-topology aromaticity + bond-order hybridization, hand values."""
    from escgnn_tpu.data.qm9 import load_qm9_sdf

    root = os.path.join(FIX, "qm9_root", "qm9", "raw")
    graphs = load_qm9_sdf(
        os.path.join(root, "gdb9.sdf"), os.path.join(root, "gdb9.sdf.csv")
    )

    # benzene (kekulized 1/2 alternating ring): 6 C aromatic + sp2,
    # all 12 directed ring edges re-typed to the AROMATIC class, the
    # 12 C-H edges stay single
    benz = graphs[2]
    assert benz.num_nodes == 12
    np.testing.assert_allclose(benz.x[:6, 8], 1)  # aromatic
    np.testing.assert_allclose(benz.x[6:, 8], 0)
    np.testing.assert_allclose(benz.x[:6, 10], 1)  # sp2
    np.testing.assert_allclose(benz.x[:, 9], 0)  # no sp
    assert benz.edge_attr[:, 3].sum() == 12  # aromatic class edges
    assert benz.edge_attr[:, 0].sum() == 12  # C-H singles
    # no kekulé single/double classes survive on the ring
    assert benz.edge_attr[:, 1].sum() == 0

    # propyne HC#C-CH3: triple-bond carbons sp, methyl carbon sp3
    prop = graphs[3]
    np.testing.assert_allclose(prop.x[:3, 9], [1, 1, 0])
    np.testing.assert_allclose(prop.x[:3, 11], [0, 0, 1])
    assert prop.edge_attr[:, 2].sum() == 2  # one triple bond, 2 dirs

    # furan (kekulized 5-ring, O lone-pair donor): all 5 ring atoms
    # aromatic + sp2, 10 directed aromatic ring edges
    fur = graphs[4]
    np.testing.assert_allclose(fur.x[:5, 8], 1)
    np.testing.assert_allclose(fur.x[:5, 10], 1)
    assert fur.edge_attr[:, 3].sum() == 10


def test_qm9_uncharacterized_skip_list():
    from escgnn_tpu.data.qm9 import load_qm9_sdf, load_uncharacterized

    root = os.path.join(FIX, "qm9_root", "qm9", "raw")
    skip = load_uncharacterized(os.path.join(root, "uncharacterized.txt"))
    assert skip == {5}
    graphs = load_qm9_sdf(
        os.path.join(root, "gdb9.sdf"), os.path.join(root, "gdb9.sdf.csv"),
        skip_path=os.path.join(root, "uncharacterized.txt"),
    )
    assert len(graphs) == 5
    # gdb_6 (ammonia) excluded: no graph has its y row
    for g in graphs:
        assert not np.allclose(g.y[-3:], [0.4, 0.8, 1.2])


def test_qm9_splits_real_branch_and_featurizer():
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.data.qm9 import append_distance_edge_attr, qm9_splits
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    graphs, is_real = qm9_splits(os.path.join(FIX, "qm9_root"))
    assert is_real and len(graphs) == 5  # skip list drops gdb_6
    feats = featurize_many(
        graphs, EscConfig(h=2, use_rd=True, self_loop=True), num_workers=0
    )
    feats = [append_distance_edge_attr(g) for g in feats]
    b = pad_and_batch(
        feats, BatchSpec.from_graphs(feats, batch_size=len(feats))
    )
    # distance column appended; self-loop distances are 0
    assert b.edge_attr.shape[-1] == 5
    assert np.all(np.isfinite(b.edge_attr))


# ----------------------------------------------------------------- OGB

def test_ogb_raw_dir_parses_fixture():
    from escgnn_tpu.data.molecules import load_ogb_graph_dir

    splits = load_ogb_graph_dir(
        os.path.join(FIX, "ogb_root", "ogbg_mini")
    )
    assert [len(splits[s]) for s in ("train", "val", "test")] == [1, 1, 1]

    g0 = splits["train"][0]  # 2 nodes, one undirected edge
    assert g0.num_nodes == 2
    np.testing.assert_array_equal(g0.edge_index, [[0, 1], [1, 0]])
    assert g0.x.shape == (2, 9) and g0.x.dtype == np.int32
    np.testing.assert_array_equal(g0.x[:, 0], [5, 5])
    assert g0.edge_attr.shape == (2, 3)
    np.testing.assert_array_equal(g0.edge_attr[:, 0], [0, 1])
    np.testing.assert_allclose(g0.y, [0.0])

    g1 = splits["val"][0]  # triangle
    assert g1.num_nodes == 3 and g1.edge_index.shape == (2, 6)
    np.testing.assert_allclose(g1.y, [1.0])
    np.testing.assert_array_equal(g1.x[:, 0], [6, 6, 6])


def test_ogb_mol_splits_real_branch_and_featurizer():
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.data.molecules import ogb_mol_splits
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    splits, is_real = ogb_mol_splits(
        os.path.join(FIX, "ogb_root"), "ogbg-mini"
    )
    assert is_real
    graphs = featurize_many(
        [g for s in splits.values() for g in s],
        EscConfig(h=2, use_rd=True, self_loop=True), num_workers=0,
    )
    b = pad_and_batch(graphs, BatchSpec.from_graphs(graphs, batch_size=3))
    assert b.enc_idx is not None

    # synthetic fallback still works when the dir is absent
    _, is_real2 = ogb_mol_splits(FIX, "ogbg-molhiv", num_graphs=8)
    assert not is_real2


def test_fixtures_are_reproducible(tmp_path):
    """tools/make_fixtures.py writes byte-identical artifacts."""
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = tmp_path / "repo"
    (work / "tools").mkdir(parents=True)
    shutil.copy(
        os.path.join(repo, "tools", "make_fixtures.py"),
        work / "tools" / "make_fixtures.py",
    )
    (work / "tests").mkdir()
    out = subprocess.run(
        [sys.executable, str(work / "tools" / "make_fixtures.py")],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    for rel in (
        "zinc_mini/ZINC.pkl",
        "qm9_root/qm9/raw/gdb9.sdf",
        "ogb_root/ogbg_mini/raw/edge.csv.gz",
        "ogb_root/ogbg_mini/split/scaffold/train.csv.gz",
    ):
        a = open(os.path.join(FIX, rel), "rb").read()
        b = open(work / "tests" / "fixtures" / rel, "rb").read()
        assert a == b, f"fixture {rel} not reproducible"
