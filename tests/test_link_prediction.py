"""Link-prediction vertical (VERDICT r04 missing #1).

Covers the MRR/hits metrics against hand-computed rankings (reference
`GraphGPS/graphgps/head/inductive_edge.py:115-139`), the pair batching
rules, the PCQM4Mv2Contact-shaped loader, the inductive-edge GPS head +
dot-decoded loss, and the PCQM4Mv2 / WikipediaNetwork zoo additions.
"""

import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.contact import contact_splits, synthetic_contact
from escgnn_tpu.train.metrics import eval_mrr, graph_link_mrr


def test_eval_mrr_hand_computed():
    # positive scores 3.0 and 0.5; negatives per row
    pos = np.array([3.0, 0.5])
    neg = np.array([
        [1.0, 2.0, 0.0],   # pos is rank 1 -> rr 1, hits@1
        [2.0, 1.0, 0.9],   # pos ranks below 2.0/1.0/0.9 -> rank 4
    ])
    out = eval_mrr(pos, neg)
    assert out["mrr_list"] == pytest.approx([1.0, 0.25])
    assert out["hits@1_list"].tolist() == [1.0, 0.0]
    assert out["hits@3_list"].tolist() == [1.0, 0.0]
    assert out["hits@10_list"].tolist() == [1.0, 1.0]


def test_eval_mrr_tie_prefers_positive():
    # stable argsort: the positive (prepended at index 0) wins ties —
    # the same optimistic rule as the reference's torch.argsort path
    out = eval_mrr(np.array([1.0]), np.array([[1.0, 1.0]]))
    assert out["mrr_list"][0] == 1.0


def test_graph_link_mrr_hand_computed():
    # 4-node graph, one positive pair (0, 2). scores[0] = [9, 1, 5, 7]:
    # candidates for head 0 are ALL nodes except the true tail 2 ->
    # {9, 1, 7}; positive score 5 ranks below 9 and 7 -> rank 3
    scores = np.zeros((4, 4))
    scores[0] = [9.0, 1.0, 5.0, 7.0]
    st = graph_link_mrr(
        scores,
        np.array([[0], [2]]),
        np.array([1.0]),
        num_nodes=4,
    )
    assert st["mrr"] == pytest.approx(1.0 / 3.0)
    assert st["hits@1"] == 0.0
    assert st["hits@3"] == 1.0


def test_graph_link_mrr_ignores_negative_pairs_and_empty():
    scores = np.eye(3)
    # only label-1 pairs rank; a graph with no positives returns {}
    assert graph_link_mrr(
        scores, np.array([[0], [1]]), np.array([0.0]), 3
    ) == {}


def test_synthetic_contact_shapes_and_rule():
    gs = synthetic_contact(num_graphs=5, seed=0, contact_distance=5,
                           num_neg_per_pos=2)
    for g in gs:
        pi = g.extras["pair_index"]
        lab = g.extras["pair_label"]
        assert pi.shape[0] == 2 and pi.shape[1] == lab.shape[0]
        pos = pi[:, lab == 1]
        # every positive is a backbone pair at offset exactly 5
        assert np.all(np.abs(pos[0] - pos[1]) == 5)
        # 2 negatives per positive, tails differ from the true tail
        n_pos = pos.shape[1]
        assert lab.sum() == n_pos
        assert (lab == 0).sum() == 2 * n_pos
        neg = pi[:, lab == 0]
        true_tails = np.repeat(pos[1], 2)
        assert np.all(neg[1] != true_tails)
        assert pi.max() < g.num_nodes


def test_contact_splits_num_atoms_is_size_ordered():
    splits, is_real = contact_splits(
        "/nonexistent", split="num-atoms", num_graphs=40, seed=0
    )
    assert not is_real
    max_train = max(g.num_nodes for g in splits["train"])
    min_test = min(g.num_nodes for g in splits["test"])
    assert max_train <= min_test


def test_contact_splits_real_branch(tmp_path):
    from escgnn_tpu.featurize.cache import save_graphs

    gs = synthetic_contact(num_graphs=6, seed=1)
    raw = tmp_path / "pcqm4mv2contact" / "raw"
    raw.mkdir(parents=True)
    save_graphs(str(raw / "train.npz"), gs[:4])
    save_graphs(str(raw / "val.npz"), gs[4:5])
    save_graphs(str(raw / "test.npz"), gs[5:])
    splits, is_real = contact_splits(str(tmp_path))
    assert is_real
    assert [len(splits[s]) for s in ("train", "val", "test")] == [4, 1, 1]
    g0, r0 = gs[0], splits["train"][0]
    np.testing.assert_array_equal(
        g0.extras["pair_index"], r0.extras["pair_index"]
    )
    np.testing.assert_array_equal(
        g0.extras["pair_label"], r0.extras["pair_label"]
    )


def test_pair_batching_offsets_and_masks():
    gs = synthetic_contact(num_graphs=3, seed=0)
    spec = BatchSpec.from_graphs(gs, batch_size=2)
    assert spec.num_pairs > 0
    b = pad_and_batch(gs[:2], spec)
    pi = b.extras["pair_index"]
    lab = b.extras["pair_label"]
    pg = b.extras["pair_graph"]
    pm = b.extras["pair_mask"]
    p0 = gs[0].extras["pair_index"].shape[1]
    p1 = gs[1].extras["pair_index"].shape[1]
    assert pm.sum() == p0 + p1
    # graph 0's pairs keep local ids, graph 1's shift by graph 0's nodes
    np.testing.assert_array_equal(
        pi[:, :p0], gs[0].extras["pair_index"]
    )
    np.testing.assert_array_equal(
        pi[:, p0:p0 + p1],
        gs[1].extras["pair_index"] + gs[0].num_nodes,
    )
    np.testing.assert_array_equal(pg[:p0], 0)
    np.testing.assert_array_equal(pg[p0:p0 + p1], 1)
    np.testing.assert_array_equal(
        lab[:p0], gs[0].extras["pair_label"]
    )
    # padding pairs park on the padding node and are masked out
    assert np.all(pi[:, p0 + p1:] == spec.num_nodes - 1)
    assert not pm[p0 + p1:].any()


def test_link_head_and_loss_train_step():
    import jax
    import jax.numpy as jnp

    from escgnn_tpu.models.gps import GPSConfig, GPSModel
    from escgnn_tpu.train.metrics import link_pair_loss

    from escgnn_tpu.featurize.spd import attach_attn_bias

    gs = [attach_attn_bias(g) for g in synthetic_contact(num_graphs=4,
                                                         seed=0)]
    spec = BatchSpec.from_graphs(gs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(gs[:2], spec))
    model = GPSModel(GPSConfig(
        dim_h=16, num_layers=1, num_heads=2, head="inductive_edge",
        use_esc=False, use_attn_bias=False,
        node_encoder_kind="ogb_atom", edge_encoder_kind="ogb_bond",
    ))
    variables = model.init(jax.random.key(0), b)

    @jax.jit
    def loss(params):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            b, deterministic=True, use_running_average=True,
        )
        assert out.shape == (b.node_mask.shape[0], 16)
        return link_pair_loss(out, b)

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    gnorm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_wikipedia_hetero_real_parser(tmp_path):
    from escgnn_tpu.data.hetero import get_hetero_graph

    raw = tmp_path / "chameleon" / "raw"
    raw.mkdir(parents=True)
    # geom-gcn sparse schema: features are one-hot INDICES
    (raw / "out1_node_feature_label.txt").write_text(
        "node_id\tfeature\tlabel\n"
        "0\t5,17\t1\n"
        "1\t2300\t0\n"
        "2\t3\t4\n"
    )
    (raw / "out1_graph_edges.txt").write_text(
        "src\tdst\n0\t1\n1\t2\n"
    )
    g, is_real = get_hetero_graph("chameleon", root=str(tmp_path))
    assert is_real
    assert g.x.shape == (3, 2325)  # SPARSE_FEAT_DIMS["chameleon"]
    assert g.x[0, 5] == 1.0 and g.x[1, 2300] == 1.0
    assert g.num_nodes == 3 and g.edge_index.shape[1] == 4


def test_wikipedia_hetero_synthetic_fallback():
    from escgnn_tpu.data.hetero import get_hetero_graph

    g, is_real = get_hetero_graph("squirrel", root="/nonexistent")
    assert not is_real
    assert g.num_nodes > 0 and g.y is not None


def test_pcqm4mv2_splits_modes():
    from escgnn_tpu.data.molecules import pcqm4mv2_splits

    full, r1 = pcqm4mv2_splits("/nonexistent", "full", num_graphs=100)
    sub, r2 = pcqm4mv2_splits("/nonexistent", "subset", num_graphs=100)
    inf, _ = pcqm4mv2_splits("/nonexistent", "inference", num_graphs=100)
    assert not r1 and not r2
    assert len(sub["train"]) == len(full["train"]) // 10
    assert len(sub["test"]) == len(full["test"])
    assert all(np.isnan(g.y).all() for g in inf["test"])
    assert all(np.isfinite(g.y).all() for g in inf["train"])
    # the synthetic HOMO-LUMO-like target is structural and nonconstant
    ys = np.array([float(g.y[0]) for g in full["train"]])
    assert ys.std() > 0


def test_sbm_pattern_cluster_shapes():
    from escgnn_tpu.data.sbm import sbm_splits

    for name, n_cls in (("pattern", 2), ("cluster", 6)):
        splits = sbm_splits(name, num_graphs=12, seed=0)
        assert [len(splits[s]) for s in ("train", "val", "test")] == \
            [9, 1, 2]
        g = splits["train"][0]
        y = np.asarray(g.y).reshape(-1)
        assert y.shape[0] == g.num_nodes
        assert set(np.unique(y)) <= set(range(n_cls))
        if name == "cluster":
            # exactly one revealed seed per community
            x = np.asarray(g.x).reshape(-1)
            for c in range(6):
                assert (x == c + 1).sum() == 1


def test_synthetic_ogbl_protocol():
    from escgnn_tpu.data.contact import synthetic_ogbl

    splits = synthetic_ogbl(num_nodes=200, seed=0)
    g_tr = splits["train"][0]
    # all three splits share the SAME message-passing graph (train
    # positives only)
    for s in ("val", "test"):
        np.testing.assert_array_equal(
            g_tr.edge_index, splits[s][0].edge_index
        )
    # train positives == message-passing edges
    pos = g_tr.extras["pair_index"][:, g_tr.extras["pair_label"] == 1]
    kp = set(map(tuple, pos.T.tolist()))
    ke = set(map(tuple, np.asarray(g_tr.edge_index).T.tolist()))
    assert kp == ke
    # val/test positives are NOT in the propagation graph
    for s in ("val", "test"):
        gx = splits[s][0]
        p = gx.extras["pair_index"][:, gx.extras["pair_label"] == 1]
        assert not (set(map(tuple, p.T.tolist())) & ke)


def test_ogbl_splits_real_branch(tmp_path):
    from escgnn_tpu.data.contact import ogbl_splits, synthetic_ogbl
    from escgnn_tpu.featurize.cache import save_graphs

    syn = synthetic_ogbl(num_nodes=100, seed=3)
    raw = tmp_path / "ogbl_collab" / "raw"
    raw.mkdir(parents=True)
    for s in ("train", "val", "test"):
        save_graphs(str(raw / f"{s}.npz"), syn[s])
    splits, is_real = ogbl_splits(str(tmp_path), "ogbl-collab")
    assert is_real
    np.testing.assert_array_equal(
        splits["test"][0].extras["pair_index"],
        syn["test"][0].extras["pair_index"],
    )
