"""GPS dataset-zoo breadth: superpixels (classification) and peptides
(multilabel / multi-target regression) — the GNNBenchmark and LRGB rows
of the reference's `GraphGPS/graphgps/loader/master_loader.py` zoo —
plus the task-aware loss/metric plumbing in run_gps."""

import numpy as np
import pytest

from escgnn_tpu.config import load_cfg
from escgnn_tpu.data.peptides import (
    NUM_FUNC_TASKS,
    NUM_STRUCT_TASKS,
    synthetic_peptides,
)
from escgnn_tpu.data.superpixels import synthetic_superpixels


def test_superpixels_shapes_and_determinism():
    a = synthetic_superpixels("MNIST", num_graphs=20, seed=3)
    b = synthetic_superpixels("MNIST", num_graphs=20, seed=3)
    assert len(a) == 20
    for g, g2 in zip(a, b):
        assert g.x.shape == (g.num_nodes, 3)  # intensity + 2-D centroid
        assert g.edge_attr.shape == (g.num_edges, 1)
        assert 0 <= int(g.y[0]) < 10
        np.testing.assert_array_equal(g.x, g2.x)
        np.testing.assert_array_equal(g.edge_index, g2.edge_index)
    # labels cycle through all 10 classes
    assert len({int(g.y[0]) for g in a}) == 10
    # symmetric kNN edges
    g = a[0]
    fwd = set(map(tuple, g.edge_index.T))
    assert all((b_, a_) in fwd for a_, b_ in fwd)
    c = synthetic_superpixels("CIFAR10", num_graphs=4, seed=0)
    assert c[0].x.shape == (c[0].num_nodes, 5)  # rgb + centroid


def test_peptides_long_range_and_labels():
    func = synthetic_peptides("func", num_graphs=30, seed=1)
    for g in func:
        assert g.y.shape == (NUM_FUNC_TASKS,)
        assert set(np.unique(g.y)) <= {0.0, 1.0}
        assert g.x.shape == (g.num_nodes, 1)
        assert g.edge_attr.shape == (g.num_edges, 1)
    struct = synthetic_peptides("struct", num_graphs=30, seed=1)
    diam = [g.y[3] for g in struct]  # y[3] = BFS eccentricity of node 0
    assert np.mean(diam) > 10  # the long-range regime LRGB targets
    assert all(g.y.shape == (NUM_STRUCT_TASKS,) for g in struct)


def _tiny_cfg(tmp_path, name, task, out_dim, node_enc, edge_enc,
              epochs="2"):
    return load_cfg(None, [
        "dataset.name", name,
        "dataset.task", task,
        "dataset.num_graphs", "20",
        "dataset.dir", str(tmp_path),
        "dataset.node_encoder", node_enc,
        "dataset.edge_encoder", edge_enc,
        "dataset.esc.h", "2",
        "model.dim_h", "16",
        "model.num_layers", "1",
        "model.num_heads", "2",
        "model.pool", "mean",
        "model.out_dim", str(out_dim),
        "train.batch_size", "4",
        "train.epochs", epochs,
        "train.ckpt_period", "100",
        "out_dir", str(tmp_path / "out"),
    ])


def test_gps_classification_end_to_end(tmp_path):
    import run_gps

    cfg = _tiny_cfg(tmp_path, "mnist", "classification", 10,
                    "linear", "linear")
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_acc"] <= 1.0
    assert 0.0 <= res["best_test_acc"] <= 1.0


def test_gps_multilabel_end_to_end(tmp_path):
    import run_gps

    cfg = _tiny_cfg(tmp_path, "peptides-func", "multilabel",
                    NUM_FUNC_TASKS, "embed", "embed")
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_ap"] <= 1.0
    assert 0.0 <= res["best_test_ap"] <= 1.0


def test_peptides_struct_per_column_standardization(tmp_path):
    import run_gps

    cfg = _tiny_cfg(tmp_path, "peptides-struct", "regression",
                    NUM_STRUCT_TASKS, "embed", "embed")
    splits, mean, std = run_gps.build_dataset(cfg, seed=0)
    assert std > 0
    ys = np.stack([g.y for s in ("train", "val") for g in splits[s]])
    assert ys.shape[1] == NUM_STRUCT_TASKS
    np.testing.assert_allclose(ys.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(ys.std(axis=0, ddof=1), 1.0, atol=1e-4)


def test_malnet_shapes_and_classes():
    from escgnn_tpu.data.malnet import synthetic_malnet

    graphs = synthetic_malnet(num_graphs=15, seed=2, min_nodes=30,
                              max_nodes=50)
    assert len({int(g.y[0]) for g in graphs}) == 5
    for g in graphs:
        assert g.x.shape == (g.num_nodes, 1)  # log-degree feature
        assert g.edge_attr is None
        assert g.edge_index.max() < g.num_nodes
    # deterministic
    again = synthetic_malnet(num_graphs=15, seed=2, min_nodes=30,
                             max_nodes=50)
    np.testing.assert_array_equal(graphs[3].edge_index,
                                  again[3].edge_index)


def test_gps_malnet_forward(tmp_path):
    # the malnet zoo entry: featureless call graphs, linear encoder on
    # log-degree, no edge features, 5-class head
    import jax
    import jax.numpy as jnp
    import run_gps
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.models.gps import GPSModel

    cfg = _tiny_cfg(tmp_path, "malnet-tiny", "classification", 5,
                    "linear", "none")
    cfg.dataset.attn_bias = False
    cfg.model.use_attn_bias = False
    cfg.model.global_model = "linear"  # Performer, as malnet-GPS.yaml
    cfg.dataset.esc.use_rd = False
    splits, _, _ = run_gps.build_dataset(cfg, seed=0)
    graphs = [g for s in splits.values() for g in s]
    spec = BatchSpec.from_graphs(graphs, batch_size=4)
    b = jax.tree.map(jnp.asarray, pad_and_batch(splits["train"][:4], spec))
    model = GPSModel(run_gps._gps_config(cfg, splits))
    out = model.apply(model.init(jax.random.key(0), b), b)
    assert out.shape == (b.y.shape[0], 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gps_ogb_molhiv_end_to_end(tmp_path):
    # OGB row of the zoo: ogb_atom/ogb_bond per-column embedding sums +
    # ROC-AUC metric (cfg.metric = auc), ESC hop from config
    import run_gps

    cfg = _tiny_cfg(tmp_path, "ogbg-molhiv", "multilabel", 1,
                    "ogb_atom", "ogb_bond")
    cfg.metric = "auc"
    # ROC-AUC is undefined on a single-class split (reported as NaN with
    # a warning since the ADVICE r1 fix) — 20 graphs leave a 2-graph val
    # split, so use enough graphs for both classes to land in val/test
    cfg.dataset.num_graphs = 60
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_auc"] <= 1.0
    assert 0.0 <= res["best_test_auc"] <= 1.0


def test_bce_graph_loss_nan_holes():
    # molpcba-style unlabeled entries: NaN labels drop out of the loss
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.data.molecules import synthetic_ogb_mol
    from escgnn_tpu.train.loop import bce_graph_loss

    graphs = synthetic_ogb_mol(num_graphs=4, seed=0, num_tasks=6,
                               nan_frac=0.5)
    assert any(np.isnan(g.y).any() for g in graphs)
    spec = BatchSpec.from_graphs(graphs, batch_size=4)
    b = pad_and_batch(graphs, spec)
    y = np.asarray(b.y)
    b = b.replace(y=jnp.asarray(y))
    logits = jnp.zeros((y.shape[0], 6))
    # flipping logits at NaN-labeled entries must not change the loss
    flip = jnp.asarray(np.where(np.isnan(y), 1e3, 0.0))
    l1 = float(bce_graph_loss(logits, b))
    l2 = float(bce_graph_loss(logits + flip, b))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    np.testing.assert_allclose(l1, np.log(2.0), rtol=1e-5)
    assert np.isfinite(l1)


def test_bce_graph_loss_masks_padding():
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.train.loop import bce_graph_loss

    graphs = synthetic_peptides("func", num_graphs=3, seed=0)
    spec = BatchSpec.from_graphs(graphs, batch_size=4)  # 1 padding graph
    b = pad_and_batch(graphs, spec)
    b = b.replace(y=jnp.asarray(b.y))
    logits_real = jnp.zeros((b.y.shape[0], NUM_FUNC_TASKS))
    # garbage on the padded graph slot must not change the loss
    logits_junk = logits_real.at[-1].set(1e3)
    l1 = bce_graph_loss(logits_real, b)
    l2 = bce_graph_loss(logits_junk, b)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(float(l1), np.log(2.0), rtol=1e-5)


def test_gps_aqsol_end_to_end(tmp_path):
    import run_gps

    cfg = _tiny_cfg(tmp_path, "aqsol", "regression", 1, "embed", "embed")
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert np.isfinite(res["best_val_mae"])


def test_gps_voc_node_classification_end_to_end(tmp_path):
    import run_gps

    cfg = _tiny_cfg(tmp_path, "vocsuperpixels", "node_classification", 21,
                    "linear", "linear")
    cfg.model.graph_pred = False
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_f1"] <= 1.0
    assert 0.0 <= res["best_test_f1"] <= 1.0


def test_gps_ppa_end_to_end(tmp_path):
    import run_gps

    cfg = _tiny_cfg(tmp_path, "ogbg-ppa", "classification", 37,
                    "ppa_uniform", "linear")
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_acc"] <= 1.0


def test_gps_code2_sequence_end_to_end(tmp_path):
    import run_gps
    from escgnn_tpu.data.code2 import MAX_SEQ_LEN, NUM_VOCAB

    cfg = _tiny_cfg(tmp_path, "ogbg-code2", "sequence",
                    MAX_SEQ_LEN * (NUM_VOCAB + 2), "ast", "embed")
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_f1"] <= 1.0


def test_subtoken_f1_golden():
    from escgnn_tpu.data.code2 import eos_id, subtoken_f1

    E = eos_id()
    # exact match, partial overlap, empty-vs-empty, disjoint
    pred = np.asarray([[1, 2, E, E, E], [1, 3, E, E, E],
                       [E, E, E, E, E], [5, E, E, E, E]])
    true = np.asarray([[1, 2, E, E, E], [1, 2, E, E, E],
                       [E, E, E, E, E], [7, E, E, E, E]])
    got = subtoken_f1(pred, true)
    np.testing.assert_allclose(got, (1.0 + 0.5 + 1.0 + 0.0) / 4)


def test_gps_pretrained_finetune(tmp_path):
    """pretrained.dir: restore body params from a prior run's checkpoint,
    re-init the head, freeze the body — frozen params must not move,
    head params must (reference config/pretrained_config.py)."""
    import jax
    import run_gps

    cfg = _tiny_cfg(tmp_path, "zinc-synthetic", "regression", 1,
                    "embed", "embed")
    cfg.train.ckpt_best = True
    run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "pre"))
    ckpt_dir = str(tmp_path / "pre" / "ckpt_s0")

    cfg2 = _tiny_cfg(tmp_path, "zinc-synthetic", "regression", 1,
                     "embed", "embed")
    cfg2.pretrained.dir = ckpt_dir
    cfg2.pretrained.freeze_main = True

    # capture the state run_one builds by monkeypatching one epoch
    res = run_gps.run_one(cfg2, seed=1, out_dir=str(tmp_path / "fine"))
    assert np.isfinite(res["best_val_mae"])

    # direct check of the freeze machinery: one step must keep the body
    import jax.numpy as jnp
    import optax

    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        get_learning_rate,
        set_learning_rate,
    )

    params = {"body": jnp.ones(3), "head2": jnp.ones(2)}
    freeze = {k: k != "head2" for k in params}
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), freeze), adam_with_plateau(0.1)
    )
    s = TrainState.create(params, {}, tx)
    # lr helpers reach through the chain
    assert get_learning_rate(s) == pytest.approx(0.1)
    s = set_learning_rate(s, 0.05)
    assert get_learning_rate(s) == pytest.approx(0.05)
    grads = {"body": jnp.full(3, 2.0), "head2": jnp.full(2, 2.0)}
    updates, _ = s.tx.update(grads, s.opt_state, s.params)
    new = optax.apply_updates(s.params, updates)
    np.testing.assert_array_equal(np.asarray(new["body"]), 1.0)
    assert np.all(np.asarray(new["head2"]) != 1.0)


# --- generic-PyG rows (reference master_loader.py:132-186,595-606) ---

def _node_cls_cfg(tmp_path, name, out_dim):
    return load_cfg(None, [
        "dataset.name", name,
        "dataset.task", "node_classification",
        "dataset.dir", str(tmp_path),
        "dataset.node_encoder", "linear",
        "dataset.edge_encoder", "none",
        "dataset.esc.enable", "false",
        "dataset.attn_bias", "true",
        "model.dim_h", "16",
        "model.num_layers", "1",
        "model.num_heads", "2",
        "model.graph_pred", "false",
        "model.use_esc", "false",
        "model.use_attn_bias", "true",
        "model.out_dim", str(out_dim),
        "train.batch_size", "1",
        "train.epochs", "2",
        "train.ckpt_period", "100",
        "out_dir", str(tmp_path / "out"),
    ])


def test_gps_planetoid_node_classification(tmp_path):
    """Planetoid inside the GPS stack: single citation graph, split-mask
    protocol (labels -1 outside the split are ignored by loss + F1)."""
    import run_gps

    cfg = _node_cls_cfg(tmp_path, "planetoid-cora", 6)
    splits, _, _ = run_gps.build_dataset(cfg, seed=0)
    # three copies of the SAME graph, disjoint labeled node sets
    ys = {s: np.asarray(splits[s][0].y).reshape(-1) for s in splits}
    assert all(len(splits[s]) == 1 for s in splits)
    labeled = {s: set(np.flatnonzero(y >= 0)) for s, y in ys.items()}
    assert labeled["train"] & labeled["val"] == set()
    assert labeled["train"] & labeled["test"] == set()
    assert sum(len(v) for v in labeled.values()) == len(ys["train"])
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_f1"] <= 1.0
    assert 0.0 <= res["best_test_f1"] <= 1.0


def test_gps_webkb_and_actor(tmp_path):
    import run_gps

    for name in ("webkb-texas", "actor"):
        cfg = _node_cls_cfg(tmp_path, name, 5)
        res = run_gps.run_one(
            cfg, seed=0, out_dir=str(tmp_path / f"out_{name}")
        )
        assert 0.0 <= res["best_val_f1"] <= 1.0


def test_hetero_raw_parser(tmp_path):
    """The PyG WebKB/Actor raw text schema parses: dense 0/1 features
    (WebKB) and sparse one-hot indices (Actor)."""
    import os

    from escgnn_tpu.data.hetero import ACTOR_FEAT_DIM, load_hetero_raw

    raw = tmp_path / "texas" / "raw"
    raw.mkdir(parents=True)
    (raw / "out1_node_feature_label.txt").write_text(
        "node_id\tfeature\tlabel\n"
        "0\t1,0,1\t0\n1\t0,1,0\t1\n2\t1,1,1\t0\n"
    )
    (raw / "out1_graph_edges.txt").write_text(
        "src\tdst\n0\t1\n1\t2\n1\t1\n"
    )
    g = load_hetero_raw(str(tmp_path), "texas")
    assert g.num_nodes == 3 and g.x.shape == (3, 3)
    np.testing.assert_array_equal(g.y.reshape(-1), [0, 1, 0])
    # symmetrized, self-loop dropped, coalesced
    np.testing.assert_array_equal(
        g.edge_index, [[0, 1, 1, 2], [1, 0, 2, 1]]
    )

    raw2 = tmp_path / "actor" / "raw"
    raw2.mkdir(parents=True)
    (raw2 / "out1_node_feature_label.txt").write_text(
        "node_id\tfeature\tlabel\n0\t0,5,931\t2\n1\t3\t1\n"
    )
    (raw2 / "out1_graph_edges.txt").write_text("src\tdst\n0\t1\n")
    g = load_hetero_raw(str(tmp_path), "actor")
    assert g.x.shape == (2, ACTOR_FEAT_DIM)
    assert g.x[0, 0] == 1.0 and g.x[0, 5] == 1.0 and g.x[0, 931] == 1.0
    assert g.x.sum() == 4.0


def test_gps_tu_graph_classification(tmp_path):
    """TUDataset row inside GPS (IMDB/COLLAB-style: degree/constant
    features via the data/tu.py fallback)."""
    import run_gps

    cfg = load_cfg(None, [
        "dataset.name", "tu-IMDB-BINARY",
        "dataset.task", "classification",
        "dataset.dir", str(tmp_path),
        "dataset.node_encoder", "linear",
        "dataset.edge_encoder", "none",
        "dataset.esc.enable", "false",
        "dataset.attn_bias", "true",
        "model.dim_h", "16",
        "model.num_layers", "1",
        "model.num_heads", "2",
        "model.use_esc", "false",
        "model.use_attn_bias", "true",
        "model.pool", "mean",
        "model.out_dim", "2",
        "train.batch_size", "4",
        "train.epochs", "2",
        "train.ckpt_period", "100",
        "out_dir", str(tmp_path / "out"),
    ])
    res = run_gps.run_one(cfg, seed=0, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["best_val_acc"] <= 1.0
