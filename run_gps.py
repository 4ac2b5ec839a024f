#!/usr/bin/env python
"""GPS config-driven driver — the GraphGPS-subsystem entry point.

Capability mirror of reference `GraphGPS/main.py`: load a YAML config
(+ dotted overrides), dump the resolved config, loop over `num_runs`
seeds, build the dataset with the ESC pre-transform + SPD attn_bias
(`graphgps/loader/master_loader.py:29-33,380-397`), train a GPSModel with
periodic/best checkpointing and auto-resume
(`graphgps/train/custom_train.py:96-188`), and aggregate metrics across
runs (`main.py:309` agg_runs).

Usage:
  python run_gps.py --cfg configs/gps/zinc-GPS.yaml optim.base_lr 0.002
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

from escgnn_tpu.utils import setup_jax

setup_jax()  # persistent XLA compile cache
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.config import agg_runs, dump_cfg, load_cfg
from escgnn_tpu.data.batching import BatchSpec, batch_iterator
from escgnn_tpu.data.molecules import synthetic_zinc, zinc_splits
from escgnn_tpu.data.prefetch import stack_split, stacked_batch_pools
from escgnn_tpu.featurize.cache import cached_featurize
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.posenc import (
    attach_degree,
    attach_lap_pe,
    attach_rwse,
)
from escgnn_tpu.featurize.spd import attach_attn_bias
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.gps import GPSConfig, GPSModel
from escgnn_tpu.train.checkpoint import (
    CheckpointManager,
    restore_train_state,
)
from escgnn_tpu.train.loop import (
    PlateauScheduler,
    TrainState,
    adam_with_plateau,
    bce_graph_loss,
    ce_graph_loss,
    get_learning_rate,
    l1_graph_loss,
    l1_node_loss,
    make_eval_step,
    set_learning_rate,
    make_pool_eval_step,
    make_pool_logits_step,
    make_pool_refresh_step,
    make_pool_train_step,
)


def _even_splits(raw):
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    return {
        "train": raw[:n_tr],
        "val": raw[n_tr:n_tr + n_val],
        "test": raw[n_tr + n_val:],
    }


def build_dataset(cfg, seed: int):
    """Dataset zoo dispatch (the reference master_loader's role,
    `graphgps/loader/master_loader.py:29-33,380-397`): ZINC (real
    artifact when present), synthetic ZINC/QM9, and the counting
    benchmarks — each with the ESC pre-transform + requested posencs."""
    d = cfg.dataset
    ecfg = EscConfig(
        h=d.esc.h, use_rd=d.esc.use_rd, self_loop=d.esc.self_loop,
        max_nodes_per_hop=d.esc.max_nodes_per_hop or None,
    )
    if d.name == "zinc":
        raw_splits, is_real = zinc_splits(
            d.dir, num_graphs=d.num_graphs, seed=seed
        )
        print(f"zinc: real={is_real}")
    elif d.name == "zinc-synthetic":
        raw_splits = _even_splits(
            synthetic_zinc(num_graphs=d.num_graphs, seed=seed)
        )
    elif d.name in ("count_cycle", "count_graphlet"):
        from escgnn_tpu.data.counting import (
            CountingDatasetConfig,
            generate_counting_graphs,
        )

        raw_splits = generate_counting_graphs(CountingDatasetConfig(
            num_graphs=d.num_graphs, seed=seed,
            task="graphlet" if d.name == "count_graphlet" else "cycle",
        ))
    elif d.name == "qm9-synthetic":
        from escgnn_tpu.data.qm9 import synthetic_qm9

        raw_splits = _even_splits(
            synthetic_qm9(num_graphs=d.num_graphs, seed=seed)
        )
    elif d.name in ("mnist", "cifar10"):
        from escgnn_tpu.data.superpixels import superpixel_splits

        raw_splits, is_real = superpixel_splits(
            d.dir, d.name, num_graphs=d.num_graphs, seed=seed
        )
        print(f"{d.name}: real={is_real}")
    elif d.name in ("ogbg-molhiv", "ogbg-molpcba"):
        # the reference wires the ESC pre-transform into OGB GPS runs at
        # master_loader.py:380-397 (hop=4 for molhiv); graphs here come
        # from the OGB-shaped generator (9-col atom / 3-col bond
        # categorical features; molpcba-style NaN label holes)
        from escgnn_tpu.data.molecules import synthetic_ogb_mol

        raw_splits = _even_splits(synthetic_ogb_mol(
            num_graphs=d.num_graphs, seed=seed,
            num_tasks=cfg.model.out_dim,
            nan_frac=0.25 if d.name == "ogbg-molpcba" else 0.0,
        ))
    elif d.name == "aqsol":
        from escgnn_tpu.data.molecules import aqsol_splits

        raw_splits, is_real = aqsol_splits(
            d.dir, num_graphs=d.num_graphs, seed=seed
        )
        print(f"aqsol: real={is_real}")
    elif d.name in ("vocsuperpixels", "cocosuperpixels"):
        # LRGB node-classification rows (21/81 classes; reference
        # loader/dataset/{voc,coco}_superpixels.py)
        from escgnn_tpu.data.superpixels import voc_coco_splits

        raw_splits, is_real = voc_coco_splits(
            d.dir, d.name, num_graphs=d.num_graphs, seed=seed
        )
        print(f"{d.name}: real={is_real}")
    elif d.name == "ogbg-ppa":
        # species classification, featureless nodes + 7-dim float edges
        # (reference run_ogb_mol.py:352, encoder/ppa_encoder.py)
        from escgnn_tpu.data.molecules import ppa_splits

        raw_splits, is_real = ppa_splits(
            d.dir, num_graphs=d.num_graphs, seed=seed
        )
    elif d.name == "ogbg-code2":
        # AST sub-token sequence prediction (reference
        # master_loader.py:411-434 + encoder/ast_encoder.py)
        from escgnn_tpu.data.code2 import code2_splits

        raw_splits, is_real = code2_splits(
            d.dir, num_graphs=d.num_graphs, seed=seed
        )
    elif d.name == "malnet-tiny":
        from escgnn_tpu.data.malnet import malnet_splits

        raw_splits, is_real = malnet_splits(
            d.dir, num_graphs=d.num_graphs, seed=seed
        )
        print(f"malnet-tiny: real={is_real}")
    elif d.name in ("peptides-func", "peptides-struct"):
        from escgnn_tpu.data.peptides import peptide_splits

        raw_splits, is_real = peptide_splits(
            d.dir, d.name.split("-")[1],
            num_graphs=d.num_graphs, seed=seed,
        )
        print(f"{d.name}: real={is_real}")
    elif d.name.startswith("planetoid-"):
        # Planetoid citation graphs inside the GPS stack (reference
        # master_loader.py:176-177); single-graph node classification
        # with the split-mask protocol (labels -1 outside the split)
        from escgnn_tpu.data.hetero import node_split_copies
        from escgnn_tpu.data.planetoid import get_planetoid

        name = d.name.split("-", 1)[1].capitalize()
        if name == "Pubmed":
            name = "PubMed"
        g = get_planetoid(name, root=os.path.join(d.dir, "Planetoid"))
        raw_splits = node_split_copies(g, seed=seed)
    elif d.name.startswith("webkb-") or d.name == "actor":
        # WebKB (Cornell/Texas/Wisconsin) and Actor heterophilous rows
        # (reference master_loader.py:132-134,182-183)
        from escgnn_tpu.data.hetero import (
            get_hetero_graph,
            node_split_copies,
        )

        hname = d.name.split("-", 1)[1] if "-" in d.name else d.name
        g, is_real = get_hetero_graph(
            hname, root=os.path.join(d.dir, "hetero")
        )
        print(f"{d.name}: real={is_real}")
        raw_splits = node_split_copies(g, seed=seed)
    elif d.name in ("pattern", "cluster"):
        # GNNBenchmark SBM node classification (reference
        # master_loader.py:331-343 GNNBenchmarkDataset PATTERN/CLUSTER)
        from escgnn_tpu.data.sbm import sbm_splits

        raw_splits = sbm_splits(
            d.name, num_graphs=d.num_graphs, seed=seed
        )
    elif d.name.startswith("ogbl-"):
        # transductive link prediction on one graph with per-split
        # labeled edge sets (reference master_loader.py:224-235)
        from escgnn_tpu.data.contact import ogbl_splits

        raw_splits, is_real = ogbl_splits(
            d.dir, d.name, num_nodes=max(d.num_graphs, 100), seed=seed
        )
        print(f"{d.name}: real={is_real}")
    elif d.name.startswith("pcqm4mv2contact"):
        # inductive link prediction (molecular contact maps; reference
        # master_loader.py:236-237,527-557) — graphs carry labeled
        # pair_index/pair_label extras, task must be "link"
        from escgnn_tpu.data.contact import contact_splits

        split = d.name.split("-", 1)[1] if "-" in d.name else "shuffle"
        raw_splits, is_real = contact_splits(
            d.dir, split=split, num_graphs=d.num_graphs, seed=seed
        )
        print(f"{d.name}: real={is_real}")
    elif d.name.startswith("pcqm4mv2-"):
        # graph-level PCQM4Mv2 (OGB-LSC HOMO-LUMO gap regression;
        # reference master_loader.py:216-218,441-525). subset/full
        # differ in split sizing; 'inference' mimics the unlabeled
        # test-dev/test-challenge splits with NaN labels
        from escgnn_tpu.data.molecules import pcqm4mv2_splits

        raw_splits, is_real = pcqm4mv2_splits(
            d.dir, d.name.split("-", 1)[1],
            num_graphs=d.num_graphs, seed=seed,
        )
        print(f"{d.name}: real={is_real}")
    elif d.name.startswith("wikipedia-"):
        # WikipediaNetwork chameleon/squirrel heterophilous rows
        # (reference master_loader.py:185-190) — same geom-gcn raw
        # schema as WebKB, parsed by data/hetero.py
        from escgnn_tpu.data.hetero import (
            get_hetero_graph,
            node_split_copies,
        )

        g, is_real = get_hetero_graph(
            d.name.split("-", 1)[1], root=os.path.join(d.dir, "hetero")
        )
        print(f"{d.name}: real={is_real}")
        raw_splits = node_split_copies(g, seed=seed)
    elif d.name.startswith("tu-"):
        # TUDataset graph classification inside GPS (reference
        # preformat_TUDataset, master_loader.py:179-180,595-606 —
        # IMDB-*/COLLAB get constant features, covered by the degree
        # fallback of data/tu.py)
        from escgnn_tpu.data.tu import get_tu_dataset

        graphs = get_tu_dataset(d.name[3:], root=os.path.join(d.dir, "TU"))
        raw_splits = _even_splits(graphs)
    else:
        raise ValueError(f"unknown dataset {d.name!r}")
    splits = {}
    for name, graphs in raw_splits.items():
        def make(graphs=graphs):
            out = featurize_many(graphs, ecfg, num_workers=0) \
                if d.esc.enable else list(graphs)
            if d.attn_bias:
                out = [attach_attn_bias(g) for g in out]
            m = cfg.model
            if m.use_lap_pe or m.use_signnet or m.use_equivstable_pe:
                out = [attach_lap_pe(g, k=cfg.posenc.lap_pe_k) for g in out]
            if m.use_rwse:
                out = [attach_rwse(g, k=cfg.posenc.rwse_k) for g in out]
            if m.use_degree:
                out = [attach_degree(g) for g in out]
            return out

        m = cfg.model
        key = (
            f"gps_{d.name}_{name}_n{d.num_graphs}_s{seed}_{ecfg.cache_key()}"
            f"_bias{int(d.attn_bias)}_pe"
            f"{int(m.use_lap_pe or m.use_signnet or m.use_equivstable_pe)}"
            f"{int(m.use_rwse)}{int(m.use_degree)}"
        )
        splits[name] = cached_featurize(
            os.path.join(d.dir, "gps_" + d.name), key, make
        )
    if d.name in ("count_cycle", "count_graphlet"):
        # node-level targets: select the column + standardize by the
        # TRAIN split (same protocol as run_graphcount)
        from escgnn_tpu.data.counting import normalize_targets

        splits, mean, std = normalize_targets(splits, d.target)
        return splits, mean, std
    if d.task in ("classification", "multilabel", "node_classification",
                  "sequence", "link"):
        # class labels / binary labels / token ids / link labels are
        # never standardized
        return splits, 0.0, 1.0
    if d.name == "qm9-synthetic":
        width = len(splits["train"][0].y)
        if not 0 <= d.target < width:
            raise ValueError(
                f"dataset.target {d.target} out of range for qm9 y "
                f"width {width}"
            )
        for s in splits.values():
            for g in s:
                g.y = g.y[d.target:d.target + 1]
    ys = np.stack(
        [np.asarray(g.y).reshape(-1)
         for s in ("train", "val") for g in splits[s]]
    )
    if ys.shape[1] > 1:
        # multi-target regression (peptides-struct): per-column
        # standardization, and the reported metric is the MAE on the
        # STANDARDIZED targets (scale 1.0) — LRGB's peptides-structural
        # targets are pre-standardized and its MAE is reported on them
        # directly; multiplying the mean normalized MAE by the mean
        # column std would only equal the averaged denormalized MAE when
        # all column stds coincide (mean(sd)*mean(MAE) != mean(sd*MAE))
        mu, sd = ys.mean(axis=0), ys.std(axis=0, ddof=1).clip(1e-8)
        for s in splits.values():
            for g in s:
                g.y = ((np.asarray(g.y).reshape(-1) - mu) / sd).astype(
                    np.float32
                )
        return splits, float(mu.mean()), 1.0
    # nan-aware: pcqm4mv2-inference carries unlabeled (NaN-y) splits
    # (reference master_loader.py:502-525); labeled rows set the scale
    mean, std = float(np.nanmean(ys)), float(np.nanstd(ys, ddof=1))
    for s in splits.values():
        for g in s:
            g.y = ((g.y - mean) / std).astype(np.float32)
    return splits, mean, std


def _avg_deg_log(graphs) -> float:
    """E[log(1 + deg)] over the training graphs — the PNA scaler
    normalizer the reference derives from a degree histogram
    (run_ogb_mol.py:377-387)."""
    import numpy as np

    logs = []
    for g in graphs:
        deg = np.bincount(
            np.asarray(g.edge_index[1]), minlength=g.num_nodes
        )[: g.num_nodes]
        logs.append(np.log1p(deg))
    v = float(np.mean(np.concatenate(logs))) if logs else 1.0
    return max(v, 1e-3)


def _gps_config(cfg, splits) -> GPSConfig:
    m = cfg.model
    kw = {}
    for k in ("pna_towers", "avg_deg_log", "bigbird_window",
              "bigbird_global", "bigbird_random"):
        if hasattr(m, k):
            kw[k] = getattr(m, k)
    if kw.get("avg_deg_log", 0.0) == 0.0:
        # 0 = sentinel: derive E[log(1+deg)] from the train split
        if m.local_model == "pna":
            kw["avg_deg_log"] = _avg_deg_log(splits["train"])
        else:
            kw.pop("avg_deg_log", None)
    return GPSConfig(
        dim_h=m.dim_h, num_layers=m.num_layers, num_heads=m.num_heads,
        dropout=m.dropout, attn_dropout=m.attn_dropout,
        local_model=m.local_model, global_model=m.global_model,
        san_gamma=m.san_gamma,
        performer_features=m.performer_features,
        use_equivstable_pe=m.use_equivstable_pe,
        use_esc=m.use_esc, use_attn_bias=m.use_attn_bias,
        use_lap_pe=m.use_lap_pe, use_signnet=m.use_signnet,
        use_rwse=m.use_rwse,
        use_degree=m.use_degree, pool=m.pool, out_dim=m.out_dim,
        graph_pred=m.graph_pred,
        node_vocab=m.node_vocab, edge_vocab=m.edge_vocab,
        node_encoder_kind=cfg.dataset.node_encoder,
        edge_encoder_kind=cfg.dataset.edge_encoder,
        head="inductive_edge" if cfg.dataset.task == "link" else "default",
        **kw,
    )


def run_one(cfg, seed: int, out_dir: str) -> dict:
    splits, mean, std = build_dataset(cfg, seed)
    all_graphs = [g for s in splits.values() for g in s]
    spec = BatchSpec.from_graphs(all_graphs, batch_size=cfg.train.batch_size)

    model = GPSModel(_gps_config(cfg, splits))
    rng = jax.random.key(seed)
    init_b = jax.tree.map(
        jnp.asarray, next(batch_iterator(splits["train"][:2], spec))
    )
    variables = model.init(rng, init_b)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = adam_with_plateau(cfg.optim.base_lr)
    if cfg.pretrained.dir:
        # finetune from a pretrained checkpoint (reference
        # config/pretrained_config.py): restore body params, optionally
        # keep the freshly-initialized prediction head, optionally
        # freeze everything but the head
        import optax

        pre = CheckpointManager(cfg.pretrained.dir)
        assert pre.latest_step() is not None, (
            f"pretrained.dir {cfg.pretrained.dir!r} has no checkpoint"
        )
        # checkpoints hold the FULL TrainState (run_one saves state);
        # restore against a same-structure template, keep params + BN
        # stats, discard the old optimizer state
        restored = restore_train_state(
            pre, TrainState.create(params, batch_stats, tx)
        )
        restored = {
            "params": restored.params, "batch_stats": restored.batch_stats
        }
        loaded = dict(restored["params"])
        head_keys = ("head1", "head2")
        if cfg.pretrained.reset_prediction_head:
            for k in head_keys:
                loaded[k] = params[k]
        params = loaded
        batch_stats = restored["batch_stats"]
        print(f"[seed {seed}] loaded pretrained params from "
              f"{cfg.pretrained.dir} (reset_head="
              f"{cfg.pretrained.reset_prediction_head})")
        if cfg.pretrained.freeze_main:
            # zero the gradients of every non-head subtree BEFORE adam:
            # frozen params then receive exactly-zero updates (adam of a
            # zero gradient is zero), and the plateau scheduler still
            # reaches the inject_hyperparams state through the chain
            freeze_mask = {k: (k not in head_keys) for k in params}
            tx = optax.chain(
                optax.masked(optax.set_to_zero(), freeze_mask), tx
            )
    state = TrainState.create(params, batch_stats, tx)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
    )
    print(f"[seed {seed}] params: {n_params / 1e6:.2f}M")

    sched = PlateauScheduler(
        factor=cfg.optim.lr_decay_factor, patience=cfg.optim.patience,
        min_lr=cfg.optim.min_lr,
    )
    ckpt = CheckpointManager(os.path.join(out_dir, f"ckpt_s{seed}"))

    start_epoch = 1
    if cfg.train.auto_resume and ckpt.latest_step() is not None:
        state = restore_train_state(ckpt, state)
        start_epoch = int(state.step) // max(
            1, len(splits["train"]) // cfg.train.batch_size
        ) + 1
        print(f"[seed {seed}] auto-resumed at epoch {start_epoch}")

    np_rng = np.random.default_rng(seed)
    # stacked device-resident pool: one train dispatch per epoch, one
    # eval/refresh dispatch per pass (tunnel ~25 ms/dispatch; see the
    # regression drivers). Single membership pool; batch ORDER still
    # reshuffles every epoch via the scan's index vector.
    [train_stack], n_train_batches, _ = stacked_batch_pools(
        splits["train"], spec, k=1, seed=seed
    )
    val_stack = stack_split(splits["val"], spec)
    test_stack = stack_split(splits["test"], spec)
    refresh_stack = stack_split(
        splits["train"][: 8 * cfg.train.batch_size], spec
    )
    node_level = not cfg.model.graph_pred
    task = cfg.dataset.task
    if task == "classification":
        loss_fn = ce_graph_loss
    elif task == "multilabel":
        loss_fn = bce_graph_loss
    elif task == "node_classification":
        from escgnn_tpu.train.loop import ce_node_loss

        loss_fn = ce_node_loss
    elif task == "link":
        from escgnn_tpu.train.metrics import link_pair_loss

        loss_fn = link_pair_loss
    elif task == "sequence":
        from escgnn_tpu.data.code2 import MAX_SEQ_LEN, NUM_VOCAB
        from escgnn_tpu.train.loop import make_sequence_ce_loss

        seq_vocab = NUM_VOCAB + 2  # + EOS + UNK
        assert cfg.model.out_dim == MAX_SEQ_LEN * seq_vocab, (
            f"sequence task needs model.out_dim = "
            f"{MAX_SEQ_LEN * seq_vocab} (L * vocab)"
        )
        loss_fn = make_sequence_ce_loss(MAX_SEQ_LEN, seq_vocab)
    else:
        loss_fn = l1_node_loss if node_level else l1_graph_loss
    pool_train_step = make_pool_train_step(model, loss_fn)
    eval_pool = make_pool_eval_step(model, node_level=node_level)
    logits_pool = make_pool_logits_step(model)
    if task == "node_classification":
        # node-level logits/labels/mask in one dispatch (the graph-level
        # make_pool_logits_step returns graph_mask)
        @jax.jit
        def node_logits_pool(params, batch_stats, stacked):
            def body(_, batch):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, deterministic=True, use_running_average=True,
                )
                return None, (out, batch.y, batch.node_mask)

            _, outs = jax.lax.scan(body, None, stacked)
            return outs
    refresh_pool = make_pool_refresh_step(model)
    # classification: accuracy; multilabel: macro AP (the LRGB
    # peptides-func / molpcba metric) or ROC-AUC when cfg.metric == auc
    # (molhiv); node_classification: macro-F1 (the LRGB VOC/COCO
    # metric); sequence: sub-token F1 (OGB code2) — all higher-is-better
    higher_better = task in ("classification", "multilabel",
                             "node_classification", "sequence", "link")
    use_auc = task == "multilabel" and cfg.metric == "auc"
    metric_name = {
        "classification": "acc",
        "multilabel": "AUC" if use_auc else "AP",
        "node_classification": "F1",
        "sequence": "F1",
        "link": "MRR",
    }.get(task, "MAE")

    link_stats_by_split = {}
    if task == "link":
        # full-ranking eval (reference compute_mrr,
        # head/inductive_edge.py:62-113): one scan dispatch returns
        # per-graph dense X @ X^T score matrices; the ranking itself is
        # host-side numpy over the raw graphs' positive pairs
        M = spec.max_nodes_per_graph

        @jax.jit
        def link_scores_pool(params, batch_stats, stacked):
            def body(_, batch):
                emb = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, deterministic=True, use_running_average=True,
                )
                G = batch.graph_mask.shape[0]
                dense = jnp.zeros((G, M, emb.shape[-1]), emb.dtype)
                dense = dense.at[batch.node_graph, batch.node_local].set(
                    jnp.where(batch.node_mask[:, None], emb, 0.0)
                )
                return None, jnp.einsum("gmd,gnd->gmn", dense, dense)

            _, s = jax.lax.scan(body, None, stacked)
            return s

        def link_eval(stacked, graphs, split_name):
            from escgnn_tpu.train.metrics import graph_link_mrr

            scores = np.asarray(link_scores_pool(
                state.params, state.batch_stats, stacked
            ))
            NGs = spec.num_graphs
            agg: dict = {}
            for j, g in enumerate(graphs):
                st = graph_link_mrr(
                    scores[j // NGs, j % NGs],
                    np.asarray(g.extras["pair_index"]),
                    np.asarray(g.extras["pair_label"]),
                    g.num_nodes,
                )
                for k, v in st.items():
                    agg.setdefault(k, []).append(v)
            stats = {k: float(np.mean(v)) for k, v in agg.items()}
            link_stats_by_split[split_name] = stats
            return stats.get("mrr", 0.0)

    def evaluate_stack(stacked, graphs=None, split_name=None):
        if task == "link":
            return link_eval(stacked, graphs, split_name)
        if task == "regression":
            e, c = eval_pool(state.params, state.batch_stats, stacked)
            return float(e) / max(float(c), 1.0)
        if task == "node_classification":
            outs, ys, masks = jax.tree.map(
                np.asarray,
                node_logits_pool(state.params, state.batch_stats, stacked),
            )
            # labels < 0 are outside the node split (single-graph
            # Planetoid/WebKB/Actor protocol) and drop out of the score
            m = masks.reshape(-1).astype(bool) & (ys.reshape(-1) >= 0)
            pred = outs.reshape(-1, outs.shape[-1])[m].argmax(-1)
            y = ys.reshape(-1)[m].astype(np.int64)
            from sklearn.metrics import f1_score

            return float(f1_score(y, pred, average="macro"))
        outs, ys, masks = jax.tree.map(
            np.asarray,
            logits_pool(state.params, state.batch_stats, stacked),
        )
        m = masks.reshape(-1).astype(bool)
        out = outs.reshape(-1, outs.shape[-1])[m]
        y = ys.reshape(-1, ys.shape[-1])[m]
        if task == "classification":
            return float((out.argmax(-1) == y.reshape(-1)).mean())
        if task == "sequence":
            from escgnn_tpu.data.code2 import (
                MAX_SEQ_LEN,
                NUM_VOCAB,
                subtoken_f1,
            )

            pred = out.reshape(-1, MAX_SEQ_LEN, NUM_VOCAB + 2).argmax(-1)
            return subtoken_f1(pred, y.astype(np.int64))
        from escgnn_tpu.train.metrics import average_precision, rocauc

        v = (rocauc if use_auc else average_precision)(y, out)
        if np.isnan(v):
            # degenerate eval split (single class / no positives):
            # the metric is undefined — surface it instead of a
            # silent 0.0 feeding best-val tracking (the OGB
            # Evaluator raises here); NaN never becomes best-val
            import warnings
            warnings.warn(f"{metric_name} undefined on this "
                          "split (degenerate labels); "
                          "reporting NaN")
        return v

    sign = -1.0 if higher_better else 1.0
    best_val = float("inf")
    best_test, best_epoch = float("nan"), -1
    best_link_stats: dict = {}
    t0 = time.time()
    for epoch in range(start_epoch, cfg.train.epochs + 1):
        order = jnp.asarray(
            np_rng.permutation(n_train_batches), jnp.int32
        )
        rng, sub = jax.random.split(rng)
        state, ep_losses = pool_train_step(state, train_stack, order, sub)
        losses = [jnp.mean(ep_losses)]
        if epoch % cfg.train.eval_period == 0:
            # exact-average re-estimation of BN running stats on frozen
            # params before eval (train/loop.py make_pool_refresh_step)
            state = state.replace(
                batch_stats=refresh_pool(
                    state.batch_stats, state.params, refresh_stack
                )
            )
            val = evaluate_stack(val_stack, splits["val"], "val")
            test = evaluate_stack(test_stack, splits["test"], "test")
            if sign * val < best_val:
                best_val = sign * val
                best_test, best_epoch = test, epoch
                if task == "link":
                    best_link_stats = dict(
                        link_stats_by_split.get("test", {})
                    )
                if cfg.train.ckpt_best:
                    ckpt.save(int(state.step), state, force=True)
            if cfg.optim.scheduler == "plateau":
                lr = sched.step(sign * val, get_learning_rate(state))
                state = set_learning_rate(state, lr)
            print(
                f"[seed {seed}] epoch {epoch:03d} lr "
                f"{get_learning_rate(state):.6f} loss "
                f"{float(np.mean([float(l) for l in losses])):.5f} "
                f"val {metric_name} {val * std:.5f} "
                f"test {metric_name} {test * std:.5f}"
            )
        if epoch % cfg.train.ckpt_period == 0:
            ckpt.save(int(state.step), state)
    if best_epoch == -1:
        # no eval epoch ever ran (train.epochs < train.eval_period):
        # evaluate the final state instead of returning +/-inf / NaN
        # aggregates
        state = state.replace(
            batch_stats=refresh_pool(
                state.batch_stats, state.params, refresh_stack
            )
        )
        best_val = sign * evaluate_stack(val_stack, splits["val"], "val")
        best_test, best_epoch = (
            evaluate_stack(test_stack, splits["test"], "test"),
            cfg.train.epochs,
        )
        if task == "link":
            best_link_stats = dict(link_stats_by_split.get("test", {}))
    key = metric_name.lower()
    out = {
        f"best_val_{key}": sign * best_val * std,
        f"best_test_{key}": best_test * std,
        "best_epoch": best_epoch,
        "train_time_s": time.time() - t0,
    }
    if task == "link":
        # hits@k companions of the test MRR at the best-val epoch (the
        # reference logs hits@{1,3,10} alongside MRR)
        for k, v in best_link_stats.items():
            if k != "mrr":
                out[f"best_test_{k}"] = v
    return out


def run_eval_only(cfg, ckpt_dir: str):
    """Inference-only mode: restore a checkpoint, evaluate val/test."""
    splits, mean, std = build_dataset(cfg, cfg.seed)
    all_graphs = [g for s in splits.values() for g in s]
    spec = BatchSpec.from_graphs(all_graphs, batch_size=cfg.train.batch_size)
    model = GPSModel(_gps_config(cfg, splits))
    init_b = jax.tree.map(
        jnp.asarray, next(batch_iterator(splits["train"][:2], spec))
    )
    variables = model.init(jax.random.key(cfg.seed), init_b)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(cfg.optim.base_lr),
    )
    ckpt = CheckpointManager(ckpt_dir)
    state = restore_train_state(ckpt, state)
    task = cfg.dataset.task
    eval_step = make_eval_step(
        model, node_level=not cfg.model.graph_pred
    )
    logits_pool = make_pool_logits_step(model)

    use_auc = task == "multilabel" and cfg.metric == "auc"

    def evaluate(graphs):
        if task == "link":
            from escgnn_tpu.data.prefetch import stack_split
            from escgnn_tpu.train.metrics import graph_link_mrr

            M = spec.max_nodes_per_graph

            @jax.jit
            def scores_pool(params, batch_stats, stacked):
                def body(_, batch):
                    emb = model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        batch, deterministic=True,
                        use_running_average=True,
                    )
                    G = batch.graph_mask.shape[0]
                    dense = jnp.zeros((G, M, emb.shape[-1]), emb.dtype)
                    dense = dense.at[
                        batch.node_graph, batch.node_local
                    ].set(jnp.where(batch.node_mask[:, None], emb, 0.0))
                    return None, jnp.einsum("gmd,gnd->gmn", dense, dense)

                _, s = jax.lax.scan(body, None, stacked)
                return s

            scores = np.asarray(scores_pool(
                state.params, state.batch_stats, stack_split(graphs, spec)
            ))
            mrrs = []
            for j, g in enumerate(graphs):
                st = graph_link_mrr(
                    scores[j // spec.num_graphs, j % spec.num_graphs],
                    np.asarray(g.extras["pair_index"]),
                    np.asarray(g.extras["pair_label"]),
                    g.num_nodes,
                )
                if st:
                    mrrs.append(st["mrr"])
            return float(np.mean(mrrs)) if mrrs else 0.0
        if task == "node_classification":
            from escgnn_tpu.data.prefetch import stack_split
            from sklearn.metrics import f1_score

            stacked = stack_split(graphs, spec)

            @jax.jit
            def node_logits(params, batch_stats, stacked):
                def body(_, batch):
                    out = model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        batch, deterministic=True,
                        use_running_average=True,
                    )
                    return None, (out, batch.y, batch.node_mask)

                _, outs = jax.lax.scan(body, None, stacked)
                return outs

            outs, ys, masks = jax.tree.map(np.asarray, node_logits(
                state.params, state.batch_stats, stacked
            ))
            m = masks.reshape(-1).astype(bool) & (ys.reshape(-1) >= 0)
            pred = outs.reshape(-1, outs.shape[-1])[m].argmax(-1)
            return float(f1_score(
                ys.reshape(-1)[m].astype(np.int64), pred, average="macro"
            ))
        if task != "regression":
            from escgnn_tpu.data.prefetch import stack_split
            from escgnn_tpu.train.metrics import average_precision, rocauc

            outs, ys, masks = jax.tree.map(np.asarray, logits_pool(
                state.params, state.batch_stats, stack_split(graphs, spec)
            ))
            m = masks.reshape(-1).astype(bool)
            out = outs.reshape(-1, outs.shape[-1])[m]
            y = ys.reshape(-1, ys.shape[-1])[m]
            if task == "classification":
                return float((out.argmax(-1) == y.reshape(-1)).mean())
            if task == "sequence":
                from escgnn_tpu.data.code2 import (
                    MAX_SEQ_LEN,
                    NUM_VOCAB,
                    subtoken_f1,
                )

                pred = out.reshape(
                    -1, MAX_SEQ_LEN, NUM_VOCAB + 2
                ).argmax(-1)
                return subtoken_f1(pred, y.astype(np.int64))
            v = (rocauc if use_auc else average_precision)(y, out)
            if np.isnan(v):
                import warnings
                warnings.warn("metric undefined on this split "
                              "(degenerate labels); reporting NaN")
            return v
        tot = cnt = 0.0
        for b in batch_iterator(graphs, spec):
            b = jax.tree.map(jnp.asarray, b)
            s, c = eval_step(state.params, state.batch_stats, b)
            tot += float(s)
            cnt += float(c)
        return tot / max(cnt, 1.0)

    key = {
        "classification": "acc",
        "multilabel": "auc" if use_auc else "ap",
        "node_classification": "f1",
        "sequence": "f1",
        "link": "mrr",
    }.get(task, "mae")
    print(json.dumps({
        f"val_{key}": evaluate(splits["val"]) * std,
        f"test_{key}": evaluate(splits["test"]) * std,
        "ckpt_step": int(state.step),
    }))

    return model, state, splits, spec


def dump_attention(model, state, splits, spec, out_path: str):
    """Attention-weight dump over the first test batch (the reference's
    attention-extraction inference mode, custom_train.py:317): every GPS
    layer's dense-attention weights (G, heads, M, M) saved to one npz."""
    b = jax.tree.map(jnp.asarray, next(batch_iterator(splits["test"], spec)))
    _, inter = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        b,
        deterministic=True,
        use_running_average=True,
        mutable=["intermediates"],
    )
    flat = jax.tree_util.tree_flatten_with_path(inter["intermediates"])[0]
    out = {}
    for path, val in flat:
        # path = (DictKey('layer0'), DictKey('self_attn'),
        #         DictKey('attn_weights'), SequenceKey(0))
        parts = [
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        ]
        name = "/".join(p for p in parts if p not in ("attn_weights", "0"))
        out[name] = np.asarray(val)
    if not out:
        raise SystemExit(
            "no attention weights captured — the config's global model "
            "has no dense attention (try global_model transformer/bigbird)"
        )
    np.savez_compressed(out_path, **out)
    print(f"dumped {len(out)} attention tensors to {out_path}: "
          f"{sorted(out)[:4]}...")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None, help="YAML config path")
    p.add_argument("--eval_only", default=None, metavar="CKPT_DIR",
                   help="restore the checkpoint dir and only evaluate "
                        "(the reference's inference-only mode, "
                        "custom_train.py:219)")
    p.add_argument("--dump_attn", default=None, metavar="NPZ_PATH",
                   help="with --eval_only: also dump per-layer attention "
                        "weights of the first test batch")
    p.add_argument("opts", nargs="*", help="dotted key value overrides")
    args = p.parse_args()

    cfg = load_cfg(args.cfg, args.opts)
    if args.eval_only:
        model, state, splits, spec = run_eval_only(cfg, args.eval_only)
        if args.dump_attn:
            dump_attention(model, state, splits, spec, args.dump_attn)
        return
    out_dir = os.path.join(
        cfg.out_dir, time.strftime("%Y%m%d%H%M%S")
    )
    dump_cfg(cfg, out_dir)
    from escgnn_tpu.utils.rundir import backup_run

    backup_run(out_dir)

    results = []
    for run in range(cfg.num_runs):
        results.append(run_one(cfg, cfg.seed + run, out_dir))
        print(f"[run {run}] {results[-1]}")
    agg = agg_runs(results)
    with open(os.path.join(out_dir, "agg.json"), "w") as f:
        json.dump({"runs": results, "agg": agg}, f, indent=2)
    print("aggregated:", json.dumps(agg))


if __name__ == "__main__":
    main()
