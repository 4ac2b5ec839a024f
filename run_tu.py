#!/usr/bin/env python
"""TU-benchmark cross-validation driver.

Capability mirror of the reference's kernel benchmark entry (the
`kernel/` stack driven through `cross_validation_with_val_set`,
reference `kernel/train_eval.py:16-130`): choose a TU dataset + model
from the registry, run stratified k-fold CV, report test accuracy at the
best-val epoch, mean +- std over folds.

Nested variants (--nested) apply the NGNN node-copy pre-transform and
pool node -> subgraph -> graph, the reference's NestedGCN/NestedGIN
scheme (`kernel/gcn.py:166-240`).

Planetoid citation datasets (--dataset Cora|Citeseer|PubMed, reference
`kernel/datasets.py:47,68-69`) load one citation graph and require a
cycle mode (single-graph node-split protocol; k-fold CV over graphs does
not apply).

Cycle modes (--use_cycle) run the reference's node-level cycle trainers
(`kernel/train_eval.py:333-691`) instead of k-fold CV, with per-node
3..6-cycle labels computed in-repo (`data/counting.py`):
  class  — BCE on binarized counts over a node split of the dataset's
           disjoint union (one-graph protocol, `train_val_cycles`);
  reg    — MSE regression on the same split, optional --multi_layer
           deep supervision (`train_val_cycles_regression`);
  reg_gc — graph-split batched regression
           (`train_val_cycles_regression_GC`).
"""

from __future__ import annotations

import argparse
import json
import os
import time

from escgnn_tpu.utils import setup_jax

setup_jax()  # persistent XLA compile cache

from escgnn_tpu.data.tu import get_tu_dataset
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.models import get_model
from escgnn_tpu.train.cv import cross_validation_with_val_set


def run_cycles(args, graphs, pre, res_dir):
    """Dispatch the three cycle trainers (reference
    `kernel/train_eval.py:359,446,564`)."""
    import numpy as np

    from escgnn_tpu.data.counting import count_cycles_per_node
    from escgnn_tpu.models import get_model
    from escgnn_tpu.train.cycles import (
        train_val_cycles,
        train_val_cycles_regression,
        train_val_cycles_regression_GC,
    )
    from escgnn_tpu.utils.graph import disjoint_union

    cycles = [
        count_cycles_per_node(g.num_nodes, g.edge_index).astype(np.float32)
        for g in graphs
    ]
    model = get_model(
        "BaselineGNN", conv=args.conv, hidden=args.hidden,
        num_layers=args.layers, out_dim=cycles[0].shape[1],
        nested=args.nested, classify=False, node_level=True, jk=True,
        multi_layer=args.multi_layer, dropout=args.dropout,
    )

    log_path = os.path.join(res_dir, "log.txt")

    def logger(msg):
        print(msg)
        with open(log_path, "a") as f:
            f.write(msg + "\n")

    common = dict(
        split_ratio=args.split_ratio, epochs=args.epochs, lr=args.lr,
        lr_decay_factor=args.lr_decay_factor,
        lr_decay_step_size=args.lr_decay_step_size,
        weight_decay=args.weight_decay, seed=args.seed, logger=logger,
    )
    if args.use_cycle == "reg_gc":
        if pre is not None:
            graphs = [pre(g) for g in graphs]
        res = train_val_cycles_regression_GC(
            graphs, cycles, model, batch_size=args.batch_size, **common
        )
        names = ("test_mse", "test_mae", "test_rmse")
    else:
        union = disjoint_union(graphs)
        if pre is not None:
            union = pre(union)
        cyc = np.concatenate(cycles)
        fn = (train_val_cycles if args.use_cycle == "class"
              else train_val_cycles_regression)
        res = fn(union, cyc, model, **common)
        names = (
            ("test_acc", "test_roc", "test_ap") if args.use_cycle == "class"
            else ("test_mse", "test_mae", "test_rmse")
        )
    summary = dict(zip(names, map(float, res.test_metrics)))
    summary["best_val"] = float(res.best_val)
    summary["duration_s"] = res.duration
    logger(json.dumps(summary))
    with open(os.path.join(res_dir, "result.json"), "w") as f:
        json.dump(summary, f, indent=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="MUTAG")
    p.add_argument("--data_dir", default="data/TU")
    p.add_argument("--model", default="BaselineGNN")
    p.add_argument("--conv", default="gin0",
                   help="gcn|gcn_dir|sage|gin0|gin|gat|pna (BaselineGNN)")
    p.add_argument("--pool", default="mean")
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--nested", action="store_true",
                   help="NGNN node-copy nesting (NestedGCN scheme)")
    p.add_argument("--use_cycle", default="off",
                   choices=["off", "class", "reg", "reg_gc"],
                   help="node-level cycle trainers instead of k-fold CV")
    p.add_argument("--multi_layer", action="store_true",
                   help="deep-supervision aux heads (reg modes)")
    p.add_argument("--split_ratio", type=float, default=0.3)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--h", type=int, default=2)
    p.add_argument("--folds", type=int, default=10)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr_decay_factor", type=float, default=0.5)
    p.add_argument("--lr_decay_step_size", type=int, default=50)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--res_dir", default=None)
    args = p.parse_args()

    res_dir = args.res_dir or os.path.join(
        "results", f"tu_{args.dataset}_" + time.strftime("%Y%m%d%H%M%S")
    )
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    from escgnn_tpu.utils.rundir import backup_run

    backup_run(res_dir)

    pre = None
    if args.nested:
        ncfg = NodeSubgraphConfig(h=args.h)
        pre = lambda g: create_node_subgraphs(g, ncfg)  # noqa: E731
    t0 = time.time()
    # cycle labels come from the RAW graphs (before any copy transform)
    raw_pre = None if args.use_cycle != "off" else pre
    from escgnn_tpu.data.planetoid import PLANETOID_NAMES, get_planetoid

    if args.dataset in PLANETOID_NAMES:
        if args.use_cycle == "off":
            p.error("Planetoid datasets are single citation graphs; "
                    "use a --use_cycle mode (node-split protocol)")
        graphs = [get_planetoid(args.dataset,
                                root=os.path.join(args.data_dir, "..",
                                                  "Planetoid"))]
        print(f"dataset {args.dataset}: 1 graph, "
              f"{graphs[0].num_nodes} nodes  ({time.time() - t0:.1f}s)")
    else:
        graphs = get_tu_dataset(args.dataset, root=args.data_dir,
                                pre_transform=raw_pre)
        classes = sorted({int(g.y[0]) for g in graphs})
        print(f"dataset {args.dataset}: {len(graphs)} graphs, "
              f"{len(classes)} classes  ({time.time() - t0:.1f}s)")

    if args.use_cycle != "off":
        return run_cycles(args, graphs, pre, res_dir)

    def factory():
        if args.model == "BaselineGNN":
            return get_model(
                "BaselineGNN", conv=args.conv, hidden=args.hidden,
                num_layers=args.layers, out_dim=len(classes),
                pool=args.pool, nested=args.nested,
            )
        if args.model == "IDGNN":
            # identity-aware layers (reference kernel/idgnn.py); conv in
            # gin|gcn|sage|gat (gin0 maps to gin — no eps-free variant)
            return get_model(
                "IDGNN", conv={"gin0": "gin"}.get(args.conv, args.conv),
                hidden=args.hidden, num_layers=args.layers,
                out_dim=len(classes), pool=args.pool,
            )
        return get_model(args.model, out_dim=len(classes))

    log_path = os.path.join(res_dir, "log.txt")

    def logger(msg):
        print(msg)
        with open(log_path, "a") as f:
            f.write(msg + "\n")

    res = cross_validation_with_val_set(
        graphs, factory,
        folds=args.folds, epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr, lr_decay_factor=args.lr_decay_factor,
        lr_decay_step_size=args.lr_decay_step_size,
        weight_decay=args.weight_decay, seed=args.seed, logger=logger,
    )
    summary = (
        f"Val Loss: {res.val_loss:.4f}, Test Accuracy: "
        f"{res.test_acc_mean:.3f} +- {res.test_acc_std:.3f}"
    )
    logger(summary)
    with open(os.path.join(res_dir, "result.json"), "w") as f:
        json.dump(
            {"val_loss": res.val_loss, "test_acc_mean": res.test_acc_mean,
             "test_acc_std": res.test_acc_std,
             "durations": res.durations}, f, indent=2
        )


if __name__ == "__main__":
    main()
