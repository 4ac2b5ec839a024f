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

    pre = None
    if args.nested:
        ncfg = NodeSubgraphConfig(h=args.h)
        pre = lambda g: create_node_subgraphs(g, ncfg)  # noqa: E731
    t0 = time.time()
    graphs = get_tu_dataset(args.dataset, root=args.data_dir,
                            pre_transform=pre)
    classes = sorted({int(g.y[0]) for g in graphs})
    print(f"dataset {args.dataset}: {len(graphs)} graphs, "
          f"{len(classes)} classes  ({time.time() - t0:.1f}s)")

    def factory():
        if args.model == "BaselineGNN":
            return get_model(
                "BaselineGNN", conv=args.conv, hidden=args.hidden,
                num_layers=args.layers, out_dim=len(classes),
                pool=args.pool, nested=args.nested,
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
