#!/usr/bin/env python
"""CSL 10-class isomorphism benchmark (TPU-native).

Mirror of reference `run_csl.py`: NestedGIN_eff classifies Circular Skip
Link graphs into their 10 skip-length classes under stratified k-fold CV.
1-WL models score 10% (chance); the ESC structural encoding should reach
~100%.
"""

from __future__ import annotations

import argparse
import time

import jax

from escgnn_tpu.utils import setup_jax

setup_jax()  # persistent XLA compile cache
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, batch_iterator
from escgnn_tpu.data.csl import generate_csl
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.train.loop import (
    TrainState,
    adam_with_plateau,
    ce_graph_loss,
    make_accuracy_step,
    make_train_step,
)


def k_fold_indices(labels: np.ndarray, k: int, seed: int):
    """Stratified k folds (reference `run_csl.py` uses sklearn's
    StratifiedKFold; same contract)."""
    rng = np.random.default_rng(seed)
    folds = [[] for _ in range(k)]
    for cls in np.unique(labels):
        idx = np.flatnonzero(labels == cls)
        rng.shuffle(idx)
        for i, g in enumerate(idx):
            folds[i % k].append(g)
    return [np.asarray(f) for f in folds]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=3)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--folds", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    raw = generate_csl(seed=args.seed)
    labels = np.asarray([int(g.y[0]) for g in raw])
    ecfg = EscConfig(h=args.h, use_rd=True, self_loop=True)
    t0 = time.time()
    feats = featurize_many(raw, ecfg, num_workers=2)
    print(f"featurize: {time.time() - t0:.1f}s")
    spec = BatchSpec.from_graphs(feats, batch_size=args.batch_size)

    model = NestedGINEff(
        NestedGINEffConfig(
            hidden=args.hidden,
            num_layers=args.layers,
            graph_pred=True,
            pool="add",
            use_x_embedding_jk=False,
            out_dim=10,
        )
    )
    folds = k_fold_indices(labels, args.folds, args.seed)
    accs = []
    for fi in range(args.folds):
        test_idx = folds[fi]
        train_idx = np.concatenate([folds[j] for j in range(args.folds) if j != fi])
        train = [feats[i] for i in train_idx]
        test = [feats[i] for i in test_idx]

        rng = jax.random.key(args.seed + fi)
        b0 = jax.tree.map(jnp.asarray, next(batch_iterator(train, spec)))
        variables = model.init(rng, b0)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            adam_with_plateau(args.lr),
        )
        train_step = make_train_step(model, ce_graph_loss)
        acc_step = make_accuracy_step(model)
        drng = np.random.default_rng(args.seed + fi)
        from escgnn_tpu.data.prefetch import materialized_batches

        train_batches = materialized_batches(train, spec)
        for _ in range(args.epochs):
            for i in drng.permutation(len(train_batches)):
                rng, sub = jax.random.split(rng)
                state, loss = train_step(state, train_batches[int(i)], sub)
        ok = tot = 0.0
        for b in batch_iterator(test, spec):
            b = jax.tree.map(jnp.asarray, b)
            c, t = acc_step(state.params, state.batch_stats, b)
            ok += float(c)
            tot += float(t)
        accs.append(ok / tot)
        print(f"fold {fi}: acc {accs[-1]:.3f}")
    print(f"CSL {args.folds}-fold acc: {np.mean(accs):.4f} +- {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
