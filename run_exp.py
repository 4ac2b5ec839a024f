#!/usr/bin/env python
"""EXP / CEXP expressiveness benchmark (TPU-native, real data).

Mirror of reference `run_exp.py`: binary classification of 1-WL-equivalent
graph-SAT pairs over sequential splits, with the reference's extra
"learning" vs "expressivity" test subsets selected by index-mod-4 masks
(`run_exp.py:283-291`; pairs are adjacent in the list, so mod-4 picks
whole pairs the model never saw).
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
from escgnn_tpu.data.planar_sat import load_planar_sat
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


def accuracy(acc_step, state, graphs, spec):
    ok = tot = 0.0
    for b in batch_iterator(graphs, spec):
        b = jax.tree.map(jnp.asarray, b)
        c, t = acc_step(state.params, state.batch_stats, b)
        ok += float(c)
        tot += float(t)
    return ok / max(tot, 1.0)


def accuracy_vote(vote_step, state, graphs, spec, nb_trials):
    """Majority-vote eval (reference `run_exp.py:255-265`): per-graph
    success counts over nb_trials forward passes, correct when
    > nb_trials // 2. Single trial (the reference default) reduces to
    plain accuracy."""
    ok = tot = 0.0
    for b in batch_iterator(graphs, spec):
        b = jax.tree.map(jnp.asarray, b)
        succ = None
        for _ in range(nb_trials):
            correct, mask = vote_step(state.params, state.batch_stats, b)
            c = np.asarray(correct, np.int32)
            succ = c if succ is None else succ + c
        voted = (succ > nb_trials // 2) & np.asarray(mask)
        ok += float(voted.sum())
        tot += float(np.asarray(mask).sum())
    return ok / max(tot, 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="EXP", choices=["EXP", "CEXP"])
    p.add_argument("--h", type=int, default=3)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--splits", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_graphs", type=int, default=None)
    p.add_argument("--nb_trials", type=int, default=1,
                   help="majority-vote eval trials (reference "
                        "run_exp.py:257 'Support majority vote, but "
                        "single trial is default')")
    args = p.parse_args()

    raw = load_planar_sat(args.dataset)
    if args.max_graphs:
        raw = raw[: args.max_graphs]
    ecfg = EscConfig(h=args.h, use_rd=True, self_loop=True)
    t0 = time.time()
    feats = featurize_many(raw, ecfg, num_workers=2)
    print(f"featurize {len(feats)} graphs: {time.time() - t0:.1f}s")
    spec = BatchSpec.from_graphs(feats, batch_size=args.batch_size)
    print("spec:", spec)

    model = NestedGINEff(
        NestedGINEffConfig(
            hidden=args.hidden,
            num_layers=args.layers,
            graph_pred=True,
            pool="add",
            use_x_embedding_jk=False,
            node_embed_vocab=8,  # EXP x is a small category id
            out_dim=2,
        )
    )
    n = len(feats)
    results = []
    for si in range(args.splits):
        # sequential split: test block si, train the rest
        lo, hi = si * n // args.splits, (si + 1) * n // args.splits
        test = feats[lo:hi]
        train = feats[:lo] + feats[hi:]
        if not train:
            raise ValueError(
                "--splits 1 leaves an empty train set (test = the whole "
                "dataset); use >= 2 splits"
            )
        # expressivity subset: every 4th pair of the test block
        idx = np.arange(len(test))
        expr = [test[i] for i in idx if (i // 2) % 2 == 0]
        learn = [test[i] for i in idx if (i // 2) % 2 == 1]

        rng = jax.random.key(args.seed + si)
        b0 = jax.tree.map(jnp.asarray, next(batch_iterator(train, spec)))
        variables = model.init(rng, b0)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            adam_with_plateau(args.lr),
        )
        train_step = make_train_step(model, ce_graph_loss)
        acc_step = make_accuracy_step(model)
        if args.nb_trials > 1:
            from escgnn_tpu.train.loop import make_pergraph_correct_step

            vote_step = make_pergraph_correct_step(model)

            def acc_fn(graphs):
                return accuracy_vote(vote_step, state, graphs, spec,
                                     args.nb_trials)
        else:
            def acc_fn(graphs):
                return accuracy(acc_step, state, graphs, spec)
        drng = np.random.default_rng(args.seed + si)
        from escgnn_tpu.data.prefetch import materialized_batches

        train_batches = materialized_batches(train, spec)
        for ep in range(args.epochs):
            for i in drng.permutation(len(train_batches)):
                rng, sub = jax.random.split(rng)
                state, _ = train_step(state, train_batches[int(i)], sub)
        accs = (acc_fn(test), acc_fn(expr), acc_fn(learn))
        results.append(accs)
        print(f"split {si}: test {accs[0]:.3f} expressivity {accs[1]:.3f} "
              f"learning {accs[2]:.3f}")
    r = np.asarray(results)
    print(f"{args.dataset}: test {r[:,0].mean():.4f} "
          f"expressivity {r[:,1].mean():.4f} learning {r[:,2].mean():.4f}")


if __name__ == "__main__":
    main()
