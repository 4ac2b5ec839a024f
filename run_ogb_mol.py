#!/usr/bin/env python
"""OGB molecule-property driver (TPU-native).

Capability mirror of reference `run_ogb_mol.py`: GNN with
GNN_node_efficient (virtual node, Atom/Bond encoders, per-layer ESC edge
injection), NaN-masked BCE, ROC-AUC / AP evaluation, periodic
checkpointing with resume (`--continue_from`) and checkpoint-ensemble
evaluation (`run_ogb_mol.py:440-452,521-538`). Uses the real ogbg-mol*
arrays when present under --data_dir, else deterministic synthetic
molecules.
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

from escgnn_tpu.data.batching import BatchSpec, batch_iterator
from escgnn_tpu.data.prefetch import prefetched_batches
from escgnn_tpu.data.molecules import synthetic_ogb_mol
from escgnn_tpu.featurize.cache import cached_featurize
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig
from escgnn_tpu.train.checkpoint import CheckpointManager
from escgnn_tpu.train.loop import TrainState, adam_with_plateau
from escgnn_tpu.train.metrics import average_precision, masked_bce_with_logits, rocauc

from functools import partial


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ogbg-molhiv")
    p.add_argument("--model", default="GNN",
                   choices=["GNN", "GINEPlus", "NestedPPGN"],
                   help="GNN = the efficient OGB GNN (virtual node + ESC "
                        "z-emb, reference ogb_mol_gnn.py:614-792); "
                        "GINEPlus = the multihop GINE+ ClassifierNetwork "
                        "(modules/gine_operations.py:196-253); NestedPPGN "
                        "= two-level dense PPGN over node copies "
                        "(ogb_mol_gnn.py:1058-1212)")
    p.add_argument("--multihop_k", type=int, default=3,
                   help="GINEPlus: number of hop levels K")
    p.add_argument("--h", type=int, default=4)
    p.add_argument("--num_layer", type=int, default=6)
    p.add_argument("--emb_dim", type=int, default=300)
    p.add_argument("--drop_ratio", type=float, default=0.65)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num_tasks", type=int, default=1)
    p.add_argument("--graph_pooling", default="mean",
                   choices=["sum", "mean", "max", "attention", "combine",
                            "set2set", "sort"])
    p.add_argument("--subgraph_pooling", default="mean",
                   choices=["sum", "mean", "max", "attention", "center",
                            "combine"],
                   help="pooling of the copy level when a two-level batch "
                        "rides in (reference GNN subpool)")
    p.add_argument("--rni", action="store_true",
                   help="random node initialization (h0 += U(-1,1))")
    p.add_argument("--use_rp", type=int, default=None,
                   help="N-step random-walk return probabilities as "
                        "extra node features (reference run_ogb_mol.py"
                        ":233,344-349 return_prob pre-transform)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_graphs", type=int, default=1000)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--log_steps", type=int, default=5)
    p.add_argument("--continue_from", type=int, default=None)
    p.add_argument("--ensemble_eval", action="store_true")
    p.add_argument("--dump_worst", type=int, default=0,
                   help="after training, dump the K worst-loss test "
                        "graphs to worst.json (reference's loss-sorted "
                        "visualization, run_ogb_mol.py:153-192)")
    p.add_argument("--layout", default="uniform",
                   choices=["uniform", "ragged"],
                   help="batch layout for GNN/GINEPlus: uniform "
                        "per-graph blocks (einsum message passing, "
                        "the bench layout) or the ragged union")
    p.add_argument("--synth_label", default="parity",
                   choices=["parity", "tri"],
                   help="synthetic stand-in label function when no real "
                        "OGB raw dir exists (data/molecules.py "
                        "synthetic_ogb_mol): 'tri' = triangle count "
                        "above the dataset median, a target inside the "
                        "ESC encoding's provable counting power — use "
                        "it for learns-to-quality rows")
    p.add_argument("--metric", default="rocauc", choices=["rocauc", "ap"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--res_dir", default=None)
    args = p.parse_args()

    res_dir = args.res_dir or os.path.join(
        "results", f"{args.dataset}_" + time.strftime("%Y%m%d%H%M%S")
    )
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    from escgnn_tpu.utils.rundir import backup_run

    backup_run(res_dir)

    ecfg = EscConfig(h=args.h, use_rd=True, self_loop=True)
    is_ppa = args.dataset == "ogbg-ppa"
    if is_ppa:
        # species classification: featureless nodes, 7-dim float edges,
        # 37 classes, CE loss + accuracy (reference run_ogb_mol.py:352)
        from escgnn_tpu.data.molecules import synthetic_ppa

        raw = synthetic_ppa(num_graphs=args.num_graphs, seed=args.seed)
        args.num_tasks = 37
        n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
        raw_splits = {
            "train": raw[:n_tr],
            "val": raw[n_tr:n_tr + n_val],
            "test": raw[n_tr + n_val:],
        }
    else:
        # real OGB raw directory when present (scaffold split,
        # data/molecules.py load_ogb_graph_dir); synthetic otherwise
        from escgnn_tpu.data.molecules import ogb_mol_splits

        raw_splits, is_real = ogb_mol_splits(
            args.data_dir, args.dataset, num_graphs=args.num_graphs,
            seed=args.seed, num_tasks=args.num_tasks,
            label_kind=args.synth_label,
        )
        print(f"{args.dataset}: "
              f"{'real raw dir' if is_real else 'synthetic'} "
              f"({sum(len(s) for s in raw_splits.values())} graphs)")
    rp_key = f"_rp{args.use_rp}" if args.use_rp else ""
    if args.synth_label != "parity":
        rp_key += f"_lab{args.synth_label}"

    def featurize_split(graphs):
        if args.model == "GINEPlus":
            # multihop edge levels instead of the ESC encoding (the
            # reference's GINE+ stack runs on plain OGB graphs,
            # modules/gine_operations.py:256-303)
            from escgnn_tpu.featurize.multihop import make_multihop_edges

            return [make_multihop_edges(g, k=args.multihop_k)
                    for g in graphs]
        if args.model == "NestedPPGN":
            from escgnn_tpu.featurize.node_subgraphs import (
                NodeSubgraphConfig,
                create_node_subgraphs,
            )

            scfg = NodeSubgraphConfig(
                h=args.h, use_rd=True, keep_orig_adj=True
            )
            return [create_node_subgraphs(g, scfg) for g in graphs]
        if args.use_rp:
            from escgnn_tpu.featurize.rw import attach_return_prob

            graphs = [attach_return_prob(g, args.use_rp) for g in graphs]
        return featurize_many(graphs, ecfg, num_workers=args.num_workers)

    model_key = {"GNN": "", "GINEPlus": f"_ginep{args.multihop_k}",
                 "NestedPPGN": "_nppgn"}[args.model]
    splits = {}
    for name, graphs in raw_splits.items():
        splits[name] = cached_featurize(
            os.path.join(args.data_dir, args.dataset.replace("-", "_")),
            f"{name}_n{args.num_graphs}_s{args.seed}"
            f"_{ecfg.cache_key()}{rp_key}{model_key}",
            lambda graphs=graphs: featurize_split(graphs),
        )

    all_graphs = [g for s in splits.values() for g in s]
    if args.layout == "uniform" and args.model in ("GNN", "GINEPlus"):
        # the bench layouts (round 5): uniform per-graph blocks turn
        # gather/scatter into per-graph one-hot einsums; the GNN path
        # additionally deduplicates ESC rows (numerically equal —
        # tests/test_zemb_dedup.py, tests/test_playbook_r5.py)
        spec = BatchSpec.uniform(
            all_graphs, batch_size=args.batch_size,
            enc_layout="dedup" if args.model == "GNN" else "width",
        )
    else:
        spec = BatchSpec.from_graphs(
            all_graphs, batch_size=args.batch_size
        )
    print("spec:", spec)

    if args.model == "GINEPlus":
        from escgnn_tpu.models.gine_plus import (
            GINEPlusConfig,
            GINEPlusNetwork,
        )

        model = GINEPlusNetwork(GINEPlusConfig(
            hidden=args.emb_dim,
            out_dim=args.num_tasks,
            num_layers=args.num_layer,
            dropout=args.drop_ratio,
            k=args.multihop_k,
            virtual_node=True,
        ))
    elif args.model == "NestedPPGN":
        from escgnn_tpu.models.nested_ppgn import (
            NestedPPGN,
            NestedPPGNConfig,
        )

        # static dense budget: the largest node-copy subgraph in the data
        max_sub = 1
        for g in all_graphs:
            seg = np.asarray(g.extras["node_to_subgraph"])
            max_sub = max(max_sub, int(np.bincount(seg).max()))
        model = NestedPPGN(NestedPPGNConfig(
            emb_dim=args.emb_dim,
            num_rb_layers=args.num_layer,
            num_tasks=args.num_tasks,
            use_rd=True,
            classify=False,  # BCE-with-logits head (OGB multilabel)
            max_nodes_per_subgraph=max_sub,
        ))
    else:
        model = OgbGNN(
            OgbGNNConfig(
                num_tasks=args.num_tasks,
                num_layers=args.num_layer,
                emb_dim=args.emb_dim,
                dropout=args.drop_ratio,
                virtual_node=True,
                graph_pooling=args.graph_pooling,
                subgraph_pooling=args.subgraph_pooling,
                rni=args.rni,
                use_rp=args.use_rp or 0,
                ppa_encoders=is_ppa,
            )
        )
    rng = jax.random.key(args.seed)
    init_b = jax.tree.map(
        jnp.asarray, next(batch_iterator(splits["train"][:2], spec))
    )
    variables = model.init(rng, init_b)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(args.lr, grad_clip=args.grad_clip),
    )
    ckpt = CheckpointManager(os.path.join(res_dir, "ckpt"))
    start_epoch = 1
    if args.continue_from is not None:
        restored = ckpt.restore(
            args.continue_from,
            template={"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        start_epoch = args.continue_from + 1
        print(f"resumed from epoch {args.continue_from}")

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": rng, "rni": jax.random.fold_in(rng, 7)},
            )
            if is_ppa:
                from escgnn_tpu.train.loop import ce_graph_loss

                return ce_graph_loss(out, batch), mut["batch_stats"]
            return masked_bce_with_logits(out, batch), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        import optax

        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    @jax.jit
    def predict(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            deterministic=True,
            use_running_average=True,
        )

    if is_ppa:
        args.metric = "acc"

        def metric_fn(y, p):  # accuracy (the OGB ppa Evaluator metric)
            return float((p.argmax(-1) == y.reshape(-1)).mean())
    else:
        metric_fn = rocauc if args.metric == "rocauc" else average_precision

    def evaluate(graphs, param_sets=None):
        """Score a split; with param_sets, average predictions over
        checkpoints (reference's ensemble eval)."""
        param_sets = param_sets or [(state.params, state.batch_stats)]
        ys, ps = [], []
        for b in batch_iterator(graphs, spec):
            bj = jax.tree.map(jnp.asarray, b)
            scores = np.mean(
                [np.asarray(predict(p, bs, bj)) for p, bs in param_sets], axis=0
            )
            m = np.asarray(b.graph_mask)
            ys.append(np.asarray(b.y)[m])
            ps.append(scores[m])
        return metric_fn(np.concatenate(ys), np.concatenate(ps))

    from escgnn_tpu.data.prefetch import materialized_batches

    # device-resident train pool, order-shuffled per epoch (tunnel
    # device_put leak + epoch speed — see the regression drivers)
    train_batches = materialized_batches(splits["train"], spec)
    data_rng = np.random.default_rng(args.seed)
    best_val = -1.0
    best_test = float("nan")
    for epoch in range(start_epoch, args.epochs + 1):
        t_ep = time.time()
        losses = []
        for i in data_rng.permutation(len(train_batches)):
            rng, sub = jax.random.split(rng)
            state, loss = train_step(state, train_batches[int(i)], sub)
            losses.append(loss)
        val = evaluate(splits["val"])
        line = (
            f"epoch {epoch:03d} loss {float(jnp.mean(jnp.stack(losses))):.5f} "
            f"val {args.metric} {val:.5f}"
        )
        if val > best_val:
            best_val = val
            best_test = evaluate(splits["test"])
            line += f" test {best_test:.5f} *"
        if epoch % args.log_steps == 0 or epoch == args.epochs:
            ckpt.save(
                epoch,
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            line += " [ckpt]"
        line += f" ({time.time() - t_ep:.1f}s)"
        print(line)
        with open(os.path.join(res_dir, "log.txt"), "a") as f:
            f.write(line + "\n")

    if args.ensemble_eval and ckpt.all_steps():
        tmpl = {"params": state.params, "batch_stats": state.batch_stats}
        sets = [
            (
                (r := ckpt.restore(s, template=tmpl))["params"],
                r["batch_stats"],
            )
            for s in ckpt.all_steps()
        ]
        ens = evaluate(splits["test"], param_sets=sets)
        print(f"ensemble test {args.metric} over {len(sets)} ckpts: {ens:.5f}")

    if args.dump_worst:
        # per-graph BCE on the test split, sorted worst-first
        per_graph = []
        gi = 0
        for b in batch_iterator(splits["test"], spec):
            bj = jax.tree.map(jnp.asarray, b)
            scores = np.asarray(predict(state.params, state.batch_stats, bj))
            y = np.asarray(b.y)
            m = np.asarray(b.graph_mask)
            for k in np.flatnonzero(m):
                yk, sk = y[k], scores[k]
                lab = ~np.isnan(yk)
                if not lab.any():
                    continue
                p_ = 1.0 / (1.0 + np.exp(-sk[lab]))
                eps = 1e-7
                bce = float(np.mean(
                    -(yk[lab] * np.log(p_ + eps)
                      + (1 - yk[lab]) * np.log(1 - p_ + eps))
                ))
                per_graph.append({"index": gi, "loss": bce,
                                  "y": yk[lab].tolist(),
                                  "score": sk[lab].tolist()})
                gi += 1
        per_graph.sort(key=lambda r: -r["loss"])
        with open(os.path.join(res_dir, "worst.json"), "w") as f:
            json.dump(per_graph[: args.dump_worst], f, indent=2)
        print(f"dumped {min(args.dump_worst, len(per_graph))} worst graphs")

    print(f"best val {best_val:.5f} test {best_test:.5f}")


if __name__ == "__main__":
    main()
