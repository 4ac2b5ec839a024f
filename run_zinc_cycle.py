#!/usr/bin/env python
"""ZINC per-node cycle-count regression (TPU-native).

Capability mirror of reference `run_zinc_cycle.py` + `zinc_cycle_models.py`
(`:506-614`): the ZINC NestedGIN_eff (node/edge type embeddings, ELU) with
the graph pooling removed — lin1/lin2 applied per node — trained with L1
on per-node counts of 3..6-cycles. The reference derives targets with
nx.simple_cycles / 2; we use the exact DFS counter (same values).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target", type=int, default=0, help="0..3 -> 3..6-cycles")
    p.add_argument("--model", default="NestedGIN_eff",
                   choices=["NestedGIN_eff", "NGNN", "I2GNN", "GNN"],
                   help="reference run_zinc_cycle.py model dispatch "
                        "(:154-179): node-level variants — NGNN/I2GNN "
                        "predict per ORIGINAL node via their subgraph "
                        "rows, GNN is the plain RGCN with the graph "
                        "pooling removed (zinc_cycle_models.py)")
    p.add_argument("--h", type=int, default=3)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off)")
    p.add_argument("--lr_decay_factor", type=float, default=0.5)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_graphs", type=int, default=1000)
    p.add_argument("--copy_layout", default="uniform",
                   choices=["ragged", "uniform", "bucketed"],
                   help="NGNN/I2GNN batch layout: uniform per-copy "
                        "blocks (einsum message passing; default) or "
                        "the ragged union")
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--res_dir", default=None)
    p.add_argument("--membership_pools", type=int, default=4,
                   help="pre-built membership-shuffled train batch pools cycled across epochs (bounded-transfer stand-in for per-epoch reshuffling)")
    p.add_argument("--reshuffle_membership", action="store_true",
                   help="re-form train batches every epoch (reference-exact shuffling; leaks host RSS on the remote-tunnel env — see train pool comment)")
    p.add_argument("--bn_eval", default="running",
               choices=["batch", "running"],
               help="eval-time BN statistics (see make_eval_step)")
    args = p.parse_args()

    res_dir = args.res_dir or os.path.join(
        "results", "zinc_cycle_" + time.strftime("%Y%m%d%H%M%S")
    )
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    from escgnn_tpu.utils.rundir import backup_run

    backup_run(res_dir)

    from escgnn_tpu.data.counting import count_cycles_per_node
    from escgnn_tpu.data.molecules import synthetic_zinc
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    t0 = time.time()
    raw = synthetic_zinc(num_graphs=args.num_graphs, seed=args.seed)
    for g in raw:
        g.y = count_cycles_per_node(g.num_nodes, g.edge_index).astype(
            np.float32
        )
    # standardize the selected target on RAW graphs (train+val stats),
    # before any copy transform multiplies the node count
    n_tr, n_val = int(0.8 * len(raw)), int(0.1 * len(raw))
    ys = np.concatenate(
        [g.y[:, args.target] for g in raw[: n_tr + n_val]]
    )
    mean, std = float(ys.mean()), float(ys.std(ddof=1))
    std = max(std, 1e-8)
    for g in raw:
        g.y = ((g.y[:, args.target] - mean) / std)[:, None].astype(np.float32)

    # seg_level: predictions live on subgraph-copy rows (one per original
    # node), targets ride in extras["y_seg"] with the segment batching rule
    seg_level = args.model in ("NGNN", "I2GNN")
    if args.model == "NestedGIN_eff":
        ecfg = EscConfig(h=args.h, use_rd=True, self_loop=True)
        feats = featurize_many(raw, ecfg, num_workers=args.num_workers)
    elif args.model == "GNN":
        feats = raw  # plain RGCN over the original graph
    else:
        if args.model == "NGNN":
            from escgnn_tpu.featurize.node_subgraphs import (
                NodeSubgraphConfig,
                create_node_subgraphs,
            )

            scfg = NodeSubgraphConfig(h=args.h, use_rd=True)
            feats = [create_node_subgraphs(g, scfg) for g in raw]
        else:
            from escgnn_tpu.featurize.pair_subgraphs import (
                PairSubgraphConfig,
                create_pair_subgraphs,
            )

            pcfg = PairSubgraphConfig(h=args.h, use_rd=True)
            feats = [create_pair_subgraphs(g, pcfg) for g in raw]
        for g, r in zip(feats, raw):
            g.extras["y_seg"] = np.asarray(r.y, np.float32)
            g.y = None
    splits = {
        "train": feats[:n_tr],
        "val": feats[n_tr:n_tr + n_val],
        "test": feats[n_tr + n_val:],
    }
    print(f"data: {time.time() - t0:.1f}s mean={mean:.3f} std={std:.3f}")

    import jax
    from escgnn_tpu.utils import setup_jax
    setup_jax()  # persistent XLA compile cache
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import BatchSpec, batch_iterator
    from escgnn_tpu.data.prefetch import (
        prefetched_batches,
        stack_split,
        stacked_batch_pools,
    )
    from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
    from escgnn_tpu.train.loop import (
        PlateauScheduler,
        TrainState,
        adam_with_plateau,
        get_learning_rate,
        l1_node_loss,
        make_train_step,
        set_learning_rate,
        make_pool_eval_step,
        make_pool_refresh_step,
        make_pool_train_step,
    )

    all_graphs = [g for s in splits.values() for g in s]
    batch_transform = None  # set by --copy_layout bucketed
    if args.model == "NestedGIN_eff":
        # uniform per-graph blocks + dedup ESC rows: the fast layout the
        # flagship bench uses (einsum message passing on the MXU, z-emb
        # reduce on unique histogram rows) — numerically equal to the
        # width layout (tests/test_zemb_dedup.py, tests/test_model.py)
        spec = BatchSpec.uniform(
            all_graphs, args.batch_size, enc_layout="dedup"
        )
    elif args.model in ("NGNN", "I2GNN") and args.copy_layout in (
            "uniform", "bucketed"):
        # uniform per-COPY blocks (data/uniform_copies.py): per-copy
        # one-hot einsum message passing + reshape pooling; numerically
        # equal to the ragged layout (tests/test_uniform_copies.py).
        # "bucketed": two-size blocks (round 5, tests/test_bucketed_copies)
        from escgnn_tpu.data.uniform_copies import uniformize_dataset

        if args.copy_layout == "bucketed":
            assert not args.reshuffle_membership, (
                "--copy_layout bucketed supports the pooled path"
            )
            from escgnn_tpu.data.uniform_copies import (
                make_bucket_transform,
            )

            batch_transform, regions = make_bucket_transform(
                all_graphs, args.batch_size
            )
            print(f"bucketed copy layout: small region "
                  f"{regions[0]}, large blocks {regions[1]}")
        uni = uniformize_dataset(all_graphs)
        for name in splits:
            k = len(splits[name])
            splits[name], uni = uni[:k], uni[k:]
        all_graphs = [g for s2 in splits.values() for g in s2]
        spec = BatchSpec.copy_uniform(all_graphs, batch_size=args.batch_size)
    else:
        # ragged union layout (k-set batches stay here; NGNN/I2GNN only
        # with --copy_layout ragged)
        spec = BatchSpec.from_graphs(all_graphs, batch_size=args.batch_size)
    print("spec:", spec)

    if args.model == "GNN":
        from escgnn_tpu.models.baselines import (
            RGCNBaseline,
            RGCNBaselineConfig,
        )

        model = RGCNBaseline(RGCNBaselineConfig(
            num_layers=args.layers, node_level=True,
        ))
    elif args.model == "NGNN":
        from escgnn_tpu.models.ngnn import NGNN, NGNNConfig

        model = NGNN(NGNNConfig(
            num_layers=args.layers, hidden=args.hidden, use_rd=True,
            node_level=True, out_dim=1,
        ))
    elif args.model == "I2GNN":
        from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig

        model = I2GNN(I2GNNConfig(
            num_layers=args.layers, hidden=args.hidden, use_rd=True,
            subgraph2_pooling="mean-center-side", gate=True,
            node_level=True, out_dim=1,
        ))
    else:
        model = NestedGINEff(
            NestedGINEffConfig(
                hidden=args.hidden,
                num_layers=args.layers,
                dropout=0.0,
                act="elu",
                graph_pred=False,
                use_x_embedding_jk=False,
                head_order="dropout_act",
                node_embed_vocab=100,
                edge_embed_vocab=100,
                out_dim=1,
            )
        )
    rng = jax.random.key(args.seed)
    init_host = next(batch_iterator(splits["train"][:2], spec))
    if batch_transform is not None:
        init_host = batch_transform(init_host)
    init_b = jax.tree.map(jnp.asarray, init_host)
    variables = model.init(rng, init_b)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(args.lr, grad_clip=args.grad_clip),
    )
    if seg_level:
        # predictions live on subgraph-copy rows (one per original node);
        # targets ride in extras["y_seg"] masked by segment_mask
        def loss_fn(out, batch):
            err = jnp.abs(out - batch.extras["y_seg"])
            m = batch.segment_mask.astype(err.dtype)[:, None]
            return jnp.sum(err * m) / jnp.maximum(
                jnp.sum(m) * err.shape[-1], 1.0
            )
    else:
        loss_fn = l1_node_loss
    train_step = make_train_step(model, loss_fn)
    if not args.reshuffle_membership:
        pool_train_step = make_pool_train_step(model, loss_fn)
    sched = PlateauScheduler(factor=args.lr_decay_factor,
                             patience=args.patience)

    # Device-resident batch pools — see stacked_batch_pools/stack_split
    # (bounded-transfer stand-in for per-epoch reshuffling; the tunnel
    # leaks host RSS on every device_put). --reshuffle_membership keeps
    # the reference's exact per-epoch semantics.
    if not args.reshuffle_membership:
        stacked_pools, num_train_batches, _ = stacked_batch_pools(
            splits["train"], spec, k=args.membership_pools, seed=args.seed,
            batch_transform=batch_transform,
        )
    val_stack = stack_split(splits["val"], spec,
                            batch_transform=batch_transform)
    test_stack = stack_split(splits["test"], spec,
                             batch_transform=batch_transform)
    refresh_stack = stack_split(splits["train"][: 8 * args.batch_size],
                                spec, batch_transform=batch_transform)
    if seg_level:
        @jax.jit
        def eval_pool(params, batch_stats, stacked):
            def body(acc, batch):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, deterministic=True, use_running_average=True,
                )
                m = batch.segment_mask
                err = jnp.abs(out - batch.extras["y_seg"]) * m[:, None]
                return (
                    acc[0] + jnp.sum(err),
                    acc[1] + jnp.sum(m) * out.shape[-1],
                ), None

            acc, _ = jax.lax.scan(
                body,
                (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
                stacked,
            )
            return acc
    else:
        eval_pool = make_pool_eval_step(
            model, node_level=True, bn_mode=args.bn_eval
        )
    refresh_pool = make_pool_refresh_step(model)

    def evaluate(stacked):
        e, c = eval_pool(state.params, state.batch_stats, stacked)
        return float(e) / max(float(c), 1.0) * std

    data_rng = np.random.default_rng(args.seed)
    best_val = best_test = float("inf")
    for epoch in range(1, args.epochs + 1):
        t_ep = time.time()
        losses = []
        if args.reshuffle_membership:
            for b in prefetched_batches(
                splits["train"], spec, shuffle=True, rng=data_rng
            ):
                rng, sub = jax.random.split(rng)
                state, loss = train_step(state, b, sub)
                losses.append(loss)
        else:
            pool = stacked_pools[(epoch - 1) % len(stacked_pools)]
            order = jnp.asarray(
                data_rng.permutation(num_train_batches), jnp.int32
            )
            state, ep_losses = pool_train_step(state, pool, order, rng)
            losses.append(jnp.mean(ep_losses))
        if args.bn_eval == "running":
            # re-estimate BN running stats with frozen params before eval
            state = state.replace(
                batch_stats=refresh_pool(
                    state.batch_stats, state.params, refresh_stack
                )
            )
        val_mae = evaluate(val_stack)
        lr = get_learning_rate(state)
        new_lr = sched.step(val_mae, lr)
        if new_lr != lr:
            state = set_learning_rate(state, new_lr)
        line = (
            f"epoch {epoch:03d} lr {lr:.6f} "
            f"loss {float(jnp.mean(jnp.stack(losses))):.5f} "
            f"val MAE {val_mae:.5f}"
        )
        if val_mae < best_val:
            best_val = val_mae
            best_test = evaluate(test_stack)
            line += f" test MAE {best_test:.5f} *"
        line += f" ({time.time() - t_ep:.1f}s)"
        print(line)
        with open(os.path.join(res_dir, "log.txt"), "a") as f:
            f.write(line + "\n")
    print(f"best val {best_val:.5f} test {best_test:.5f}")


if __name__ == "__main__":
    main()
