#!/usr/bin/env python
"""ZINC graph-regression driver (TPU-native).

Capability mirror of reference `run_zinc.py`: NestedGIN_eff with node/edge
type embeddings, L1 loss on mean/std-normalized targets, Adam + plateau
LR, MAE*std reporting. Loads the real ZINC subset if its pickle exists
under --data_dir (same artifact `dataset_zinc.py` consumes); otherwise
trains on deterministic synthetic molecule-shaped graphs so the pipeline
is exercisable end to end.
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
from escgnn_tpu.data.prefetch import (
    prefetched_batches,
    stack_split,
    stacked_batch_pools,
)
from escgnn_tpu.data.molecules import zinc_splits
from escgnn_tpu.featurize.cache import cached_featurize
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.train.loop import (
    PlateauScheduler,
    TrainState,
    adam_with_plateau,
    get_learning_rate,
    l1_graph_loss,
    make_train_step,
    set_learning_rate,
    make_pool_eval_step,
    make_pool_refresh_step,
    make_pool_train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=3)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off)")
    p.add_argument("--lr_decay_factor", type=float, default=0.5)
    p.add_argument("--model", default="NestedGIN_eff",
                   choices=["NestedGIN_eff", "NGNN", "I2GNN", "GNN"],
                   help="reference run_zinc.py model dispatch "
                        "(eval(args.model) at :257); NGNN/I2GNN use the "
                        "copy-based transforms instead of the ESC encoding; "
                        "GNN is the plain RGCN baseline "
                        "(zinc_models.py:42-113)")
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_graphs", type=int, default=2000)
    p.add_argument("--copy_layout", default="uniform",
                   choices=["ragged", "uniform", "bucketed"],
                   help="NGNN/I2GNN batch layout: uniform per-copy "
                        "blocks (einsum message passing; default), "
                        "two-size bucketed blocks (round 5 — ~1.2x "
                        "over uniform on I2GNN bench shapes, "
                        "results_archive/copy_ab_bucketed), or "
                        "the ragged union")
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--res_dir", default=None)
    p.add_argument("--membership_pools", type=int, default=4,
                   help="pre-built membership-shuffled train batch pools cycled across epochs (bounded-transfer stand-in for per-epoch reshuffling)")
    p.add_argument("--compress_pools", action="store_true",
                   help="store device-resident pools losslessly downcast "
                        "(int8/int16; data/compress.py) with on-device "
                        "decode in the scanned step")
    p.add_argument("--reshuffle_membership", action="store_true",
                   help="re-form train batches every epoch (reference-exact shuffling; leaks host RSS on the remote-tunnel env — see train pool comment)")
    p.add_argument("--bn_eval", default="running",
               choices=["batch", "running"],
               help="eval-time BN statistics (see make_eval_step)")
    p.add_argument("--mesh", default="none",
                   choices=["none", "dp", "ep", "halo", "dp_ep"],
                   help="train over a jax.sharding.Mesh: 'dp' = data "
                   "parallel (one batch per device per step; grads/loss/"
                   "BN stats pmean'd over ICI — the reference "
                   "DistributedSampler+DDP role, kernel/train_eval.py:44-57); "
                   "'ep' = edge partition (all devices cooperate on the "
                   "same batch; edge arrays GSPMD-sharded, partial "
                   "scatter-adds psum'd — no reference analogue); "
                   "'halo' = receiver-range node+edge sharding with a "
                   "boundary all_gather per conv and the graph-level "
                   "pool psum'd globally (parallel/halo.py); 'dp_ep' = "
                   "2-D data x edge mesh (--mesh_dp = data-axis size)")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="device count for --mesh (0 = all visible)")
    p.add_argument("--mesh_dp", type=int, default=2,
                   help="data-axis size of the 2-D --mesh dp_ep mesh")
    args = p.parse_args()

    res_dir = args.res_dir or os.path.join(
        "results", "zinc_" + time.strftime("%Y%m%d%H%M%S")
    )
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    from escgnn_tpu.utils.rundir import backup_run

    backup_run(res_dir)

    t0 = time.time()
    raw_splits, is_real = zinc_splits(
        args.data_dir, num_graphs=args.num_graphs, seed=args.seed
    )
    print("dataset:", "ZINC (real artifact)" if is_real else "ZINC (synthetic)")
    if args.model == "NGNN":
        from escgnn_tpu.featurize.node_subgraphs import (
            NodeSubgraphConfig,
            create_node_subgraphs,
        )

        scfg = NodeSubgraphConfig(h=args.h, use_rd=True)
        key_tag = f"ngnn_h{args.h}_rd"

        def transform(graphs):
            return [create_node_subgraphs(g, scfg) for g in graphs]
    elif args.model == "I2GNN":
        from escgnn_tpu.featurize.pair_subgraphs import (
            PairSubgraphConfig,
            create_pair_subgraphs,
        )

        pcfg = PairSubgraphConfig(h=args.h, use_rd=True)
        key_tag = f"i2gnn_h{args.h}_rd"

        def transform(graphs):
            return [create_pair_subgraphs(g, pcfg) for g in graphs]
    else:
        ecfg = EscConfig(h=args.h, use_rd=True, self_loop=True)
        key_tag = ecfg.cache_key()

        def transform(graphs):
            return featurize_many(graphs, ecfg, num_workers=args.num_workers)
    splits = {}
    for name, graphs in raw_splits.items():
        splits[name] = cached_featurize(
            os.path.join(
                args.data_dir, "zinc_real" if is_real else "zinc_synth"
            ),
            (f"{name}_{key_tag}" if is_real else
             f"{name}_n{args.num_graphs}_s{args.seed}_{key_tag}"),
            lambda graphs=graphs: transform(graphs),
        )
    # normalize targets by train+val stats (reference run_zinc.py:210-216)
    ys = np.concatenate(
        [g.y for s in ("train", "val") for g in splits[s]]
    )
    mean, std = float(ys.mean()), float(ys.std(ddof=1))
    for s in splits.values():
        for g in s:
            g.y = ((g.y - mean) / std).astype(np.float32)
    print(f"data: {time.time() - t0:.1f}s mean={mean:.3f} std={std:.3f}")

    all_graphs = [g for s in splits.values() for g in s]
    batch_transform = None  # set by --copy_layout bucketed
    n_dev = (args.mesh_devices or len(jax.devices())) if (
        args.mesh != "none"
    ) else 0
    if args.mesh == "halo":
        import dataclasses as _dc

        assert args.model == "NestedGIN_eff", (
            "--mesh halo drives the NestedGIN_eff halo path"
        )
        # halo sharding requires the width enc layout (per-edge rows
        # shard exactly) and a node budget divisible by the mesh
        spec = BatchSpec.from_graphs(
            all_graphs, args.batch_size, enc_layout="width"
        )
        if spec.num_nodes % n_dev:
            spec = _dc.replace(
                spec,
                num_nodes=spec.num_nodes + n_dev - spec.num_nodes % n_dev,
            )
    elif args.model == "NestedGIN_eff":
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
        # one-hot einsum message passing + reshape pooling, the round-4
        # answer to the copy-family scatter bottleneck; numerically
        # equal to the ragged layout (tests/test_uniform_copies.py).
        # "bucketed" additionally re-lays every batch into two block
        # sizes (round 5; equality locked by tests/test_bucketed_copies)
        from escgnn_tpu.data.uniform_copies import uniformize_dataset

        if args.copy_layout == "bucketed":
            assert args.mesh == "none" and not args.reshuffle_membership, (
                "--copy_layout bucketed supports the pooled single-"
                "device path (use uniform with --mesh/--reshuffle)"
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
        # copy-based batches: ragged width layout (per-UNION padding;
        # --copy_layout uniform is the fast blocked path)
        spec = BatchSpec.from_graphs(all_graphs, batch_size=args.batch_size)
    print("spec:", spec)

    if args.model == "GNN":
        from escgnn_tpu.models.baselines import (
            RGCNBaseline,
            RGCNBaselineConfig,
        )

        model = RGCNBaseline(RGCNBaselineConfig(num_layers=args.layers))
    elif args.model == "NGNN":
        from escgnn_tpu.models.ngnn import NGNN, NGNNConfig

        model = NGNN(NGNNConfig(
            num_layers=args.layers, hidden=args.hidden, use_rd=True,
            out_dim=1,
        ))
    elif args.model == "I2GNN":
        from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig

        model = I2GNN(I2GNNConfig(
            num_layers=args.layers, hidden=args.hidden, use_rd=True,
            subgraph2_pooling="mean-center-side", gate=True, out_dim=1,
        ))
    else:
        zcfg = NestedGINEffConfig(
            hidden=args.hidden,
            num_layers=args.layers,
            dropout=0.0,
            act="elu",
            graph_pred=True,
            pool="add",
            use_x_embedding_jk=False,
            head_order="dropout_act",
            node_embed_vocab=100,
            edge_embed_vocab=100,
            out_dim=1,
        )
        model = NestedGINEff(zcfg)
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
    mesh = None
    if args.mesh != "none":
        from escgnn_tpu.parallel.data_parallel import replicate_state
        from escgnn_tpu.parallel.mesh import make_mesh, replicate

        if args.mesh == "dp_ep":
            assert n_dev % args.mesh_dp == 0, (n_dev, args.mesh_dp)
            mesh = make_mesh(
                axis_names=("data", "model"),
                shape=(args.mesh_dp, n_dev // args.mesh_dp),
            )
        else:
            axis_names = ("data",) if args.mesh == "dp" else ("model",)
            mesh = make_mesh(n_dev, axis_names=axis_names)
        state = replicate_state(state, mesh)
        assert not args.reshuffle_membership, (
            "--mesh uses device-resident pools"
        )
        if args.mesh == "dp":
            # dp_pool_step is built after the pools (it needs the
            # compressed-pool decoder)
            print(f"mesh: dp over {n_dev} devices "
                  f"(effective batch {n_dev * args.batch_size})")
        elif args.mesh == "halo":
            import dataclasses as _dc

            from escgnn_tpu.parallel.halo import (
                make_halo_nested_train_step,
            )

            halo_model = NestedGINEff(_dc.replace(zcfg, halo_axis="model"))
            halo_step = make_halo_nested_train_step(
                halo_model, mesh, "model", graph_loss_fn=l1_graph_loss
            )
            print(f"mesh: halo over {n_dev} devices (receiver-range "
                  f"node+edge shards, graph pool psum'd globally)")
        elif args.mesh == "dp_ep":
            print(f"mesh: dp_ep over {args.mesh_dp}x"
                  f"{n_dev // args.mesh_dp} devices (graphs over data, "
                  f"edges over data x model)")
        else:
            print(f"mesh: ep over {n_dev} devices "
                  f"(edge arrays sharded, batch {args.batch_size})")

    train_step = make_train_step(model, l1_graph_loss)
    sched = PlateauScheduler(
        factor=args.lr_decay_factor, patience=args.patience
    )

    # Device-resident batch pools: the remote-execution tunnel leaks
    # ~1x the transferred bytes in host RSS on every device_put
    # (measured; a 2000-epoch run OOM-killed a 125 GB host at
    # ~216 MB/epoch), so per-epoch membership reshuffling is opt-in
    # (--reshuffle_membership: the reference's exact semantics, fresh
    # transfers each epoch). See stacked_batch_pools/stack_split.
    if not args.reshuffle_membership and args.mesh != "halo":
        stacked_pools, num_train_batches, pool_decode = stacked_batch_pools(
            splits["train"], spec, k=args.membership_pools, seed=args.seed,
            compress=args.compress_pools,
            max_total_bytes=(10 if args.compress_pools else 4) * 2**30,
            batch_transform=batch_transform,
        )
        pool_train_step = make_pool_train_step(
            model, l1_graph_loss, decode=pool_decode
        )
    if args.compress_pools:
        from escgnn_tpu.data.prefetch import stack_split_compressed

        val_stack, eval_decode = stack_split_compressed(
            splits["val"], spec, batch_transform=batch_transform
        )
        test_stack, _ = stack_split_compressed(
            splits["test"], spec, batch_transform=batch_transform
        )
        refresh_stack, _ = stack_split_compressed(
            splits["train"][: 8 * args.batch_size], spec,
            batch_transform=batch_transform,
        )
    else:
        eval_decode = None
        val_stack = stack_split(splits["val"], spec,
                                batch_transform=batch_transform)
        test_stack = stack_split(splits["test"], spec,
                                 batch_transform=batch_transform)
        refresh_stack = stack_split(
            splits["train"][: 8 * args.batch_size], spec,
            batch_transform=batch_transform,
        )
    if mesh is not None:
        if args.mesh == "dp":
            # dp: pools and eval stacks replicated over the mesh
            assert num_train_batches >= mesh.size, (
                f"need >= {mesh.size} train batches for --mesh dp, have "
                f"{num_train_batches}"
            )
            stacked_pools = [replicate(p, mesh) for p in stacked_pools]
            from escgnn_tpu.parallel.data_parallel import (
                make_dp_pool_train_step,
            )

            dp_pool_step = make_dp_pool_train_step(
                model, l1_graph_loss, mesh, decode=pool_decode
            )
        elif args.mesh == "halo":
            from jax.sharding import NamedSharding, PartitionSpec as P

            from escgnn_tpu.parallel.halo import (
                build_halo_batch,
                plan_halo_sharding,
            )

            host_batches = list(batch_iterator(splits["train"], spec))
            plans = [plan_halo_sharding(b, n_dev) for b in host_batches]
            eb = max(p.edge_shard for p in plans)
            bb = max(p.boundary_send.shape[1] for p in plans)
            hbud = max(p.halo_src.shape[1] for p in plans)
            sh = NamedSharding(mesh, P("model"))
            halo_batches = [
                jax.device_put(
                    build_halo_batch(
                        b, plan_halo_sharding(b, n_dev, eb, bb, hbud)
                    ),
                    sh,
                )
                for b in host_batches
            ]
            print(f"halo pool: {len(halo_batches)} batches, "
                  f"E_shard {eb}, boundary {bb}, halo {hbud}")
        elif args.mesh == "dp_ep":
            from escgnn_tpu.parallel.edge_partition import (
                make_dp_ep_pool_train_step,
                shard_pool_2d,
            )

            stacked_pools = [shard_pool_2d(p, mesh) for p in stacked_pools]
            ep_pool_step = make_dp_ep_pool_train_step(
                model, l1_graph_loss, mesh, stacked_pools[0],
                decode=pool_decode,
            )
        else:
            # ep: edge arrays of the pools sharded over the mesh
            from escgnn_tpu.parallel.edge_partition import (
                make_ep_pool_train_step,
                shard_pool_by_edges,
            )

            stacked_pools = [
                shard_pool_by_edges(p, mesh) for p in stacked_pools
            ]
            ep_pool_step = make_ep_pool_train_step(
                model, l1_graph_loss, mesh, stacked_pools[0],
                decode=pool_decode,
            )
        val_stack = replicate(val_stack, mesh)
        test_stack = replicate(test_stack, mesh)
        refresh_stack = replicate(refresh_stack, mesh)
    eval_pool = make_pool_eval_step(
        model, node_level=False, bn_mode=args.bn_eval, decode=eval_decode
    )
    refresh_pool = make_pool_refresh_step(model, decode=eval_decode)

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
        elif mesh is not None and args.mesh == "dp":
            pool = stacked_pools[(epoch - 1) % len(stacked_pools)]
            perm = data_rng.permutation(num_train_batches)
            steps = num_train_batches // mesh.size
            order = jnp.asarray(
                perm[: steps * mesh.size].reshape(steps, mesh.size),
                jnp.int32,
            )
            state, ep_losses = dp_pool_step(state, pool, order, rng)
            losses.append(jnp.mean(ep_losses))
        elif mesh is not None and args.mesh == "halo":
            for i in data_rng.permutation(len(halo_batches)):
                rng, sub = jax.random.split(rng)
                state, loss = halo_step(state, halo_batches[i], sub)
                losses.append(loss)
        else:
            # single-device and ep share the schedule; only the step differs
            step_fn = ep_pool_step if mesh is not None else pool_train_step
            pool = stacked_pools[(epoch - 1) % len(stacked_pools)]
            order = jnp.asarray(
                data_rng.permutation(num_train_batches), jnp.int32
            )
            state, ep_losses = step_fn(state, pool, order, rng)
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
