#!/usr/bin/env python
"""Cycle-counting benchmark driver (TPU-native).

Capability mirror of the reference's `run_graphcount.py`: NestedGIN_eff on
random graphs with per-node cycle-count targets, L1 loss on standardized
targets, Adam + ReduceLROnPlateau, best-val checkpointing, MAE*std
reporting. The dataset is regenerated deterministically (the reference's
.mat blobs are not distributed); featurized graphs are cached on disk
keyed by the EscConfig.

Example:
    python run_graphcount.py --target 0 --h 3 --batch_size 128 --epochs 50
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
    materialized_batches,
    prefetched_batches,
    stack_split,
    stacked_batch_pools,
)
from escgnn_tpu.data.counting import (
    TARGET_COLUMNS,
    CountingDatasetConfig,
    generate_counting_graphs,
    normalize_targets,
)
from escgnn_tpu.featurize.cache import cached_featurize
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.train.loop import (
    PlateauScheduler,
    make_pool_eval_step,
    make_pool_refresh_step,
    make_pool_train_step,
    TrainState,
    adam_with_plateau,
    get_learning_rate,
    l1_node_loss,
    make_train_step,
    set_learning_rate,
)


def build_datasets(args):
    dcfg = CountingDatasetConfig(
        num_graphs=args.num_graphs,
        seed=args.data_seed,
        task="graphlet" if args.dataset == "count_graphlet" else "cycle",
    )
    ecfg = EscConfig(h=args.h, use_rd=True, self_loop=True)
    # generation (exact DFS substructure counting) is expensive — only run
    # it on cache miss; the npz cache stores targets alongside features
    raw_cache: dict = {}

    def raw_splits():
        if not raw_cache:
            raw_cache.update(generate_counting_graphs(dcfg))
        return raw_cache

    out = {}
    # y{cols} keys the cache on the target schema so widening it (e.g.
    # the 5th graphlet column) rebuilds instead of serving stale targets
    ycols = TARGET_COLUMNS[dcfg.task]
    for name in ("train", "val", "test"):
        out[name] = cached_featurize(
            os.path.join(args.data_dir, args.dataset),
            f"{name}_n{dcfg.num_graphs}_s{dcfg.seed}"
            f"_y{ycols}_{ecfg.cache_key()}",
            lambda name=name: featurize_many(
                raw_splits()[name], ecfg, num_workers=args.num_workers
            ),
        )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target", type=int, default=0, help="0..3 -> 3..6-cycles "
                   "(count_cycle) / 0..4 -> tailed-tri, chordal, 4-clique, "
                   "P4, triangle-rectangle (count_graphlet)")
    p.add_argument("--dataset", default="count_cycle",
                   choices=["count_cycle", "count_graphlet"])
    p.add_argument("--h", type=int, default=3)
    p.add_argument("--model", default="NestedGIN_eff",
                   choices=["NestedGIN_eff", "PPGN_eff"],
                   help="reference run_graphcount.py:316 model dispatch")
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--lr_decay_factor", type=float, default=0.9)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--load_ckpt", default=None,
                   help="warm-start params/BN stats from this ckpt dir "
                        "(a previous run's res_dir/ckpt — the "
                        "reference's --load_model role)")
    p.add_argument("--data_seed", type=int, default=0)
    p.add_argument("--num_graphs", type=int, default=1500)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--res_dir", default=None)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv-stack compute dtype (f32 master params)")
    p.add_argument("--analyze", action="store_true",
                   help="per-count-value MAE breakdown after training")
    p.add_argument("--membership_pools", type=int, default=4,
                   help="pre-built membership-shuffled train batch pools cycled across epochs (bounded-transfer stand-in for per-epoch reshuffling)")
    p.add_argument("--compress_pools", action="store_true",
                   help="store device-resident pools losslessly downcast "
                        "(int8/int16; data/compress.py) with on-device "
                        "decode in the scanned step — ~3x smaller pools, "
                        "unlocking 160k+ graph device pools in HBM")
    p.add_argument("--reshuffle_membership", action="store_true",
                   help="re-form train batches every epoch (reference-exact shuffling; leaks host RSS on the remote-tunnel env — see train pool comment)")
    p.add_argument("--mesh", default="none",
                   choices=["none", "dp", "ep", "halo", "dp_ep"],
                   help="train over a jax.sharding.Mesh: 'dp' = data "
                   "parallel (each step consumes one batch per device; "
                   "grads/loss/BN stats pmean'd over ICI — the reference "
                   "DistributedSampler+DDP role, kernel/train_eval.py:44-57); "
                   "'ep' = edge partition (all devices cooperate on the "
                   "same batch; edge arrays GSPMD-sharded, partial "
                   "scatter-adds psum'd — no reference analogue); "
                   "'halo' = receiver-range node+edge sharding with "
                   "explicit boundary all_gather per conv "
                   "(parallel/halo.py; width enc layout); 'dp_ep' = 2-D "
                   "data x edge mesh (--mesh_dp sets the data-axis size)")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="device count for --mesh (0 = all visible)")
    p.add_argument("--mesh_dp", type=int, default=2,
                   help="data-axis size of the 2-D --mesh dp_ep mesh")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping (0 = off); guards "
                   "against one-batch explosions poisoning Adam (seen on "
                   "PPGN_eff)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process slice: jax.distributed.initialize "
                   "(auto-discovery or --coordinator), mesh over the "
                   "GLOBAL device list, per-process train-data shard for "
                   "--mesh dp (the reference DistributedSampler role, "
                   "kernel/train_eval.py:44-52). Exactly degenerate at "
                   "one process.")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address for --multihost (host:port); "
                   "omit on Cloud TPU (auto-discovered)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="process count for --multihost (omit to "
                   "auto-discover)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's id for --multihost")
    p.add_argument("--bn_eval", default="running",
                   choices=["batch", "running"],
                   help="eval-time BN statistics. 'running' (default) = "
                   "torch model.eval() semantics, with running stats "
                   "re-estimated on frozen params before each eval — "
                   "composition-independent, honest generalization. "
                   "'batch' normalizes with the eval batch's own stats "
                   "(leaks batch-level information: measured ~3x lower "
                   "MAE that does not survive re-batching).")
    args = p.parse_args()

    res_dir = args.res_dir or os.path.join(
        "results", args.dataset + "_" + time.strftime("%Y%m%d%H%M%S")
    )
    os.makedirs(res_dir, exist_ok=True)
    with open(os.path.join(res_dir, "config.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    from escgnn_tpu.utils.rundir import backup_run

    backup_run(res_dir)

    t0 = time.time()
    splits = build_datasets(args)
    splits, mean, std = normalize_targets(splits, args.target)
    print(f"featurization+load: {time.time() - t0:.1f}s  "
          f"mean={mean:.3f} std={std:.3f}")

    all_graphs = [g for s in splits.values() for g in s]
    # uniform per-graph blocks + dedup ESC rows: the fast layout the
    # flagship bench uses (einsum message passing on the MXU, z-emb
    # reduce on unique histogram rows) — numerically equal to the
    # width layout (tests/test_zemb_dedup.py, tests/test_model.py)
    n_dev = (args.mesh_devices or len(jax.devices())) if (
        args.mesh != "none"
    ) else 0
    if args.mesh == "halo":
        import dataclasses as _dc

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
    else:
        spec = BatchSpec.uniform(
            all_graphs, args.batch_size, enc_layout="dedup"
        )
    print(f"batch spec: {spec}")

    if args.model == "PPGN_eff":
        # dense provably-powerful net with the ESC encoding injected into
        # the edge channel (reference run_graphcount.py:207-308)
        from escgnn_tpu.models.ppgn import PPGN, PPGNConfig

        model = PPGN(PPGNConfig(
            emb_dim=args.hidden,
            num_rb_layers=args.layers,
            max_nodes=max(spec.max_nodes_per_graph, spec.uniform_nodes),
            node_level=True,
            use_esc=True,
        ))
    else:
        mcfg = NestedGINEffConfig(
            hidden=args.hidden,
            num_layers=args.layers,
            dropout=0.0,
            graph_pred=False,
            act="relu",
            use_x_embedding_jk=True,
            out_dim=1,
            compute_dtype=args.compute_dtype,
        )
        model = NestedGINEff(mcfg)

    rng = jax.random.key(args.seed)
    init_batch = jax.tree.map(
        jnp.asarray, next(batch_iterator(splits["train"][:2], spec))
    )
    variables = model.init(rng, init_batch)
    tx = adam_with_plateau(args.lr, grad_clip=args.grad_clip)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.load_ckpt:
        # warm start from a previous run's best checkpoint (the
        # reference's --load_model, run_graphcount.py:472-474); the
        # optimizer restarts fresh — this is the segment-resume path
        # for runs interrupted by the environment (dispatch wedges)
        from escgnn_tpu.train.checkpoint import CheckpointManager

        pre = CheckpointManager(args.load_ckpt)
        restored = pre.restore(template={
            "params": params, "batch_stats": batch_stats,
        })
        assert restored is not None, (
            f"--load_ckpt {args.load_ckpt!r} has no checkpoint"
        )
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        print(f"warm-started from {args.load_ckpt} "
              f"(step {pre.latest_step()})")
    state = TrainState.create(params, batch_stats, tx)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params / 1e6:.2f}M")

    proc_count, proc_index = 1, 0
    if args.multihost:
        from escgnn_tpu.parallel.multihost import init_multihost

        proc_count, proc_index = init_multihost(
            args.coordinator, args.num_processes, args.process_id
        )
        print(f"multihost: process {proc_index}/{proc_count}, "
              f"{len(jax.devices())} global devices")
        if args.mesh == "dp" and proc_count > 1:
            # per-process train shard (DistributedSampler role)
            from escgnn_tpu.parallel.multihost import process_shard

            splits["train"] = process_shard(
                splits["train"], proc_index, proc_count
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
            assert args.model == "NestedGIN_eff", (
                "--mesh halo drives the NestedGIN_eff halo path"
            )
            import dataclasses as _dc

            from escgnn_tpu.parallel.halo import (
                make_halo_nested_train_step,
            )

            halo_model = NestedGINEff(_dc.replace(mcfg, halo_axis="model"))
            halo_step = make_halo_nested_train_step(halo_model, mesh,
                                                    "model")
            print(f"mesh: halo over {n_dev} devices (receiver-range "
                  f"node+edge shards, boundary all_gather per conv)")
        elif args.mesh == "dp_ep":
            print(f"mesh: dp_ep over {args.mesh_dp}x"
                  f"{n_dev // args.mesh_dp} devices (graphs over data, "
                  f"edges over data x model)")
        else:
            print(f"mesh: ep over {n_dev} devices "
                  f"(edge arrays sharded, batch {args.batch_size})")

    train_step = make_train_step(model, l1_node_loss)
    sched = PlateauScheduler(
        factor=args.lr_decay_factor, patience=args.patience
    )
    from escgnn_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(res_dir, "ckpt"), max_to_keep=3)

    # eval/refresh sets never reshuffle: pad + device-put them once
    # device-resident train batch POOL, iterated in a fresh random ORDER
    # each epoch. The remote-execution tunnel of this environment leaks
    # ~1x the transferred bytes in host RSS on every device_put (measured;
    # a 2000-epoch run OOM-killed a 125 GB host at ~216 MB/epoch), so
    # per-epoch membership reshuffling is opt-in (--reshuffle_membership:
    # the reference's exact semantics, fresh transfers each epoch).
    if args.reshuffle_membership or args.mesh == "halo":
        # halo trains on a device-resident per-batch halo-shard list
        # (one host plan per batch, shared shape budgets -> one compile)
        stacked_pools = None
    else:
        # stacked device-resident pools: ONE dispatch per epoch via
        # lax.scan over a shuffled index vector (make_pool_train_step);
        # the tunnel costs ~25 ms per dispatch, so per-batch stepping
        # bounds epochs at ~n_batches x 25 ms regardless of compute
        stacked_pools, num_train_batches, pool_decode = stacked_batch_pools(
            splits["train"], spec, k=args.membership_pools, seed=args.seed,
            compress=args.compress_pools,
            max_total_bytes=(10 if args.compress_pools else 4) * 2**30,
        )
        pool_train_step = make_pool_train_step(
            model, l1_node_loss, decode=pool_decode
        )
    if args.compress_pools:
        from escgnn_tpu.data.compress import pool_nbytes
        from escgnn_tpu.data.prefetch import stack_split_compressed

        val_stack, eval_decode = stack_split_compressed(splits["val"], spec)
        test_stack, _ = stack_split_compressed(splits["test"], spec)
        refresh_stack, _ = stack_split_compressed(
            splits["train"][: 8 * args.batch_size], spec
        )
        tot = sum(pool_nbytes(pl) for pl in (stacked_pools or [])) +             pool_nbytes(val_stack) + pool_nbytes(test_stack)
        print(f"compressed pools: {tot / 2**30:.2f} GB device-resident")
    else:
        eval_decode = None
        val_stack = stack_split(splits["val"], spec)
        test_stack = stack_split(splits["test"], spec)
        refresh_stack = stack_split(
            splits["train"][: 8 * args.batch_size], spec
        )
    if mesh is not None:
        if args.mesh == "dp":
            # dp: pools replicated over the mesh (a dp step consumes
            # device-count batches per scan step)
            assert num_train_batches >= mesh.size, (
                f"need >= {mesh.size} train batches for --mesh dp, have "
                f"{num_train_batches}"
            )
            stacked_pools = [replicate(p, mesh) for p in stacked_pools]
            from escgnn_tpu.parallel.data_parallel import (
                make_dp_pool_train_step,
            )

            dp_pool_step = make_dp_pool_train_step(
                model, l1_node_loss, mesh, decode=pool_decode
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
                model, l1_node_loss, mesh, stacked_pools[0],
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
                model, l1_node_loss, mesh, stacked_pools[0],
                decode=pool_decode,
            )
        val_stack = replicate(val_stack, mesh)
        test_stack = replicate(test_stack, mesh)
        refresh_stack = replicate(refresh_stack, mesh)
    eval_pool = make_pool_eval_step(
        model, node_level=True, bn_mode=args.bn_eval, decode=eval_decode
    )
    refresh_pool = make_pool_refresh_step(model, decode=eval_decode)
    # per-batch list kept for --analyze (per-prediction dumps)
    test_batches = materialized_batches(splits["test"], spec)

    def evaluate(state, stacked):
        e, c = eval_pool(state.params, state.batch_stats, stacked)
        return float(e) / max(float(c), 1.0) * std  # MAE in original units

    data_rng = np.random.default_rng(args.seed)
    best_val, best_test = float("inf"), float("inf")
    log_path = os.path.join(res_dir, "log.txt")
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
            train_loss = float(jnp.mean(jnp.stack(losses)))
        elif mesh is not None and args.mesh == "dp":
            pool = stacked_pools[(epoch - 1) % len(stacked_pools)]
            perm = data_rng.permutation(num_train_batches)
            steps = num_train_batches // mesh.size
            order = jnp.asarray(
                perm[: steps * mesh.size].reshape(steps, mesh.size),
                jnp.int32,
            )
            state, ep_losses = dp_pool_step(state, pool, order, rng)
            train_loss = float(jnp.mean(ep_losses))
        elif mesh is not None and args.mesh == "halo":
            losses = []
            for i in data_rng.permutation(len(halo_batches)):
                rng, sub = jax.random.split(rng)
                state, loss = halo_step(state, halo_batches[i], sub)
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses)))
        else:
            # single-device and ep share the schedule; only the step differs
            step_fn = ep_pool_step if mesh is not None else pool_train_step
            pool = stacked_pools[(epoch - 1) % len(stacked_pools)]
            order = jnp.asarray(
                data_rng.permutation(num_train_batches), jnp.int32
            )
            state, ep_losses = step_fn(state, pool, order, rng)
            train_loss = float(jnp.mean(ep_losses))
        if args.bn_eval == "running":
            # re-estimate BN running stats with frozen params before eval
            # (see make_bn_refresh_step)
            state = state.replace(
                batch_stats=refresh_pool(
                    state.batch_stats, state.params, refresh_stack
                )
            )
        val_mae = evaluate(state, val_stack)
        lr = get_learning_rate(state)
        new_lr = sched.step(val_mae, lr)
        if new_lr != lr:
            state = set_learning_rate(state, new_lr)
        line = (
            f"epoch {epoch:03d} lr {lr:.6f} loss {train_loss:.5f} "
            f"val MAE {val_mae:.5f}"
        )
        if val_mae < best_val:
            best_val = val_mae
            best_test = evaluate(state, test_stack)
            line += f" test MAE {best_test:.5f} *"
            ckpt.save(
                epoch,
                {"params": state.params, "batch_stats": state.batch_stats},
            )
        line += f" ({time.time() - t_ep:.1f}s)"
        print(line)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    print(f"best val MAE {best_val:.5f}  test MAE {best_test:.5f} "
          f"(normalized: {best_test / std:.5f})")

    if args.analyze:
        # per-count-value error breakdown (reference `visualize`,
        # run_graphcount.py:531-581): MAE of the de-normalized prediction
        # grouped by the true count value.
        @jax.jit
        def predict(params, batch_stats, b):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, b,
                deterministic=True, use_running_average=True,
            )

        errs: dict[int, list] = {}
        for b in test_batches:
            out = np.asarray(
                predict(state.params, state.batch_stats, b)
            )[:, 0] * std + mean
            y = np.asarray(b.y)[:, 0] * std + mean
            m = np.asarray(b.node_mask)
            for yt, yp in zip(y[m], out[m]):
                errs.setdefault(int(round(yt)), []).append(abs(yp - yt))
        print("count  n      MAE")
        with open(log_path, "a") as f:
            for cval in sorted(errs):
                line = (
                    f"{cval:5d} {len(errs[cval]):6d} "
                    f"{float(np.mean(errs[cval])):.5f}"
                )
                print(line)
                f.write(line + "\n")


if __name__ == "__main__":
    main()
