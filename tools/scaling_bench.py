#!/usr/bin/env python
"""Multi-device scaling measurement for the dp training path.

Measures edges/s of the flagship NestedGIN_eff dp epoch step
(`parallel.data_parallel.make_dp_pool_train_step`) at D = 1, 2, 4, ...
devices and reports scaling efficiency vs D=1 — the harness for the
BASELINE.json ">=90% multi-host scaling" north star (the reference's only
distribution is a DistributedSampler, `kernel/train_eval.py:44-52`, with
no scaling measurement at all).

On real multi-chip hardware this measures ICI scaling. On this dev setup
(one v5e via tunnel) run it on the CPU backend with virtual devices to
validate the harness and the collective overhead shape:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --steps 30

Output: one JSON line per device count
    {"metric": "dp_scaling", "devices": D, "edges_per_s": ..., "eff": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from escgnn_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np


def build_pool(batch_size: int, num_graphs: int, seed: int):
    from escgnn_tpu.data.batching import BatchSpec
    from escgnn_tpu.data.molecules import zinc_splits
    from escgnn_tpu.data.prefetch import stacked_batch_pools
    from escgnn_tpu.featurize.cache import cached_featurize
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many

    raw, _ = zinc_splits("data", num_graphs=num_graphs, seed=seed)
    ecfg = EscConfig(h=3, use_rd=True, self_loop=True)
    graphs = cached_featurize(
        "data/zinc", f"scaling_n{num_graphs}_s{seed}_{ecfg.cache_key()}",
        lambda: featurize_many(raw["train"], ecfg, num_workers=2),
    )
    spec = BatchSpec.uniform(graphs, batch_size, enc_layout="dedup")
    pools, n_batches, _ = stacked_batch_pools(graphs, spec, k=1, seed=seed)
    real_edges = float(sum(g.num_edges for g in graphs))
    return pools[0], n_batches, real_edges, spec, graphs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_graphs", type=int, default=1024)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=5)
    p.add_argument("--steps", type=int, default=50, help="timed scan steps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_devices", type=int, default=0)
    p.add_argument("--mode", default="dp", choices=["dp", "ep"],
                   help="dp = one batch per device per step (replicated "
                   "pool); ep = all devices cooperate on each batch "
                   "(edge arrays GSPMD-sharded over a 'model' axis)")
    args = p.parse_args()

    from escgnn_tpu.data.batching import batch_iterator
    from escgnn_tpu.models.nested_gin_eff import (
        NestedGINEff,
        NestedGINEffConfig,
    )
    from escgnn_tpu.parallel.data_parallel import (
        make_dp_pool_train_step,
        replicate_state,
    )
    from escgnn_tpu.parallel.edge_partition import (
        make_ep_pool_train_step,
        shard_pool_by_edges,
    )
    from escgnn_tpu.parallel.mesh import make_mesh, replicate
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        l1_graph_loss,
    )

    pool, n_batches, real_edges, spec, graphs = build_pool(
        args.batch_size, args.num_graphs, args.seed
    )
    edges_per_epoch = real_edges  # every batch appears once per epoch

    model = NestedGINEff(NestedGINEffConfig(
        hidden=args.hidden, num_layers=args.layers, graph_pred=True,
        pool="add", act="elu", use_x_embedding_jk=False,
        compute_dtype="bfloat16",
    ))
    init_b = jax.tree.map(
        jnp.asarray, next(batch_iterator(graphs[: args.batch_size], spec))
    )
    variables = model.init(jax.random.key(0), init_b)

    n_avail = len(jax.devices())
    if args.max_devices:
        n_avail = min(n_avail, args.max_devices)
    dev_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    metric = f"{args.mode}_scaling"
    base = None
    for D in dev_counts:
        if args.mode == "dp" and n_batches < D:
            print(json.dumps({
                "metric": metric, "devices": D,
                "skipped": f"only {n_batches} batches — raise --num_graphs",
            }))
            continue
        mesh = make_mesh(
            D, axis_names=("data",) if args.mode == "dp" else ("model",)
        )
        state = TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            adam_with_plateau(1e-3),
        )
        state = replicate_state(state, mesh)
        if args.mode == "dp":
            pool_d = replicate(pool, mesh)
            step = make_dp_pool_train_step(model, l1_graph_loss, mesh)
            order_np = (
                np.random.default_rng(0).permutation(n_batches)
                [: (n_batches // D) * D].reshape(-1, D)
            )
            steps = max(1, args.steps // max(1, n_batches // D))
        else:
            pool_d = shard_pool_by_edges(pool, mesh)
            step = make_ep_pool_train_step(
                model, l1_graph_loss, mesh, pool_d
            )
            order_np = np.random.default_rng(0).permutation(n_batches)
            steps = max(1, args.steps // max(1, n_batches))
        rng = jax.device_put(
            jax.random.key(0),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
        order = jnp.asarray(order_np, jnp.int32)

        # warmup (compile) then timed epochs; the scalar float() forces a
        # device sync even over the tunnel (block_until_ready does not)
        state, losses = step(state, pool_d, order, rng)
        float(jnp.sum(losses))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, losses = step(state, pool_d, order, rng)
        float(jnp.sum(losses))
        dt = time.perf_counter() - t0
        # each epoch-scan consumes order.shape[0]*D batches out of
        # n_batches total -> edge fraction processed per call
        frac = order_np.size / n_batches
        eps = edges_per_epoch * frac * steps / dt
        eff = 1.0 if base is None else eps / (base * D)
        if base is None:
            base = eps
        print(json.dumps({
            "metric": metric,
            "devices": D,
            "edges_per_s": round(eps, 1),
            "eff_vs_linear": round(eff, 4),
            "steps_per_epoch": int(order_np.shape[0]),
            "wall_s": round(dt, 3),
        }))


if __name__ == "__main__":
    main()
