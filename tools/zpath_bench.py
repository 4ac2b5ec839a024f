#!/usr/bin/env python
"""A/B bench of the z-path implementations on the flagship train step.

Times the bench.py workload under:
  expand={kernel|xla}   x   zemb={countmat|countmat_pallas}

Run on the chip (no args). The winner should become the default.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench

    graphs = bench.make_zinc_like_graphs(num=128)

    import jax
    from escgnn_tpu.utils import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
    from escgnn_tpu.ops import zemb
    from escgnn_tpu.train.loop import (
        TrainState, adam_with_plateau, l1_graph_loss, make_train_step,
    )

    spec = BatchSpec.uniform(graphs, 128, enc_layout="dedup")
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    real_edges = int(np.sum([g.num_edges for g in graphs]))

    def run(expand_kernel: bool, impl: str):
        saved = zemb._EXPAND_KERNEL_VMEM_BYTES
        zemb._EXPAND_KERNEL_VMEM_BYTES = (6 * 2**20) if expand_kernel else 0
        zemb.set_impl(impl)
        try:
            model = NestedGINEff(NestedGINEffConfig(
                hidden=256, num_layers=5, dropout=0.0, act="elu",
                graph_pred=True, pool="add", use_x_embedding_jk=False,
                head_order="dropout_act", node_embed_vocab=100,
                node_embed_dim=32, edge_embed_vocab=100, edge_embed_dim=32,
                compute_dtype="bfloat16",
            ))
            rng = jax.random.key(0)
            v = model.init(rng, batch)
            state = TrainState.create(
                v["params"], v.get("batch_stats", {}), adam_with_plateau(5e-4)
            )
            step = make_train_step(model, l1_graph_loss)
            n_iter = 50

            @partial(jax.jit, donate_argnums=(0,))
            def scan_steps(state, batch, rng):
                def body(s, i):
                    return step.__wrapped__(s, batch, jax.random.fold_in(rng, i))
                return jax.lax.scan(body, state, jnp.arange(n_iter))

            state, losses = scan_steps(state, batch, rng)
            float(losses[-1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                state, losses = scan_steps(state, batch, rng)
                float(losses[-1])
                best = min(best, time.perf_counter() - t0)
            dt = best / n_iter
            print(
                f"expand={'kernel' if expand_kernel else 'xla':6s} "
                f"zemb={impl:15s}: {dt * 1e3:6.3f} ms/step "
                f"({real_edges / dt / 1e6:.2f} M edges/s) "
                f"loss={float(losses[-1]):.4f}",
                flush=True,
            )
        finally:
            zemb._EXPAND_KERNEL_VMEM_BYTES = saved
            zemb.set_impl("countmat")

    for expand_kernel in (False, True):
        for impl in ("countmat", "countmat_pallas"):
            run(expand_kernel, impl)


if __name__ == "__main__":
    main()
