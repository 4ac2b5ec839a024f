#!/usr/bin/env python
"""A/B: flagship byte-reduction lever (VERDICT r04 #9).

The round-4 roofline verdict caps NestedGIN_eff at ~0.235 MFU at its
current dataflow (measured 0.196 = 84% of that ceiling); the remaining
levers are narrower boundary values, not scheduling. The biggest
optimizer-side boundary values are Adam's f32 moment vectors (~14 MB
each, round-tripped every step inside the flatten update alongside the
14 MB gradient concatenate at 304 GB/s, concatenate.38 in
results_archive/hbm_measured/hbm_measured_flagship.txt.gz).

Cells: (a) baseline f32 moments, (b) `mu_dtype=bfloat16` (optax stores
the FIRST moment bf16 — second moment has no dtype knob in optax's
adam). Saves ~14 MB/step of DRAM round trip if it helps; a wash closes
the lever like the optimizer-flatten A/B (results_archive/opt_ab).

Numerics note: bf16 mu changes optimizer arithmetic (not an equality
transform) — a counting quality re-check gates any adoption.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.train.loop import TrainState, make_train_step

    graphs = B.make_zinc_like_graphs(num=128)
    spec = B.flagship_spec(graphs)
    model = B.flagship_model()
    from escgnn_tpu.train.loop import l1_graph_loss

    real_edges = int(np.sum([g.num_edges for g in graphs]))
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    for mu_dtype in (None, jnp.bfloat16):
        # no inject_hyperparams here: it would trace mu_dtype as a
        # hyperparameter (unhashable); the A/B needs no LR control
        tx = optax.flatten(optax.adam(5e-4, mu_dtype=mu_dtype))
        variables = model.init(jax.random.key(0), batch)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}), tx
        )
        step = make_train_step(model, l1_graph_loss)
        state, loss = step(state, batch, jax.random.key(1))
        float(loss)
        times, state, _, _ = B.scan_time(
            step, state, batch, jax.random.key(1), 50
        )
        mean_t = float(np.mean(times))
        print(json.dumps(dict(
            cell="mu_bf16" if mu_dtype is not None else "baseline_f32",
            ms_per_step=round(mean_t / 50 * 1e3, 4),
            edges_per_s=round(real_edges * 50 / mean_t, 1),
            windows=len(times),
        )), flush=True)


if __name__ == "__main__":
    main()
