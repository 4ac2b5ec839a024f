#!/usr/bin/env python
"""A/B: optax.flatten adam vs per-leaf adam on the bench step.

Round-4 hbm_measured found the flatten concatenate moving 42 MB at
270 GB/s for 155 us on OgbGNN (21% of its step) and 14 MB / 47 us on
the flagship. Flatten was adopted in r02 because the per-leaf update
chain was ~600 XLA ops/step; this A/B re-measures both forms end to
end, per model, on the chip. Usage: python tools/opt_ab.py [model...]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402


def run_cell(model_name, flatten, n_iter=50):
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "hbm_report",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "hbm_report.py"))
    hr = iu.module_from_spec(spec)
    spec.loader.exec_module(hr)
    graphs, bspec, model, loss_fn = hr.build(model_name)

    import jax
    import jax.numpy as jnp
    import optax

    from escgnn_tpu.data.batching import pad_and_batch
    from escgnn_tpu.train.loop import TrainState, make_train_step
    from escgnn_tpu.utils import setup_jax

    setup_jax()
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, bspec))
    variables = model.init(jax.random.key(0), batch)
    adam = optax.inject_hyperparams(optax.adam)(learning_rate=5e-4)
    opt = optax.flatten(adam) if flatten else adam
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}), opt
    )
    step = make_train_step(model, loss_fn)
    state, loss = step(state, batch, jax.random.key(1))
    float(loss)
    times, _, _, _ = B.scan_time(step, state, batch, jax.random.key(1),
                                 n_iter)
    ms = float(np.mean(times)) / n_iter * 1e3
    print(json.dumps(dict(model=model_name, flatten=flatten,
                          ms_per_step=round(ms, 4),
                          ms_std=round(float(np.std(times)) / n_iter * 1e3,
                                       4))), flush=True)
    return ms


def main():
    models = sys.argv[1:] or ["ogb", "flagship"]
    for m in models:
        a = run_cell(m, flatten=True)
        b = run_cell(m, flatten=False)
        print(json.dumps(dict(summary=m,
                              speedup_perleaf=round(a / b, 3))), flush=True)


if __name__ == "__main__":
    main()
