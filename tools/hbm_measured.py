#!/usr/bin/env python
"""Measured DRAM picture of a bench model's scanned train step.

Joins (a) per-instruction device DURATIONS from a jax.profiler trace of
the scan-of-N dispatch (tools/profile_step.py) with (b) per-instruction
fusion-boundary BYTES of the same scan executable's while body
(utils/hbm.py). For each body fusion:

    implied_bw = boundary_bytes / (device_time / N)

A fusion whose implied BW exceeds the HBM peak (819 GB/s on v5e) is
getting its operands from VMEM — the boundary model overcounts it. The
honest per-step DRAM demand is bounded by

    dram_bytes <= sum_i min(bytes_i, dur_i * peak_bw)

and the HBM-bound time fraction is sum_i min(bytes_i/peak, dur_i) over
the step time. This is the analysis that turns "analytic frac > 1"
into a quantified VMEM-residency statement (BASELINE.md round-4
roofline verdicts).

Usage:
  python tools/hbm_measured.py /tmp/prof_flagship flagship [n_iter]
(The trace must already exist — run tools/profile_step.py first.)
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BW = 819e9


def trace_durations(trace_dir):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    dev_keys = {
        k for k, v in tnames.items()
        if "XLA Op" in v
        or ("TensorFlow Op" in v and "TPU" in pnames.get(k[0], ""))
    }
    if not dev_keys:
        dev_keys = {k for k, v in tnames.items()
                    if "TPU" in pnames.get(k[0], "") and "Op" in v}
    agg = {}
    for e in events:
        if e.get("ph") != "X" or (e["pid"], e.get("tid")) not in dev_keys:
            continue
        agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e6
    return agg  # name -> seconds across the whole trace


def body_bytes(model_name, n_iter):
    """(body instruction -> boundary bytes) of the scanned executable."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "hbm_report",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "hbm_report.py"))
    hr = iu.module_from_spec(spec)
    spec.loader.exec_module(hr)
    graphs, bspec, model, loss_fn = hr.build(model_name)

    import re
    from functools import partial

    import jax
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import pad_and_batch
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        make_train_step,
    )
    from escgnn_tpu.utils import setup_jax
    from escgnn_tpu.utils.hbm import _entry_block, boundary_traffic

    setup_jax()
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, bspec))
    variables = model.init(jax.random.key(0), batch)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(5e-4),
    )
    step = make_train_step(model, loss_fn)

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(state, batch, rng):
        def body(s, i):
            return step.__wrapped__(s, batch, jax.random.fold_in(rng, i))

        return jax.lax.scan(body, state, jnp.arange(n_iter))

    text = scan_steps.lower(state, batch, jax.random.key(1)) \
        .compile().as_text()
    m = re.search(r"\bwhile\(.*?body=%([\w.\-]+)", _entry_block(text))
    if m is None:
        raise SystemExit("no while body in scan executable")
    t = boundary_traffic(text, m.group(1))
    names = {}
    for mm in re.finditer(
        r"%([\w.\-]+) = .*metadata=\{[^}]*op_name=\"([^\"]+)\"", text
    ):
        names.setdefault(mm.group(1), mm.group(2))
    t["op_names"] = names
    return {name: rb + wb for name, _, rb, wb in t["per_instruction"]}, t


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_flagship"
    model_name = sys.argv[2] if len(sys.argv) > 2 else "flagship"
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    durs = trace_durations(trace_dir)
    bb, traffic = body_bytes(model_name, n_iter)

    total_dev_s = sum(durs.values())
    rows, dram_upper, matched_bytes, matched_s = [], 0.0, 0, 0.0
    for name, sec in durs.items():
        per_iter_s = sec / n_iter
        b = bb.get(name)
        if b is None:
            continue
        matched_bytes += b
        matched_s += per_iter_s
        implied = b / max(per_iter_s, 1e-12)
        dram = min(float(b), per_iter_s * PEAK_BW)
        dram_upper += dram
        rows.append((name, b, per_iter_s, implied, dram))
    rows.sort(key=lambda r: -r[2])

    print(json.dumps(dict(
        model=model_name,
        n_iter=n_iter,
        device_s_per_iter=total_dev_s / n_iter,
        matched_instr=len(rows),
        matched_bytes_per_iter=matched_bytes,
        matched_s_per_iter=matched_s,
        boundary_bytes_per_iter=sum(bb.values()),
        dram_bytes_upper_per_iter=int(dram_upper),
        dram_frac_of_step=round(
            dram_upper / PEAK_BW / max(total_dev_s / n_iter, 1e-12), 4),
    )))
    op_names = traffic.get("op_names", {})
    for name, b, s, implied, dram in rows[:25]:
        print(json.dumps(dict(
            instr=name, bytes=b, us=round(s * 1e6, 1),
            implied_gbps=round(implied / 1e9, 1),
            vmem_fed=bool(implied > 1.1 * PEAK_BW),
            op_name=op_names.get(name, "")[:160],
        )))


if __name__ == "__main__":
    main()
