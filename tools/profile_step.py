#!/usr/bin/env python
"""Device-op profile of the flagship train step (bench.py shapes).

Runs one scan-of-50-steps dispatch under jax.profiler, then parses the
trace-viewer JSON and prints per-op device time aggregated by op name,
descending. This is the tool that localizes step time on the chip
(wall-clock ablation over the tunnel is noisy; the trace is exact).

Usage:  python tools/profile_step.py [trace_dir]   (default /tmp/prof)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(trace_dir: str, top: int = 40) -> None:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        print(f"no trace under {trace_dir}", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    # device op lanes: TPU core XLA op threads (not host threads)
    dev_keys = {
        k
        for k, v in tnames.items()
        if "XLA Op" in v or ("TensorFlow Op" in v and "TPU" in pnames.get(k[0], ""))
    }
    if not dev_keys:
        dev_keys = {
            k
            for k, v in tnames.items()
            if "TPU" in pnames.get(k[0], "") and "Op" in v
        }
    agg: dict[str, list[float]] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e["pid"], e.get("tid")) not in dev_keys:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        total += dur
        # collapse fusion instance suffixes: fusion.123 -> fusion
        name = re.sub(r"\.\d+$", "", e["name"])
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += dur
        agg[name][1] += 1
    print(f"device total: {total:.3f} ms across trace")
    print(f"{'ms':>9}  {'%':>5}  {'n':>5}  op")
    for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{ms:9.3f}  {100 * ms / max(total, 1e-9):5.1f}  {n:5d}  {name}")


def run_and_profile(trace_dir: str, which: str = "flagship") -> None:
    """Build the bench.py shapes for `which` (flagship | ogb | gps |
    ppgn | i2gnn), trace one scan-of-50 dispatch, and summarize — the
    per-model localization tool behind the round-3 OgbGNN speedups."""
    import bench

    # featurize (fork pools) BEFORE importing jax (see bench.main)
    if which == "flagship":
        graphs = bench.make_zinc_like_graphs(num=128)
    elif which == "ogb":
        graphs = bench.make_molhiv_like_graphs(num=32)
    elif which == "gps":
        from escgnn_tpu.featurize.spd import attach_attn_bias

        graphs = [attach_attn_bias(g)
                  for g in bench.make_zinc_like_graphs(num=32, h=3)]
    elif which == "ppgn":
        graphs = bench.make_counting_graphs(num=128)
    elif which == "i2gnn":
        graphs = bench.make_i2gnn_graphs(num=16)
    else:
        raise SystemExit(f"unknown model {which!r}")

    import jax
    from escgnn_tpu.utils import setup_jax

    setup_jax()
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        bce_graph_loss,
        l1_graph_loss,
        l1_node_loss,
        make_train_step,
    )

    loss_fn = l1_graph_loss
    if which == "flagship":
        spec = BatchSpec.uniform(graphs, 128, enc_layout="dedup")
        model = NestedGINEff(
            NestedGINEffConfig(
                hidden=256, num_layers=5, dropout=0.0, act="elu",
                graph_pred=True, pool="add", use_x_embedding_jk=False,
                head_order="dropout_act", node_embed_vocab=100,
                node_embed_dim=32, edge_embed_vocab=100, edge_embed_dim=32,
                compute_dtype="bfloat16",
            )
        )
    elif which == "ogb":
        from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig

        spec = BatchSpec.uniform(graphs, len(graphs), enc_layout="dedup")
        model = OgbGNN(OgbGNNConfig(
            num_tasks=1, num_layers=6, emb_dim=300, dropout=0.0,
            virtual_node=True, compute_dtype="bfloat16",
        ))
        loss_fn = bce_graph_loss
    elif which == "gps":
        from escgnn_tpu.models.gps import GPSConfig, GPSModel

        spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
        model = GPSModel(GPSConfig(
            dim_h=64, num_layers=4, num_heads=4, use_esc=True,
            use_attn_bias=True, pool="add", out_dim=1,
        ))
    elif which == "ppgn":
        from escgnn_tpu.models.ppgn import PPGN, PPGNConfig

        spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
        model = PPGN(PPGNConfig(
            emb_dim=128, num_rb_layers=3,
            max_nodes=spec.max_nodes_per_graph, node_level=True,
            use_esc=True, compute_dtype="bfloat16",  # parity with bench
        ))
        loss_fn = l1_node_loss
    else:
        from escgnn_tpu.data.uniform_copies import uniformize_dataset
        from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig

        graphs = uniformize_dataset(graphs)
        spec = BatchSpec.copy_uniform(graphs, batch_size=len(graphs),
                                      exact=True)
        model = I2GNN(I2GNNConfig(
            num_layers=3, hidden=64, use_rd=True,
            subgraph2_pooling="mean-center-side", gate=True, out_dim=1,
            compute_dtype="bfloat16",  # parity with bench r04
        ))

    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    real_edges = int(np.sum([g.num_edges for g in graphs]))
    rng = jax.random.key(0)
    variables = model.init(rng, batch)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(5e-4),
    )
    step = make_train_step(model, loss_fn)

    n_iter = 50

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(state, batch, rng):
        def body(s, i):
            return step.__wrapped__(s, batch, jax.random.fold_in(rng, i))

        return jax.lax.scan(body, state, jnp.arange(n_iter))

    state, losses = scan_steps(state, batch, rng)
    float(losses[-1])  # compile + warm
    with jax.profiler.trace(trace_dir):
        state, losses = scan_steps(state, batch, rng)
        float(losses[-1])
    print(f"real edges/step: {real_edges}; {n_iter} steps traced")


if __name__ == "__main__":
    # usage: profile_step.py [trace_dir] [flagship|ogb|gps|ppgn|i2gnn]
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    which = sys.argv[2] if len(sys.argv) > 2 else "flagship"
    if os.environ.get("PROFILE_PARSE_ONLY") != "1":
        run_and_profile(trace_dir, which)
    summarize(trace_dir)
