#!/usr/bin/env python
"""A/B: copy-family batch layouts on the chip (VERDICT r03 #1).

Times the I2GNN and NGNN train steps on (a) the ragged union layout
(global XLA scatter-adds — profiled 15x off the HBM roofline,
results_archive/profile_i2gnn/) vs (b) the uniform per-copy block
layout (per-copy one-hot einsums + reshape pooling,
data/uniform_copies.py), each in f32 and bf16. Prints one JSON line per
cell plus a summary speedup line; archive the stdout as the A/B
artifact. Identical numerics locked by tests/test_uniform_copies.py."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402


def run_cell(model_name, graphs, layout, dtype, n_iter=50):
    import jax

    from escgnn_tpu.data.batching import BatchSpec
    from escgnn_tpu.data.uniform_copies import uniformize_dataset
    from escgnn_tpu.train.loop import l1_graph_loss

    real_edges = int(np.sum([g.num_edges for g in graphs]))
    transform = None
    if layout in ("blocked", "bucketed"):
        gs = uniformize_dataset(graphs)
        spec = BatchSpec.copy_uniform(gs, batch_size=len(gs), exact=True)
        if layout == "bucketed":
            # round-5 two-size bucketed blocks (the r04-identified
            # 1.76x block-padding lever); equality locked by
            # tests/test_bucketed_copies.py
            from escgnn_tpu.data.uniform_copies import (
                bucketize_copy_batch,
                choose_bucket_sizes,
            )

            n_s, e_s = choose_bucket_sizes(graphs)
            transform = lambda b: bucketize_copy_batch(b, n_s, e_s)  # noqa: E731
    else:
        gs = graphs
        spec = BatchSpec.from_graphs(gs, batch_size=len(gs))
    if model_name == "i2gnn":
        from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig

        model = I2GNN(I2GNNConfig(
            num_layers=3, hidden=64, use_rd=True,
            subgraph2_pooling="mean-center-side", gate=True, out_dim=1,
            compute_dtype=dtype,
        ))
    else:
        from escgnn_tpu.models.ngnn import NGNN, NGNNConfig

        model = NGNN(NGNNConfig(
            num_layers=5, hidden=64, use_rd=True, out_dim=1,
            compute_dtype=dtype,
        ))
    f = B.bench_model(model_name, gs, spec, model, l1_graph_loss, n_iter,
                      real_edges=real_edges, batch_transform=transform)
    rec = dict(model=model_name, layout=layout, dtype=dtype,
               padded_nodes=spec.num_nodes, padded_edges=spec.num_edges,
               **f)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    i2 = B.make_i2gnn_graphs(num=16)
    ng = B.make_ngnn_graphs(num=16)
    out = {}
    layouts = ("ragged", "blocked", "bucketed")
    if os.environ.get("AB_BUCKETED_ONLY") == "1":
        # fast mode for the round-5 bucketed A/B: skip the slow ragged
        # cells (their numbers are in results_archive/copy_layout_ab)
        layouts = ("blocked", "bucketed")
    for name, graphs in (("i2gnn", i2), ("ngnn", ng)):
        for layout in layouts:
            for dtype in (("bfloat16",) if layout == "bucketed"
                          and len(layouts) == 3 else ("float32", "bfloat16")):
                n = 20 if layout == "ragged" else 50
                out[(name, layout, dtype)] = run_cell(
                    name, graphs, layout, dtype, n_iter=n
                )
    for name in ("i2gnn", "ngnn"):
        blocked = out[(name, "blocked", "bfloat16")]["value"]
        summary = dict(summary=name)
        if (name, "ragged", "float32") in out:
            base = out[(name, "ragged", "float32")]["value"]
            summary["speedup_blocked_f32"] = round(
                out[(name, "blocked", "float32")]["value"] / base, 3
            )
            summary["speedup_blocked_bf16"] = round(blocked / base, 3)
        if (name, "bucketed", "bfloat16") in out:
            summary["speedup_bucketed_vs_blocked_bf16"] = round(
                out[(name, "bucketed", "bfloat16")]["value"] / blocked, 3
            )
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
