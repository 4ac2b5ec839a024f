#!/usr/bin/env python
"""A/B: PPGN_eff pooling levers on the chip (VERDICT r04 #1).

Round-4 baseline (BENCH_r04): 12.8 ms/step, with the pooling's forward
reduce fusion burning 1.28 ms at 68 GB/s (87 MB — the f32-cast grid).
Cells at the exact bench config (emb 128, 3 RB, bf16, node-level,
counting shapes):

  * xla     — round-5 diag_offdiag_meanpool (bf16 reads, f32
              accumulation; numerically identical to the old
              cast-first math, tests/test_ppgn_pool.py)
  * pallas  — ops/ppgn_pool.py one-pass diag/row/col kernel

Compare ms_per_step against BENCH_r04's 12.8 to judge both levers;
archive stdout as the artifact either way.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402


def main():
    from escgnn_tpu.data.batching import BatchSpec
    from escgnn_tpu.models.ppgn import PPGN, PPGNConfig
    from escgnn_tpu.train.loop import l1_node_loss

    graphs = B.make_counting_graphs() if hasattr(B, "make_counting_graphs") \
        else None
    if graphs is None:
        gsets = B.make_graph_sets()
        graphs = gsets["counting"]
    spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    for impl in ("xla", "pallas"):
        model = PPGN(PPGNConfig(
            emb_dim=128, num_rb_layers=3,
            max_nodes=spec.max_nodes_per_graph, node_level=True,
            use_esc=True, compute_dtype="bfloat16", pool_impl=impl,
        ))
        f = B.bench_model("ppgn_" + impl, graphs, spec, model,
                          l1_node_loss, 50, node_level=True)
        print(json.dumps(dict(cell=impl, **{
            k: f[k] for k in ("ms_per_step", "ms_per_step_std", "value",
                              "mfu", "windows")
        })), flush=True)


if __name__ == "__main__":
    main()
