#!/usr/bin/env python
"""Per-fusion HBM traffic report for a bench model's train step.

Compiles the same jitted train step bench.py times, then prints the
fusion-boundary traffic total (utils/hbm.py) and the top-N
byte-moving entry instructions with their op_name metadata — the
"where do the bytes go" table behind each BASELINE.md roofline
verdict. Pure compile + HLO-text analysis: no steps are executed, so
it is safe to run while a training job owns the chip only if the
backend tolerates a second client — prefer running it from a queue.

Usage: python tools/hbm_report.py [flagship|i2gnn|ngnn|gps|ppgn] [topN]
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402
from escgnn_tpu.utils.hbm import boundary_traffic  # noqa: E402


def build(model_name):
    from escgnn_tpu.data.batching import BatchSpec
    from escgnn_tpu.train.loop import l1_graph_loss, l1_node_loss

    if model_name == "flagship":
        graphs = B.make_zinc_like_graphs(num=128)
        spec = BatchSpec.uniform(graphs, 128, enc_layout="dedup")
        from escgnn_tpu.models.nested_gin_eff import (
            NestedGINEff,
            NestedGINEffConfig,
        )

        model = NestedGINEff(NestedGINEffConfig(
            hidden=256, num_layers=5, dropout=0.0, act="elu",
            graph_pred=True, pool="add", use_x_embedding_jk=False,
            head_order="dropout_act", node_embed_vocab=100,
            node_embed_dim=32, edge_embed_vocab=100, edge_embed_dim=32,
            compute_dtype="bfloat16",
        ))
    elif model_name == "i2gnn":
        from escgnn_tpu.data.uniform_copies import uniformize_dataset
        from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig

        graphs = uniformize_dataset(B.make_i2gnn_graphs(num=16))
        spec = BatchSpec.copy_uniform(graphs, batch_size=len(graphs),
                                      exact=True)
        model = I2GNN(I2GNNConfig(
            num_layers=3, hidden=64, use_rd=True,
            subgraph2_pooling="mean-center-side", gate=True, out_dim=1,
            compute_dtype="bfloat16",
        ))
    elif model_name == "ngnn":
        from escgnn_tpu.data.uniform_copies import uniformize_dataset
        from escgnn_tpu.models.ngnn import NGNN, NGNNConfig

        graphs = uniformize_dataset(B.make_ngnn_graphs(num=16))
        spec = BatchSpec.copy_uniform(graphs, batch_size=len(graphs),
                                      exact=True)
        model = NGNN(NGNNConfig(num_layers=5, hidden=64, use_rd=True,
                                out_dim=1, compute_dtype="bfloat16"))
    elif model_name == "ppgn":
        graphs = B.make_counting_graphs(num=128)
        spec = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
        from escgnn_tpu.models.ppgn import PPGN, PPGNConfig

        model = PPGN(PPGNConfig(
            emb_dim=128, num_rb_layers=3,
            max_nodes=spec.max_nodes_per_graph, node_level=True,
            use_esc=True, compute_dtype="bfloat16",
        ))
        return graphs, spec, model, l1_node_loss
    elif model_name == "ogb":
        from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig
        from escgnn_tpu.train.loop import bce_graph_loss

        graphs = B.make_molhiv_like_graphs(num=32)
        spec = BatchSpec.uniform(graphs, batch_size=len(graphs),
                                 enc_layout="dedup")
        model = OgbGNN(OgbGNNConfig(
            num_tasks=1, num_layers=6, emb_dim=300, dropout=0.0,
            virtual_node=True, compute_dtype="bfloat16",
        ))
        return graphs, spec, model, bce_graph_loss
    else:
        raise SystemExit(f"unknown model {model_name}")
    return graphs, spec, model, l1_graph_loss


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    graphs, spec, model, loss_fn = build(model_name)

    import jax
    import jax.numpy as jnp

    from escgnn_tpu.data.batching import pad_and_batch
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        make_train_step,
    )
    from escgnn_tpu.utils import setup_jax

    setup_jax()
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    variables = model.init(jax.random.key(0), batch)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(5e-4),
    )
    step = make_train_step(model, loss_fn)
    compiled = step.lower(state, batch, jax.random.key(1)).compile()
    text = compiled.as_text()
    t = boundary_traffic(text)

    # op_name metadata per instruction (human-readable provenance)
    names = {}
    for m in re.finditer(
        r"%([\w.\-]+) = .*metadata=\{[^}]*op_name=\"([^\"]+)\"", text
    ):
        names.setdefault(m.group(1), m.group(2))

    print(json.dumps(dict(
        model=model_name,
        boundary_bytes=t["bytes"],
        reads=t["reads"],
        writes=t["writes"],
    )))
    for name, opcode, rb, wb in t["per_instruction"][:top_n]:
        print(json.dumps(dict(
            instr=name, opcode=opcode, read=rb, write=wb,
            pct=round(100.0 * (rb + wb) / max(t["bytes"], 1), 2),
            op_name=names.get(name, "")[:160],
        )))


if __name__ == "__main__":
    main()
