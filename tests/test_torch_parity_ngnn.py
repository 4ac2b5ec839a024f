"""NGNN activation parity vs a ragged torch re-execution.

Companion to tests/test_torch_parity.py for NGNN (reference
`zinc_models.py:306-405`): per-layer z embeddings + rd projection,
edge-type GIN conv, BN/ELU/residual, two-level mean pooling
(node -> subgraph copy -> graph) — in float64 torch from the node-copy
transform's ragged arrays with the flax weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.models.ngnn import NGNN, NGNNConfig
from tests.conftest import random_graph

torch = pytest.importorskip("torch")

from tests.torch_ref import (  # noqa: E402  (after importorskip)
    abs_var as _abs_var,
    randomize as _randomize,
    t,
    t_bn,
    t_dense,
)

LAYERS = 2
HIDDEN = 8
NTD = 4


def torch_forward(big: GraphData, params, stats):
    ex = big.extras
    z = np.asarray(ex["z"], np.int64)
    rd = np.asarray(ex["rd"], np.float64)
    seg = torch.tensor(np.asarray(ex["node_to_subgraph"], np.int64))
    S = int(ex["num_subgraphs"])

    xt = t(params["node_type_embedding"]["embedding"])[
        np.asarray(big.x[:, 0], np.int64)
    ]
    h = torch.cat([xt, t(big.x).reshape(len(xt), -1)], dim=-1)

    senders = torch.tensor(np.asarray(big.edge_index[0], np.int64))
    receivers = torch.tensor(np.asarray(big.edge_index[1], np.int64))
    etype = np.asarray(big.edge_attr, np.int64).reshape(-1)

    h_prev = None
    for layer in range(LAYERS):
        zt = t(params[f"z_embedding_{layer}"]["embedding"])[z].sum(dim=1)
        ze = zt + t_dense(t(rd), params[f"rd_projection_{layer}"])
        hc = torch.cat([h, ze], dim=-1)
        cp, cs = params[f"conv{layer}"], stats[f"conv{layer}"]
        e = t(cp["edge_encoder"]["embedding"])[etype]
        msg = torch.relu(hc[senders] + e)
        agg = torch.zeros_like(hc).index_add_(0, receivers, msg)
        x = (1.0 + float(np.asarray(cp["eps"]))) * hc + agg
        x = t_dense(x, cp["mlp_0"])
        x = torch.relu(t_bn(x, cp["mlp_bn"], cs["mlp_bn"]))
        x = t_dense(x, cp["mlp_1"])
        x = t_bn(x, params[f"norm{layer}"], stats[f"norm{layer}"])
        x = torch.nn.functional.elu(x)
        if layer > 0:
            x = x + h_prev
        h_prev = x
        h = x

    sub = torch.zeros((S, h.shape[1]), dtype=torch.float64)
    sub.index_add_(0, seg, h)
    cnt = torch.zeros(S, dtype=torch.float64)
    cnt.index_add_(0, seg, torch.ones(len(h), dtype=torch.float64))
    sub = sub / cnt.clamp(min=1.0)[:, None]
    g = sub.mean(dim=0, keepdim=True)

    g = torch.nn.functional.elu(t_dense(g, params["fc1"]))
    g = torch.nn.functional.elu(t_dense(g, params["fc2"]))
    return t_dense(g, params["fc3"])


def test_ngnn_activation_parity_vs_torch(rng):
    cfg_sub = NodeSubgraphConfig(h=2, use_rd=True)
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 10, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        graphs.append(create_node_subgraphs(g, cfg_sub))

    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    model = NGNN(NGNNConfig(
        num_layers=LAYERS, hidden=HIDDEN, node_type_dim=NTD,
        use_rd=True, subgraph_pooling="mean", residual=True, out_dim=1,
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(17)
    params = _randomize(variables["params"], nprng)
    stats = _abs_var(_randomize(variables["batch_stats"], nprng))

    out = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, batch,
        deterministic=True, use_running_average=True,
    ))

    p_np = jax.tree.map(np.asarray, params)
    s_np = jax.tree.map(np.asarray, stats)
    want = np.concatenate(
        [torch_forward(g, p_np, s_np).numpy() for g in graphs]
    )
    got = out[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
