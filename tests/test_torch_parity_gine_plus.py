"""GINE+ activation parity vs a ragged torch re-execution.

Companion to tests/test_torch_parity.py for GINE+ (reference
`modules/gine_operations.py:108-253`): per-distance eps history mixing
over the multihop edge list, ConvBlock BN/ReLU, virtual-node broadcast +
add-pool MLP update, mean pooling + head — in float64 torch with real
edge lists and the flax weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.multihop import make_multihop_edges
from escgnn_tpu.models.gine_plus import GINEPlusConfig, GINEPlusNetwork
from tests.conftest import random_graph

torch = pytest.importorskip("torch")

from tests.torch_ref import (  # noqa: E402  (after importorskip)
    abs_var as _abs_var,
    randomize as _randomize,
    t,
    t_bn,
    t_dense,
)

F = 8
LAYERS = 2
K = 3


def t_featsum(feats, p):
    out = torch.zeros((feats.shape[0], F), dtype=torch.float64)
    for i in range(feats.shape[1]):
        out += t(p[f"emb_{i}"]["embedding"])[feats[:, i].astype(np.int64)]
    return out


def torch_forward(g: GraphData, params, stats):
    dist = np.asarray(g.extras["edge_distance"], np.int64).reshape(-1)
    senders = np.asarray(g.edge_index[0], np.int64)
    receivers = np.asarray(g.edge_index[1], np.int64)

    h = t_featsum(np.asarray(g.x), params["atom_encoder"])
    vn = t(params["v0"])

    xx = [h]
    for layer in range(LAYERS):
        last = layer == LAYERS - 1
        xx[0] = xx[0] + vn
        bond = t_featsum(np.asarray(g.edge_attr),
                         params[f"bond_encoder_{layer}"])
        cp, cs = params[f"conv{layer}"], stats[f"conv{layer}"]
        k = min(layer + 1, K)
        eps = np.asarray(cp["eps"], np.float64)  # (k+1, F)
        agg = torch.zeros_like(xx[0])
        for e in range(len(dist)):
            d = int(dist[e])
            if not 1 <= d <= k:
                continue
            msg = xx[d - 1][senders[e]]
            if d == 1:
                msg = msg + bond[e]
            agg[receivers[e]] += torch.relu(msg) * t(1.0 + eps[d])
        x = t(1.0 + eps[0]) * xx[0] + agg
        x = t_dense(x, cp["mlp_0"])
        x = torch.relu(t_bn(x, cp["mlp_bn"], cs["mlp_bn"]))
        x = t_dense(x, cp["mlp_1"])
        x = t_bn(x, params[f"norm{layer}"], stats[f"norm{layer}"])
        if not last:
            x = torch.relu(x)
        if not last:
            v = vn + x.sum(dim=0)
            v = t_dense(v, params[f"vn_mlp0_{layer}"])
            v = torch.relu(t_bn(v[None], params[f"vn_bn0_{layer}"],
                                stats[f"vn_bn0_{layer}"]))[0]
            v = t_dense(v, params[f"vn_mlp1_{layer}"])
            v = torch.relu(t_bn(v[None], params[f"vn_bn1_{layer}"],
                                stats[f"vn_bn1_{layer}"]))[0]
            vn = v
        xx = [x] + xx

    g_emb = xx[0].mean(dim=0, keepdim=True)
    return t_dense(g_emb, params["head"])


def test_gine_plus_activation_parity_vs_torch(rng):
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 2, (n, 9)).astype(np.int32),
            edge_attr=rng.integers(0, 2, (ei.shape[1], 3)).astype(np.int32),
            y=np.asarray([1.0], np.float32),
        )
        graphs.append(make_multihop_edges(g, k=K))

    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    model = GINEPlusNetwork(GINEPlusConfig(
        hidden=F, out_dim=2, num_layers=LAYERS, dropout=0.0, k=K,
        virtual_node=True, nested=False, atom_encoder=True,
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(23)
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
