"""Flat PPGN_eff activation parity vs a ragged torch re-execution.

Companion to tests/test_torch_parity.py for PPGN_eff (reference
`run_graphcount.py:207-308`): the ESC per-edge encoding embedded through
the z MLP into the dense edge channel, RegularBlocks, diag/offdiag mean
pooling, node-level head — in exact-size float64 torch per graph with
the flax weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import esc_transform
from escgnn_tpu.models.ppgn import PPGN, PPGNConfig
from tests.conftest import random_graph

torch = pytest.importorskip("torch")

from tests.torch_ref import (  # noqa: E402  (after importorskip)
    abs_var as _abs_var,
    randomize as _randomize,
    t,
    t_bn,
    t_dense,
)

EMB = 8
RB = 1
DEPTH = 2


def mlp_block(x, p):
    for i in range(DEPTH):
        x = torch.relu(t_dense(x, p[f"conv{i}"]))
    return x


def regular_block(x, p):
    m1 = mlp_block(x, p["mlp1"])
    m2 = mlp_block(x, p["mlp2"])
    mult = torch.einsum("nmc,mkc->nkc", m1, m2)
    return t_dense(torch.cat([x, mult], dim=-1), p["skip"])


def torch_forward(g: GraphData, params, stats):
    n = g.num_nodes
    E = g.num_edges
    table = t(params["z_initial"])
    z = torch.zeros((E, EMB), dtype=torch.float64)
    for e in range(E):
        idx, cnt = g.enc_row(e)
        for i, c in zip(idx.tolist(), cnt.tolist()):
            z[e] += c * table[i]
    for i in range(2):
        z = t_dense(z, params[f"z_embedding_{i}"])
        z = torch.relu(t_bn(z, params[f"z_bn_{i}"], stats[f"z_bn_{i}"]))

    dense = torch.zeros((n, n, 2 + EMB), dtype=torch.float64)
    for e in range(E):
        a, b = int(g.edge_index[0, e]), int(g.edge_index[1, e])
        dense[a, b, 0] += 1.0
        dense[a, b, 1:1 + EMB] += z[e]
    # trailing diagonal channel stays zero (counting tasks)

    x = dense
    for i in range(RB):
        x = regular_block(x, params[f"rb{i}"])

    diag = torch.stack([x[i, i] for i in range(n)])  # (n, C)
    row = x.sum(dim=1)
    col = x.sum(dim=0)
    off = row + col - 2 * diag
    pooled = torch.cat([diag, off], dim=-1)  # node level, unnormalized

    h = torch.relu(t_dense(pooled, params["fc0"]))
    return t_dense(h, params["fc1"])


def test_ppgn_eff_activation_parity_vs_torch(rng):
    cfg_esc = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(3):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=np.ones((n, 3), np.float32),
            y=rng.normal(size=(n, 1)).astype(np.float32),
        )
        graphs.append(esc_transform(g, cfg_esc))

    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    model = PPGN(PPGNConfig(
        emb_dim=EMB, num_rb_layers=RB, depth_of_mlp=DEPTH,
        max_nodes=8, node_level=True, use_esc=True, out_dim=1,
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(19)
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
    got = out[np.asarray(batch.node_mask)]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
