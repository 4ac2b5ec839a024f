"""NestedPPGN activation parity vs a ragged torch re-execution.

Companion to tests/test_torch_parity.py for the two-level dense PPGN
(reference `kernel/ppgn.py:21-240`): a PPGN over every node-rooted
subgraph copy at its EXACT size, max+mean+min diag/offdiag pooling into
per-subgraph embeddings, then a second PPGN at graph level over the
original adjacency — all in float64 torch with no padding, using the
flax weights; the padded/masked JAX forward must match.
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
from escgnn_tpu.models.nested_ppgn import NestedPPGN, NestedPPGNConfig
from tests.conftest import random_graph

torch = pytest.importorskip("torch")

from tests.torch_ref import (  # noqa: E402  (after importorskip)
    abs_var as _abs_var,
    randomize as _randomize,
    t,
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


def pool_diag_offdiag(x):
    """(n, n, C) -> (2C,): max+mean+min of diag and offdiag entries,
    empty offdiag (n == 1) pools to 0."""
    n = x.shape[0]
    diag = torch.stack([x[i, i] for i in range(n)])
    off_mask = ~torch.eye(n, dtype=torch.bool)
    total = torch.zeros(2 * x.shape[-1], dtype=torch.float64)
    for op in ("max", "mean", "min"):
        d = getattr(diag, op if op != "mean" else "mean")(dim=0)
        d = d[0] if isinstance(d, tuple) else d
        if n > 1:
            offv = x[off_mask]  # (n^2 - n, C)
            o = getattr(offv, op if op != "mean" else "mean")(dim=0)
            o = o[0] if isinstance(o, tuple) else o
        else:
            o = torch.zeros(x.shape[-1], dtype=torch.float64)
        total = total + torch.cat([d, o])
    return total


def torch_forward(big: GraphData, params):
    ex = big.extras
    seg = np.asarray(ex["node_to_subgraph"], np.int64)
    S = int(ex["num_subgraphs"])
    adj = np.asarray(ex["orig_adj"], np.float64)
    K = adj.shape[0]

    z = np.asarray(ex["z"], np.int64)
    zt = t(params["z_embedding"]["embedding"])[z].sum(dim=1)
    zt = zt + t_dense(t(np.asarray(ex["rd"], np.float64)),
                      params["rd_projection"])
    x = torch.cat([zt, t(big.x).reshape(len(zt), -1)], dim=-1)

    senders = np.asarray(big.edge_index[0], np.int64)
    receivers = np.asarray(big.edge_index[1], np.int64)

    hs = []
    for s in range(S):
        nodes = np.flatnonzero(seg == s)
        loc = {int(n): i for i, n in enumerate(nodes)}
        ns = len(nodes)
        C_e = 1  # edge channels: [exists] (fixture has no edge_attr)
        dense = torch.zeros((ns, ns, C_e + x.shape[1]), dtype=torch.float64)
        for a, b in zip(senders, receivers):
            if seg[b] == s:
                dense[loc[int(a)], loc[int(b)], 0] += 1.0
        for i, n in enumerate(nodes):
            dense[i, i, C_e:] = x[int(n)]
        zb = dense
        for i in range(RB):
            zb = regular_block(zb, params[f"rb{i}"])
        pooled = pool_diag_offdiag(zb)
        h = torch.relu(t_dense(pooled, params["fc_g0"]))
        h = torch.relu(t_dense(h, params["fc_g1"]))
        hs.append(h)
    h = torch.stack(hs)  # (S, EMB)

    zg = torch.zeros((K, K, 1 + EMB), dtype=torch.float64)
    zg[:, :, 0] = t(adj)
    for s in range(S):
        zg[s, s, 1:] = h[s]
    for i in range(RB):
        zg = regular_block(zg, params[f"rb_g{i}"])
    pooled = pool_diag_offdiag(zg)
    out = torch.relu(t_dense(pooled, params["fc0"]))
    return t_dense(out, params["fc1"])[None, :]


def test_nested_ppgn_activation_parity_vs_torch(rng):
    cfg_sub = NodeSubgraphConfig(h=2, use_rd=True, keep_orig_adj=True)
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=6)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 5, n).astype(np.int32)[:, None],
            y=np.asarray([rng.integers(0, 2)], np.int64),
        )
        graphs.append(create_node_subgraphs(g, cfg_sub))

    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    model = NestedPPGN(NestedPPGNConfig(
        emb_dim=EMB, num_rb_layers=RB, depth_of_mlp=DEPTH, num_tasks=2,
        use_z=True, use_rd=True, graph_pred=True, classify=False,
        max_nodes_per_subgraph=8,
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(13)
    params = _randomize(variables["params"], nprng)

    out = np.asarray(model.apply({"params": params}, batch))

    p_np = jax.tree.map(np.asarray, params)
    want = np.concatenate(
        [torch_forward(g, p_np).numpy() for g in graphs]
    )
    got = out[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
