"""GPS layer activation parity vs a ragged torch re-execution.

Companion to tests/test_torch_parity.py for the GPS stack (reference
`GraphGPS/graphgps/layer/gps_layer.py`): per-layer ESC injection into
edge features, GINE local MPNN, dense multi-head attention with the SPD
bias, BN residual norms, feed-forward — re-executed per graph in float64
torch with real edge lists and the flax weights; the padded/masked JAX
forward must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.spd import attach_attn_bias
from escgnn_tpu.featurize.transform import esc_transform
from escgnn_tpu.models.gps import GPSConfig, GPSModel
from tests.conftest import random_graph

torch = pytest.importorskip("torch")

from tests.torch_ref import (  # noqa: E402  (after importorskip)
    abs_var as _abs_var,
    randomize as _randomize,
    t,
    t_bn,
    t_dense,
    t_mlp,
)

D = 8
HEADS = 2


def torch_forward(g: GraphData, params, stats):
    n = g.num_nodes
    h = t(params["node_encoder"]["embedding"])[
        np.asarray(g.x[:, 0], np.int64)
    ]
    e = t(params["edge_encoder"]["embedding"])[
        np.asarray(g.edge_attr, np.int64).reshape(-1)
    ]
    lp, ls = params["layer0"], stats["layer0"]

    # per-layer ESC injection
    E = g.num_edges
    table = t(lp["z_initial"])
    z_raw = torch.zeros((E, D), dtype=torch.float64)
    for ei in range(E):
        idx, cnt = g.enc_row(ei)
        for i, c in zip(idx.tolist(), cnt.tolist()):
            z_raw[ei] += c * table[i]
    z = t_mlp(z_raw, lp["z_embedding"], ls["z_embedding"],
              pre_act=True, act=torch.nn.functional.elu)
    e = e + z

    senders = torch.tensor(np.asarray(g.edge_index[0], np.int64))
    receivers = torch.tensor(np.asarray(g.edge_index[1], np.int64))

    # GINE local
    ee = t_dense(e, lp["local_gine"]["lin_edge"])
    msg = torch.relu(h[senders] + ee)
    agg = torch.zeros_like(h).index_add_(0, receivers, msg)
    x = (1.0 + float(np.asarray(lp["local_gine"]["eps"]))) * h + agg
    h_local = t_mlp(x, lp["MLP_0"], ls["MLP_0"], pre_act=False,
                    act=torch.relu)
    h_local = h + h_local
    h_local = t_bn(h_local, lp["norm1_local"], ls["norm1_local"])

    # dense attention with SPD bias
    ap = lp["self_attn"]
    hd = D // HEADS
    q = t_dense(h, ap["q"]).reshape(n, HEADS, hd)
    k = t_dense(h, ap["k"]).reshape(n, HEADS, hd)
    v = t_dense(h, ap["v"]).reshape(n, HEADS, hd)
    logits = torch.einsum("mhd,nhd->hmn", q, k) / np.sqrt(hd)
    spd = np.asarray(g.extras["attn_bias"], np.int64)[:n, :n]
    spd = np.clip(spd, 0, ap["spd_bias"]["embedding"].shape[0] - 1)
    bias = t(ap["spd_bias"]["embedding"])[spd]  # (n, n, HEADS)
    logits = logits + bias.permute(2, 0, 1)
    attn = torch.softmax(logits, dim=-1)
    out = torch.einsum("hmn,nhd->mhd", attn, v).reshape(n, D)
    h_attn = t_dense(out, ap["out"])
    h_attn = h + h_attn
    h_attn = t_bn(h_attn, lp["norm1_attn"], ls["norm1_attn"])

    h2 = h_local + h_attn

    ff = torch.relu(t_dense(h2, lp["ff_linear1"]))
    ff = t_dense(ff, lp["ff_linear2"])
    h2 = t_bn(h2 + ff, lp["norm2"], ls["norm2"])

    g_emb = h2.sum(dim=0, keepdim=True)  # pool=add
    out = torch.relu(t_dense(g_emb, params["head1"]))
    return t_dense(out, params["head2"])


def test_gps_activation_parity_vs_torch(rng):
    cfg_esc = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(3):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        graphs.append(attach_attn_bias(esc_transform(g, cfg_esc)))

    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    model = GPSModel(GPSConfig(
        dim_h=D, num_layers=1, num_heads=HEADS, dropout=0.0,
        use_attn_bias=True,
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(3)
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
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
