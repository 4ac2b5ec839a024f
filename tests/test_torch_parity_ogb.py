"""OGB model activation parity vs a ragged torch re-execution.

Companion to tests/test_torch_parity.py for the OGB family
(reference `ogb_mol_gnn.py` GNN/GNN_node_efficient): re-executes the
whole forward — AtomEncoder feature sums, per-edge z reduce, per-layer
virtual-node broadcast + add-pool MLP update, GINConv_eff with
Bond+structural edge embeddings, BN, JK last, mean pooling, prediction
head — in plain float64 torch with real (unpadded) edge lists, using the
flax model's exact weights, and asserts the padded/masked JAX forward
matches per graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.molecules import synthetic_ogb_mol
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig

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
LAYERS = 2


def t_featsum(feats, p):
    out = torch.zeros((feats.shape[0], D), dtype=torch.float64)
    for i in range(feats.shape[1]):
        out += t(p[f"emb_{i}"]["embedding"])[feats[:, i].astype(np.int64)]
    return out


def torch_forward(g, params, stats):
    gp, gs = params["gnn_node"], stats["gnn_node"]
    n = g.num_nodes
    h = t_featsum(np.asarray(g.x), gp["node_encoder"])

    E = g.num_edges
    table = t(gp["z_initial"])
    z_raw = torch.zeros((E, D), dtype=torch.float64)
    for e in range(E):
        idx, cnt = g.enc_row(e)
        for i, c in zip(idx.tolist(), cnt.tolist()):
            z_raw[e] += c * table[i]
    z = t_mlp(z_raw, gp["z_embedding"], gs["z_embedding"], pre_act=True)

    senders = torch.tensor(np.asarray(g.edge_index[0], np.int64))
    receivers = torch.tensor(np.asarray(g.edge_index[1], np.int64))
    vn = t(gp["virtualnode_embedding"])

    h_list = [h]
    for layer in range(LAYERS):
        hc = h_list[layer] + vn  # single graph: broadcast to every node
        h_list[layer] = hc
        cp, cs = gp[f"conv{layer}"], gs[f"conv{layer}"]
        e = t_featsum(np.asarray(g.edge_attr), cp["edge_encoder"])
        e = e + t_dense(z, cp["edge_encoder_pos"])
        msg = torch.relu(hc[senders] + e)
        agg = torch.zeros_like(hc).index_add_(0, receivers, msg)
        x = (1.0 + float(np.asarray(cp["eps"]))) * hc + agg
        x = t_dense(x, cp["mlp_0"])
        x = torch.relu(t_bn(x, cp["mlp_bn"], cs["mlp_bn"]))
        x = t_dense(x, cp["mlp_1"])
        x = t_bn(
            x, gp[f"batch_norm{layer}"], gs[f"batch_norm{layer}"]
        )
        if layer < LAYERS - 1:
            x = torch.relu(x)
        h_list.append(x)
        if layer < LAYERS - 1:
            vn_tmp = h_list[layer].sum(dim=0) + vn
            vn = t_mlp(
                vn_tmp[None, :],
                gp[f"mlp_virtualnode_{layer}"],
                gs[f"mlp_virtualnode_{layer}"],
                pre_act=False,
            )[0]

    g_emb = h_list[-1].mean(dim=0, keepdim=True)  # JK last, mean pool
    return t_dense(g_emb, params["graph_pred_linear"])


def test_ogb_activation_parity_vs_torch():
    raw = synthetic_ogb_mol(num_graphs=3, seed=0, num_tasks=2)
    feats = featurize_many(raw, EscConfig(h=2, use_rd=True, self_loop=True))
    spec = BatchSpec.from_graphs(feats, batch_size=3)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(feats, spec))

    model = OgbGNN(OgbGNNConfig(
        num_tasks=2, num_layers=LAYERS, emb_dim=D, dropout=0.0,
        virtual_node=True, graph_pooling="mean",
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(7)
    params = _randomize(variables["params"], nprng)
    stats = _abs_var(_randomize(variables["batch_stats"], nprng))

    out = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, batch,
        deterministic=True, use_running_average=True,
    ))

    p_np = jax.tree.map(np.asarray, params)
    s_np = jax.tree.map(np.asarray, stats)
    want = np.concatenate(
        [torch_forward(g, p_np, s_np).numpy() for g in feats]
    )
    got = out[np.asarray(batch.graph_mask)]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
