"""Parity vs the VENDORED reference model (round-1 verdict item 9).

The rest of the parity suite re-derives the torch math independently;
this test instead loads the flax ZINC NestedGINEff's weights into the
reference-lifted torch module (`tests/vendored_reference_zinc.py`,
transcribed from `/root/reference/zinc_models.py:504-611`) and asserts
identical graph predictions — so a shared misreading of e.g. GINEConv's
eps handling or the z-embedding reduce cannot pass silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import esc_transform
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from tests.conftest import random_graph

torch = pytest.importorskip("torch")

from tests.torch_ref import (  # noqa: E402
    abs_var as _abs_var,
    randomize as _randomize,
)
from tests.vendored_reference_zinc import NestedGIN_eff  # noqa: E402

LAYERS = 2


def _to_torch_state(params, stats, num_layers):
    """Map flax NestedGINEff params/batch_stats onto the vendored torch
    module's state_dict names."""
    sd = {}

    def w(x):
        return torch.tensor(np.asarray(x, np.float32))

    sd["z_initial.weight"] = w(params["z_initial"])
    for mod, fx in (("z_embedding.1", "MaskedBatchNorm_0"),
                    ("z_embedding.5", "MaskedBatchNorm_1")):
        sd[f"{mod}.weight"] = w(params["z_embedding"][fx]["scale"])
        sd[f"{mod}.bias"] = w(params["z_embedding"][fx]["bias"])
        sd[f"{mod}.running_mean"] = w(stats["z_embedding"][fx]["mean"])
        sd[f"{mod}.running_var"] = w(stats["z_embedding"][fx]["var"])
        sd[f"{mod}.num_batches_tracked"] = torch.tensor(0)
    sd["z_embedding.3.weight"] = w(params["z_embedding"]["TorchDense_0"]
                                   ["kernel"]).T
    sd["z_embedding.3.bias"] = w(params["z_embedding"]["TorchDense_0"]
                                 ["bias"])

    def conv(dst, conv_key, mlp_key):
        sd[f"{dst}.eps"] = w(params[conv_key]["eps"]).reshape(1)
        sd[f"{dst}.lin.weight"] = w(params[conv_key]["lin_edge"]
                                    ["kernel"]).T
        sd[f"{dst}.lin.bias"] = w(params[conv_key]["lin_edge"]["bias"])
        for seq_i, fx in ((0, "TorchDense_0"), (4, "TorchDense_1")):
            sd[f"{dst}.nn.{seq_i}.weight"] = w(
                params[mlp_key][fx]["kernel"]).T
            sd[f"{dst}.nn.{seq_i}.bias"] = w(params[mlp_key][fx]["bias"])
        for seq_i, fx in ((2, "MaskedBatchNorm_0"), (6, "MaskedBatchNorm_1")):
            sd[f"{dst}.nn.{seq_i}.weight"] = w(params[mlp_key][fx]["scale"])
            sd[f"{dst}.nn.{seq_i}.bias"] = w(params[mlp_key][fx]["bias"])
            sd[f"{dst}.nn.{seq_i}.running_mean"] = w(
                stats[mlp_key][fx]["mean"])
            sd[f"{dst}.nn.{seq_i}.running_var"] = w(stats[mlp_key][fx]["var"])
            sd[f"{dst}.nn.{seq_i}.num_batches_tracked"] = torch.tensor(0)

    # conv i's inner MLP is attached to the PARENT flax scope in call
    # order: MLP_0 for conv1, MLP_1 for conv2, ...
    conv("conv1", "conv1", "MLP_0")
    for i in range(num_layers - 1):
        conv(f"convs.{i}", f"conv{i + 2}", f"MLP_{i + 1}")

    sd["lin1.weight"] = w(params["lin1"]["kernel"]).T
    sd["lin1.bias"] = w(params["lin1"]["bias"])
    sd["bn_lin1.weight"] = w(params["bn_lin1"]["scale"])
    sd["bn_lin1.bias"] = w(params["bn_lin1"]["bias"])
    sd["bn_lin1.running_mean"] = w(stats["bn_lin1"]["mean"])
    sd["bn_lin1.running_var"] = w(stats["bn_lin1"]["var"])
    sd["bn_lin1.num_batches_tracked"] = torch.tensor(0)
    sd["lin2.weight"] = w(params["lin2"]["kernel"]).T
    sd["lin2.bias"] = w(params["lin2"]["bias"])
    sd["node_type_embedding.weight"] = w(
        params["node_type_embedding"]["embedding"])
    sd["edge_type_embedding.weight"] = w(
        params["edge_type_embedding"]["embedding"])
    return sd


class _Data:
    pass


def _ragged_batch(graphs):
    """The reference's collated tensors: concatenated ragged edge lists,
    batch vector, and the sparse pos_index/pos_enc/pos_batch triple
    (utils_edge_efficient.py:140-151 wire format)."""
    d = _Data()
    xs, eis, eas, batch = [], [], [], []
    pos_index, pos_enc, pos_batch = [], [], []
    n_off = e_off = 0
    for gi, g in enumerate(graphs):
        xs.append(np.asarray(g.x).reshape(-1))
        eis.append(np.asarray(g.edge_index) + n_off)
        eas.append(np.asarray(g.edge_attr).reshape(-1))
        batch.append(np.full(g.num_nodes, gi))
        for e in range(g.num_edges):
            idx, cnt = g.enc_row(e)
            pos_index.append(idx)
            pos_enc.append(cnt)
            pos_batch.append(np.full(len(idx), e_off + e))
        n_off += g.num_nodes
        e_off += g.num_edges
    d.x = torch.tensor(np.concatenate(xs), dtype=torch.long)
    d.edge_index = torch.tensor(
        np.concatenate(eis, axis=1), dtype=torch.long
    )
    d.edge_attr = torch.tensor(np.concatenate(eas), dtype=torch.long)
    d.batch = torch.tensor(np.concatenate(batch), dtype=torch.long)
    d.pos_index = torch.tensor(np.concatenate(pos_index), dtype=torch.long)
    d.pos_enc = torch.tensor(
        np.concatenate(pos_enc), dtype=torch.float32
    )
    d.pos_batch = torch.tensor(np.concatenate(pos_batch), dtype=torch.long)
    return d


def test_vendored_reference_forward_parity(rng):
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(3):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 28, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        graphs.append(esc_transform(g, cfg))

    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    # the vendored module hardcodes hidden=256 / 32-dim type embeddings
    # (reference zinc_models.py:508,523,563-564)
    model = NestedGINEff(NestedGINEffConfig(
        hidden=256, num_layers=LAYERS, dropout=0.0, act="elu",
        graph_pred=True, pool="add", use_x_embedding_jk=False,
        head_order="dropout_act",
        node_embed_vocab=100, node_embed_dim=32,
        edge_embed_vocab=100, edge_embed_dim=32, out_dim=1,
    ))
    variables = model.init(jax.random.key(0), batch)
    nprng = np.random.default_rng(7)
    params = _randomize(variables["params"], nprng)
    stats = _abs_var(_randomize(variables["batch_stats"], nprng))

    out = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, batch,
        deterministic=True, use_running_average=True,
    ))

    ref = NestedGIN_eff(None, LAYERS)
    sd = _to_torch_state(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats),
        LAYERS,
    )
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    ref.eval()
    with torch.no_grad():
        want = ref(_ragged_batch(graphs)).numpy()

    gm = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(out[gm], want, rtol=2e-4, atol=2e-4)
