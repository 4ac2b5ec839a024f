"""Flat COO z-emb layout: batching correctness + numerical equivalence
with the width layout in both directions, and model-level equality."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import esc_transform
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.ops.zemb import (
    _gather_reduce,
    zemb_weighted_flat,
    zemb_weighted_gather,
)
from tests.conftest import random_graph


def _graphs(rng, k=3):
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    out = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=np.ones((n, 10), np.float32),
            y=rng.normal(size=(n, 1)).astype(np.float32),
        )
        out.append(esc_transform(g, cfg))
    return out


def test_flat_batching_matches_width(rng):
    graphs = _graphs(rng)
    sw = BatchSpec.from_graphs(graphs, batch_size=3)
    sf = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="flat")
    assert sf.num_enc_nnz > 0 and sf.enc_width == 0
    bw = pad_and_batch(graphs, sw)
    bf = pad_and_batch(graphs, sf)
    # dense per-edge vectors must agree between layouts
    E = bw.edge_mask.shape[0]
    dense_w = np.zeros((E, 1800), np.float32)
    rows = np.arange(E)[:, None]
    np.add.at(dense_w, (np.broadcast_to(rows, bw.enc_idx.shape),
                        bw.enc_idx.astype(np.int64)),
              bw.enc_cnt.astype(np.float32))
    dense_f = np.zeros((E, 1800), np.float32)
    np.add.at(dense_f, (bf.enc_flat_edge.astype(np.int64),
                        bf.enc_flat_idx.astype(np.int64)),
              bf.enc_flat_cnt.astype(np.float32))
    # padding-edge rows may receive bucket-0 zeros; compare real edges
    m = np.asarray(bw.edge_mask)
    np.testing.assert_allclose(dense_w[m], dense_f[m], atol=1e-6)
    # flat entries sorted by edge id
    assert np.all(np.diff(bf.enc_flat_edge) >= 0)


def test_flat_op_matches_width_op(rng):
    graphs = _graphs(rng)
    sw = BatchSpec.from_graphs(graphs, batch_size=3)
    sf = dataclasses.replace(sw, enc_width=0,
                             num_enc_nnz=BatchSpec.from_graphs(
                                 graphs, batch_size=3, enc_layout="flat"
                             ).num_enc_nnz)
    bw = pad_and_batch(graphs, sw)
    bf = pad_and_batch(graphs, sf)
    Z, H = 50, 16
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx_w = jnp.asarray(bw.enc_idx.astype(np.int32) % Z)
    out_w = zemb_weighted_gather(table, idx_w, jnp.asarray(bw.enc_cnt))
    idx_f = jnp.asarray(bf.enc_flat_idx.astype(np.int32) % Z)
    out_f = zemb_weighted_flat(
        table, idx_f, jnp.asarray(bf.enc_flat_cnt),
        jnp.asarray(bf.enc_flat_edge), bw.edge_mask.shape[0],
    )
    m = np.asarray(bw.edge_mask)
    np.testing.assert_allclose(
        np.asarray(out_w)[m], np.asarray(out_f)[m], rtol=1e-5, atol=1e-5
    )

    # table gradients agree too
    def loss_w(t):
        return jnp.sum(jnp.sin(zemb_weighted_gather(
            t, idx_w, jnp.asarray(bw.enc_cnt))) * jnp.asarray(m)[:, None])

    def loss_f(t):
        return jnp.sum(jnp.sin(zemb_weighted_flat(
            t, idx_f, jnp.asarray(bf.enc_flat_cnt),
            jnp.asarray(bf.enc_flat_edge), bw.edge_mask.shape[0],
        )) * jnp.asarray(m)[:, None])

    g_w = np.asarray(jax.grad(loss_w)(table)).ravel()
    g_f = np.asarray(jax.grad(loss_f)(table)).ravel()
    cos = g_w.dot(g_f) / (np.linalg.norm(g_w) * np.linalg.norm(g_f) + 1e-12)
    assert cos > 0.999  # bf16 blocked matmuls in both backward paths


def test_model_forward_same_under_both_layouts(rng):
    graphs = _graphs(rng)
    sw = BatchSpec.from_graphs(graphs, batch_size=3)
    sf = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="flat")
    bw = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sw))
    bf = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sf))
    model = NestedGINEff(NestedGINEffConfig(
        hidden=8, num_layers=2, graph_pred=False, use_x_embedding_jk=True,
    ))
    v = model.init(jax.random.key(0), bw)
    ow = model.apply(v, bw)
    of = model.apply(v, bf)
    m = np.asarray(bw.node_mask)
    np.testing.assert_allclose(
        np.asarray(ow)[m], np.asarray(of)[m], rtol=2e-4, atol=2e-4
    )
