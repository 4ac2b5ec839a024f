"""Dedup z-emb layout: batching correctness + model-level equality with
the plain width layout, and budget math for both spec constructors."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import esc_transform
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
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


def _dense(rows_idx, rows_cnt, edge_row=None, E=None, bucket_ids=None):
    if bucket_ids is not None:
        # bucket compaction: translate compact slots back to table rows
        rows_idx = np.asarray(bucket_ids)[rows_idx]
    if edge_row is None:
        idx, cnt = rows_idx, rows_cnt
    else:
        idx = rows_idx[edge_row]
        cnt = rows_cnt[edge_row]
    d = np.zeros((E, 1800), np.float32)
    r = np.arange(E)[:, None]
    np.add.at(
        d,
        (np.broadcast_to(r, idx.shape), idx.astype(np.int64)),
        cnt.astype(np.float32),
    )
    return d


def test_dedup_batching_matches_width(rng):
    graphs = _graphs(rng)
    sw = BatchSpec.from_graphs(graphs, batch_size=3)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    assert sd.num_enc_rows > 0
    bw = pad_and_batch(graphs, sw)
    bd = pad_and_batch(graphs, sd)
    E = bw.edge_mask.shape[0]
    m = np.asarray(bw.edge_mask)
    dw = _dense(np.asarray(bw.enc_idx), np.asarray(bw.enc_cnt), E=E)
    assert bd.enc_bucket_ids is not None  # featureless graphs: tiny vocab
    dd = _dense(
        np.asarray(bd.enc_idx), np.asarray(bd.enc_cnt),
        np.asarray(bd.enc_edge_row), E=E,
        bucket_ids=bd.enc_bucket_ids,
    )
    np.testing.assert_allclose(dw[m], dd[m], atol=1e-6)
    # padding edges map to an all-zero row
    assert dd[~m].sum() == 0
    # dedup actually deduplicates (self-loop edges of featureless graphs
    # share histograms)
    real_rows = np.asarray(bd.enc_cnt).sum(1) > 0
    assert int(real_rows.sum()) < int(m.sum())


def test_dedup_exact_budget_is_cross_graph(rng):
    graphs = _graphs(rng, k=4)
    se = BatchSpec.exact(graphs, enc_layout="dedup")
    b = pad_and_batch(graphs, se)
    assert b.enc_edge_row is not None
    # exact budget: true cross-graph unique count (+zero row), rounded
    rows = set()
    for g in graphs:
        for e in range(g.num_edges):
            i, c = g.enc_row(e)
            rows.add(tuple(i.tolist() + c.tolist()))
    assert len(rows) < se.num_enc_rows <= len(rows) + 129


def test_model_forward_same_under_dedup(rng):
    graphs = _graphs(rng)
    sw = BatchSpec.from_graphs(graphs, batch_size=3)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    bw = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sw))
    bd = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sd))
    model = NestedGINEff(NestedGINEffConfig(
        hidden=8, num_layers=2, graph_pred=False, use_x_embedding_jk=True,
    ))
    v = model.init(jax.random.key(0), bw)
    ow = model.apply(v, bw)
    od = model.apply(v, bd)
    m = np.asarray(bw.node_mask)
    np.testing.assert_allclose(
        np.asarray(ow)[m], np.asarray(od)[m], rtol=2e-4, atol=2e-4
    )


def test_dedup_grads_match_width(rng):
    graphs = _graphs(rng)
    sw = BatchSpec.from_graphs(graphs, batch_size=3)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    bw = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sw))
    bd = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sd))
    from escgnn_tpu.ops.zemb import zemb_from_batch

    Z, H = 64, 16
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    m = jnp.asarray(np.asarray(bw.edge_mask))

    def loss(b):
        def f(t):
            if getattr(b, "enc_bucket_ids", None) is not None:
                # compacted layout: fold the TABLE-row ids into [0, Z)
                b2 = b.replace(
                    enc_bucket_ids=b.enc_bucket_ids.astype(jnp.int32) % Z
                )
            else:
                b2 = b.replace(enc_idx=b.enc_idx.astype(jnp.int32) % Z)
            return jnp.sum(
                jnp.sin(zemb_from_batch(t, b2)) * m[:, None]
            )
        return f

    g_w = np.asarray(jax.grad(loss(bw))(table)).ravel()
    g_d = np.asarray(jax.grad(loss(bd))(table)).ravel()
    cos = g_w.dot(g_d) / (np.linalg.norm(g_w) * np.linalg.norm(g_d) + 1e-12)
    assert cos > 0.999


def test_row_weight_counts_real_edges(rng):
    graphs = _graphs(rng)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    bd = pad_and_batch(graphs, sd)
    w = np.asarray(bd.enc_row_weight)
    m = np.asarray(bd.edge_mask)
    er = np.asarray(bd.enc_edge_row)
    # weights total exactly the real-edge count
    assert w.sum() == m.sum()
    # per-row: multiplicity among real edges only
    ref = np.bincount(er[m], minlength=len(w))
    np.testing.assert_array_equal(w, ref)
    # rows only padding edges map to carry weight 0
    pad_rows = set(er[~m]) - set(er[m])
    for r in pad_rows:
        assert w[r] == 0


def test_row_mlp_path_matches_edge_path_training(rng):
    """The unique-row z_embedding pipeline (multiplicity-weighted BN +
    one take) must be numerically identical to the per-edge pipeline —
    in TRAINING mode, where batch statistics are computed."""
    graphs = _graphs(rng)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    bd = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sd))
    model = NestedGINEff(NestedGINEffConfig(
        hidden=8, num_layers=2, graph_pred=False, use_x_embedding_jk=True,
    ))
    v = model.init(jax.random.key(0), bd)

    def fwd(b):
        return model.apply(
            v, b, deterministic=True, use_running_average=False,
            mutable=["batch_stats"],
        )

    o_row, s_row = fwd(bd)  # row path (enc_row_weight present)
    o_edge, s_edge = fwd(bd.replace(enc_row_weight=None))  # edge path
    m = np.asarray(bd.node_mask)
    np.testing.assert_allclose(
        np.asarray(o_row)[m], np.asarray(o_edge)[m], rtol=1e-5, atol=1e-5
    )
    # updated batch statistics agree too (weighted == per-edge stats)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        s_row["batch_stats"], s_edge["batch_stats"],
    )


def test_expand_rows_backward_matches_scatter(rng):
    """The Pallas sorted-segment-sum expansion backward must equal XLA's
    scatter transpose of the take (interpret mode on CPU)."""
    from escgnn_tpu.ops import expand_pallas
    from escgnn_tpu.ops.zemb import expand_rows

    graphs = _graphs(rng)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    bd = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sd))
    assert bd.enc_edge_perm is not None
    # sorted view sanity: perm sorts the row ids, ids dense from 0
    rs = np.asarray(bd.enc_row_sorted)
    assert (np.diff(rs) >= 0).all()
    er = np.asarray(bd.enc_edge_row)
    np.testing.assert_array_equal(np.sort(er), rs)

    R = int(sd.num_enc_rows)
    E = er.shape[0]
    u = jnp.asarray(rng.normal(size=(R, 16)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(E, 16)).astype(np.float32))

    def loss_kernel(u):
        return jnp.sum(expand_rows(u, bd) * co)

    def loss_take(u):
        return jnp.sum(jnp.take(u, bd.enc_edge_row, axis=0) * co)

    expand_pallas.set_interpret(True)
    try:
        g_k = np.asarray(jax.grad(loss_kernel)(u))
    finally:
        expand_pallas.set_interpret(False)
    g_t = np.asarray(jax.grad(loss_take)(u))
    # bf16 matmul in the kernel: rounding-level agreement
    a, b = g_k.ravel(), g_t.ravel()
    cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos
    assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12) < 0.02


def test_precomputed_countmat_matches_device_build(rng):
    """The host-precomputed enc_countmat path must equal the on-device
    count-matrix build exactly (C is integer batch data; both paths end
    in the same f32 matmul)."""
    from escgnn_tpu.ops.zemb import zemb_unique_rows

    graphs = _graphs(rng)
    sd = BatchSpec.from_graphs(graphs, batch_size=3, enc_layout="dedup")
    bd = jax.tree.map(jnp.asarray, pad_and_batch(graphs, sd))
    assert bd.enc_countmat is not None
    table = jnp.asarray(rng.normal(size=(1800, 16)).astype(np.float32))
    u_pre = zemb_unique_rows(table, bd)
    u_dev = zemb_unique_rows(table, bd.replace(enc_countmat=None))
    np.testing.assert_allclose(
        np.asarray(u_pre), np.asarray(u_dev), rtol=1e-6, atol=1e-6
    )
    # C content check vs a dense oracle over table rows
    C = np.asarray(bd.enc_countmat)
    ids = np.asarray(bd.enc_bucket_ids)
    idx = np.asarray(bd.enc_idx)
    cnt = np.asarray(bd.enc_cnt)
    R, W = idx.shape
    Cd = np.zeros_like(C)
    np.add.at(
        Cd,
        (np.repeat(np.arange(R), W), idx.astype(np.int64).ravel()),
        np.where(cnt > 0, cnt, 0).astype(np.float32).ravel(),
    )
    np.testing.assert_array_equal(C, Cd)
