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


@pytest.fixture(scope="module")
def gps_batch():
    rng = np.random.default_rng(0)
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(3):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        g = esc_transform(g, cfg)
        g = attach_attn_bias(g)
        graphs.append(g)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    assert spec.max_nodes_per_graph > 0
    return jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))


def test_gps_forward_with_bias(gps_batch):
    cfg = GPSConfig(dim_h=16, num_layers=2, num_heads=2, use_attn_bias=True)
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gps_forward_no_esc(gps_batch):
    cfg = GPSConfig(
        dim_h=16, num_layers=1, num_heads=4, use_esc=False, use_attn_bias=True
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(1), gps_batch)
    out = model.apply(variables, gps_batch)
    assert np.all(np.isfinite(np.asarray(out)))


def test_attn_bias_batch_shape(gps_batch):
    ab = gps_batch.extras["attn_bias"]
    G, M, M2 = ab.shape
    assert M == M2 and G == gps_batch.num_graphs
    # diagonal of real slots is 0 (self distance)
    nm = np.asarray(gps_batch.node_mask)
    ng = np.asarray(gps_batch.node_graph)[nm]
    nl = np.asarray(gps_batch.node_local)[nm]
    assert np.all(np.asarray(ab)[ng, nl, nl] == 0)


def test_gps_gatedgcn_linear_attention(gps_batch):
    cfg = GPSConfig(
        dim_h=16, num_layers=2, num_heads=2,
        local_model="gatedgcn", global_model="linear",
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_linear_attention_padding_invariant(gps_batch):
    """Linear attention must ignore padding nodes entirely."""
    from escgnn_tpu.models.gps import LinearAttention
    import jax.numpy as jnp

    att = LinearAttention(16, 2)
    h = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(gps_batch.num_nodes, 16)
        ).astype(np.float32)
    )
    v = att.init(jax.random.key(0), h, gps_batch, deterministic=True)
    o1 = att.apply(v, h, gps_batch, deterministic=True)
    # poison padding rows: output on real rows must not change
    h2 = jnp.where(
        gps_batch.node_mask[:, None], h, 1e3
    )
    o2 = att.apply(v, h2, gps_batch, deterministic=True)
    m = np.asarray(gps_batch.node_mask)
    np.testing.assert_allclose(
        np.asarray(o1)[m], np.asarray(o2)[m], atol=1e-4
    )


def test_gps_pna_local(gps_batch):
    """PNA local model option (reference gps_layer.py local zoo)."""
    cfg = GPSConfig(
        dim_h=16, num_layers=1, num_heads=2, use_attn_bias=True,
        local_model="pna", pna_towers=2, avg_deg_log=1.1,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gps_bigbird_global(gps_batch):
    """BigBird block-sparse global attention option."""
    cfg = GPSConfig(
        dim_h=16, num_layers=1, num_heads=2,
        global_model="bigbird", bigbird_window=2,
        bigbird_global=1, bigbird_random=1,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bigbird_mask_pattern():
    """Window, global and random keys are attendable; far pairs are not."""
    from escgnn_tpu.models.gps import _bigbird_mask

    m = np.asarray(_bigbird_mask(16, 2, 2, 0))
    # window
    assert m[8, 8] and m[8, 10] and not m[8, 11]
    # global rows/cols
    assert m[0].all() and m[:, 1].all()
    # symmetric-ish coverage: every query can attend somewhere real
    assert m.any(axis=1).all()
    # random keys add extra attendable pairs beyond window+global
    m_r = np.asarray(_bigbird_mask(16, 2, 2, 2))
    assert m_r.sum() > m.sum()


def test_attention_weight_capture(gps_batch):
    # the --dump_attn inference mode: intermediates carry per-layer
    # softmax weights that sum to 1 over real keys
    cfg = GPSConfig(dim_h=16, num_layers=2, num_heads=2, use_attn_bias=True)
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    _, inter = model.apply(
        variables, gps_batch, mutable=["intermediates"]
    )
    leaves = jax.tree_util.tree_leaves(inter["intermediates"])
    assert len(leaves) == 2  # one per layer
    for w in leaves:
        assert w.ndim == 4  # (G, heads, M, M)
        rows = np.asarray(w).sum(-1)
        assert np.allclose(rows[np.isfinite(rows)], 1.0, atol=1e-5)


def test_signnet_encoder_sign_invariant(gps_batch):
    import dataclasses as dc

    from escgnn_tpu.featurize.posenc import attach_lap_pe

    # rebuild a small batch with lap_pe attached
    rng = np.random.default_rng(1)
    cfg_esc = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        g = attach_lap_pe(attach_attn_bias(esc_transform(g, cfg_esc)), k=4)
        graphs.append(g)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    cfg = GPSConfig(
        dim_h=16, num_layers=1, num_heads=2, use_attn_bias=True,
        use_signnet=True,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), b)
    out = model.apply(variables, b)

    # flipping every eigenvector's sign must not change the output
    ex = dict(b.extras)
    ex["lap_pe"] = -ex["lap_pe"]
    b_flip = dc.replace(b, extras=ex)
    out_flip = model.apply(variables, b_flip)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_flip), rtol=1e-5, atol=1e-5
    )
    assert "signnet_rho" in variables["params"]


@pytest.mark.parametrize("name,node_enc,edge_enc,graph_pred", [
    ("count_cycle", "linear", "none", False),
    ("qm9-synthetic", "linear", "linear", True),
])
def test_gps_dataset_zoo(tmp_path, name, node_enc, edge_enc, graph_pred):
    # the run_gps master-loader path: build a zoo dataset, featurize with
    # ESC + attn_bias, and run one GPS forward with matching encoders
    import run_gps
    from escgnn_tpu.config import load_cfg

    cfg = load_cfg(None, [
        "dataset.name", name,
        "dataset.num_graphs", "12",
        "dataset.dir", str(tmp_path),
        "dataset.node_encoder", node_enc,
        "dataset.edge_encoder", edge_enc,
        "dataset.esc.h", "2",
        "model.graph_pred", str(graph_pred),
        "model.dim_h", "16",
        "model.num_layers", "1",
        "model.num_heads", "2",
        "train.batch_size", "4",
    ])
    splits, mean, std = run_gps.build_dataset(cfg, seed=0)
    assert std > 0
    graphs = [g for s in splits.values() for g in s]
    spec = BatchSpec.from_graphs(graphs, batch_size=4)
    b = jax.tree.map(jnp.asarray, pad_and_batch(splits["train"][:4], spec))
    model = GPSModel(run_gps._gps_config(cfg, splits))
    variables = model.init(jax.random.key(0), b)
    out = model.apply(variables, b)
    expect = b.y.shape[0]
    assert out.shape == (expect, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_san_attention_matches_ragged_oracle(gps_batch):
    """SANAttention (real + fake complement edges) equals a per-graph
    ragged numpy oracle of the reference math (san_layer.py:38-121)."""
    from escgnn_tpu.models.gps import SANAttention

    D, HEADS = 16, 2
    hd = D // HEADS
    gamma = 0.3
    b = gps_batch
    N = b.num_nodes
    rng_np = np.random.default_rng(0)
    h = jnp.asarray(rng_np.normal(size=(N, D)).astype(np.float32))
    e = jnp.asarray(
        rng_np.normal(size=(b.num_edges, D)).astype(np.float32)
    )
    mod = SANAttention(D, HEADS, gamma=gamma, full_graph=True)
    variables = mod.init(jax.random.key(0), h, e, b, deterministic=True)
    out = np.asarray(
        mod.apply(variables, h, e, b, deterministic=True)
    )

    p = jax.tree.map(np.asarray, variables["params"])

    def lin(x, name):
        return x @ p[name]["kernel"] + p[name]["bias"]

    hn = np.asarray(h)
    q = lin(hn, "q").reshape(N, HEADS, hd)
    k = lin(hn, "k").reshape(N, HEADS, hd)
    v = lin(hn, "v").reshape(N, HEADS, hd)
    ee = lin(np.asarray(e), "e").reshape(-1, HEADS, hd)
    q2 = lin(hn, "q2").reshape(N, HEADS, hd)
    k2 = lin(hn, "k2").reshape(N, HEADS, hd)
    e2 = lin(p["fake_edge_emb"], "e2").reshape(HEADS, hd)

    senders = np.asarray(b.senders)
    receivers = np.asarray(b.receivers)
    emask = np.asarray(b.edge_mask)
    nmask = np.asarray(b.node_mask)
    ngraph = np.asarray(b.node_graph)

    wV = np.zeros((N, HEADS, hd))
    Z = np.zeros((N, HEADS))
    for idx in range(len(senders)):
        if not emask[idx]:
            continue
        s_, r_ = senders[idx], receivers[idx]
        sc = np.exp(np.clip(
            (k[s_] * q[r_] * ee[idx]).sum(-1) / np.sqrt(hd), -5, 5
        )) / (gamma + 1.0)
        wV[r_] += v[s_] * sc[:, None]
        Z[r_] += sc
    real = set(
        (int(s_), int(r_))
        for s_, r_, m in zip(senders, receivers, emask) if m
    )
    for i in range(N):
        for j in range(N):
            if i == j or not (nmask[i] and nmask[j]):
                continue
            if ngraph[i] != ngraph[j] or (i, j) in real:
                continue
            sc = np.exp(np.clip(
                (k2[i] * q2[j] * e2).sum(-1) / np.sqrt(hd), -5, 5
            )) * gamma / (gamma + 1.0)
            wV[j] += v[i] * sc[:, None]
            Z[j] += sc
    want = (wV / (Z[..., None] + 1e-6)).reshape(N, D)
    np.testing.assert_allclose(
        out[nmask], want[nmask], rtol=2e-4, atol=2e-4
    )


def test_gps_san_global(gps_batch):
    cfg = GPSConfig(
        dim_h=16, num_layers=2, num_heads=2, use_attn_bias=False,
        global_model="san", san_gamma=0.1,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dump_attention_key_naming(tmp_path, gps_batch):
    """run_gps.dump_attention writes layer-named npz keys (the
    SequenceKey path entries render as indices, not 'attn_weights/[0]')."""
    import run_gps
    from escgnn_tpu.train.loop import TrainState, adam_with_plateau

    cfg = GPSConfig(dim_h=16, num_layers=2, num_heads=2, use_attn_bias=True)
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(1e-3),
    )

    class _Spec:
        pass

    # minimal splits/spec stand-ins: dump uses batch_iterator(test, spec)
    from escgnn_tpu.data.batching import BatchSpec
    from escgnn_tpu.data.container import GraphData
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.spd import attach_attn_bias
    from escgnn_tpu.featurize.transform import esc_transform

    rng_np = np.random.default_rng(5)
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng_np, max_n=7)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng_np.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng_np.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng_np.normal(size=(1,)).astype(np.float32),
        )
        graphs.append(
            attach_attn_bias(esc_transform(g, EscConfig(h=2)))
        )
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    out = str(tmp_path / "attn.npz")
    run_gps.dump_attention(model, state, {"test": graphs}, spec, out)
    with np.load(out) as z:
        keys = sorted(z.files)
        assert keys == ["layer0/self_attn", "layer1/self_attn"], keys
        for k in keys:
            assert z[k].ndim == 4  # (G, heads, M, M)


def test_favor_kernel_approximates_softmax():
    """FAVOR+ positive random features: phi(q).phi(k) estimates
    exp(q.k) (unit-variance inputs, m >> d gives a tight estimate)."""
    from escgnn_tpu.models.gps import _favor_projection

    hd, m = 8, 4096
    rng = np.random.default_rng(0)
    W = np.asarray(_favor_projection(m, hd))
    q = rng.normal(size=(5, hd)) * 0.3
    k = rng.normal(size=(5, hd)) * 0.3

    def phi(x):
        wx = x @ W.T
        return np.exp(wx - 0.5 * (x * x).sum(-1, keepdims=True)) / np.sqrt(m)

    est = phi(q) @ phi(k).T
    want = np.exp(q @ k.T)
    # the positive-feature estimator's variance grows with exp(||q+k||^2),
    # so bound the MEAN relative error (the normalized-attention module
    # test asserts the end-to-end tolerance)
    rel = np.abs(est - want) / want
    assert rel.mean() < 0.1, rel.mean()
    np.testing.assert_allclose(est, want, rtol=0.5)


def test_gps_performer_global(gps_batch):
    cfg = GPSConfig(
        dim_h=16, num_layers=2, num_heads=2, use_attn_bias=False,
        global_model="performer", performer_features=32,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_performer_approaches_dense_attention(gps_batch):
    """With many random features the FAVOR+ layer output approaches the
    exact-softmax dense attention computed from the SAME q/k/v weights."""
    import flax

    from escgnn_tpu.models.gps import DenseAttention, FavorAttention

    D, Hh = 16, 2
    fav = FavorAttention(D, Hh, num_features=8192)
    v_f = fav.init(
        jax.random.key(1), jnp.asarray(np.random.default_rng(1).normal(
            size=(gps_batch.num_nodes, D)).astype(np.float32)),
        gps_batch, deterministic=True,
    )
    h = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(gps_batch.num_nodes, D)
        ).astype(np.float32)
    )
    out_f = fav.apply(v_f, h, gps_batch, deterministic=True)

    dense = DenseAttention(D, Hh, False, 102)
    v_d = dense.init(jax.random.key(0), h, gps_batch, deterministic=True)
    # share q/k/v/out weights
    pf = flax.core.unfreeze(v_f)["params"]
    pd = flax.core.unfreeze(v_d)["params"]
    for k in ("q", "k", "v", "out"):
        pd[k] = pf[k]
    out_d = dense.apply({"params": pd}, h, gps_batch, deterministic=True)
    m = np.asarray(gps_batch.node_mask)
    a, b = np.asarray(out_f)[m], np.asarray(out_d)[m]
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.95, f"FAVOR+ vs dense correlation {corr}"
    np.testing.assert_allclose(a, b, atol=0.35)


def test_gps_san2_global(gps_batch):
    cfg = GPSConfig(
        dim_h=16, num_layers=2, num_heads=2, use_attn_bias=False,
        global_model="san2",
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    # learnable gamma scalar exists (san2_layer.py nn.Parameter(0.5))
    leaf = variables["params"]["layer0"]["self_attn"]["gamma"]
    assert leaf.shape == ()
    np.testing.assert_allclose(float(leaf), 0.5)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gps_graphormer_layer(gps_batch):
    cfg = GPSConfig(
        dim_h=16, num_layers=2, num_heads=2, use_attn_bias=True,
        global_model="graphormer", use_degree=False,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), gps_batch)
    # graphormer block: pre-LN MHA, no local MPNN params in the layer
    layer0 = variables["params"]["layer0"]
    assert "input_norm" in layer0 and "mlp_norm" in layer0
    assert not any(k.startswith("local_") for k in layer0)
    out = model.apply(variables, gps_batch)
    assert out.shape == (gps_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gps_equivstable_pe(gps_batch):
    from escgnn_tpu.featurize.posenc import attach_lap_pe

    # rebuild the batch with lap_pe attached
    rng = np.random.default_rng(0)
    cfgE = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(3):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        g = esc_transform(g, cfgE)
        g = attach_attn_bias(g)
        g = attach_lap_pe(g, k=4)
        graphs.append(g)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    cfg = GPSConfig(
        dim_h=16, num_layers=2, num_heads=2, use_attn_bias=False,
        local_model="gatedgcn", use_equivstable_pe=True,
    )
    model = GPSModel(cfg)
    variables = model.init(jax.random.key(0), b)
    # the r_ij stabilizer MLP exists inside the gatedgcn local model
    assert "r_mlp1" in variables["params"]["layer0"]["local_gatedgcn"]
    out = model.apply(variables, b)
    assert out.shape == (b.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gps_uniform_dedup_matches_flat():
    """BatchSpec.uniform + dedup ESC rows through the GPS stack must
    match the flat/width layout (round-3 port of the flagship fast
    layout to GPS: einsum local GINE, unique-row z MLP, reshape pool)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.featurize.spd import attach_attn_bias
    from escgnn_tpu.models.gps import GPSConfig, GPSModel
    from tests.test_model import make_graphs

    rng = np.random.default_rng(5)
    graphs = [attach_attn_bias(g)
              for g in make_graphs(rng, k=4, node_level=False)]
    b_flat = jax.tree.map(
        jnp.asarray,
        pad_and_batch(graphs, BatchSpec.from_graphs(graphs, batch_size=4)),
    )
    b_uni = jax.tree.map(
        jnp.asarray,
        pad_and_batch(
            graphs,
            BatchSpec.uniform(graphs, batch_size=4, enc_layout="dedup"),
        ),
    )
    assert b_uni.nodes_per_graph is not None
    assert b_uni.enc_row_weight is not None

    model = GPSModel(GPSConfig(
        dim_h=16, num_layers=2, num_heads=2, use_esc=True,
        use_attn_bias=True, node_encoder_kind="linear",
        edge_encoder_kind="none", pool="add", out_dim=1,
    ))
    variables = model.init(jax.random.key(0), b_flat)

    @jax.jit
    def fwd_train(v, b):
        out, _ = model.apply(
            v, b, deterministic=True, use_running_average=False,
            mutable=["batch_stats"],
        )
        return out

    out_f = np.asarray(fwd_train(variables, b_flat))
    out_u = np.asarray(fwd_train(variables, b_uni))
    np.testing.assert_allclose(out_f, out_u, rtol=2e-4, atol=2e-5)
