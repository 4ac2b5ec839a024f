import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.molecules import synthetic_ogb_mol, synthetic_zinc
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many
from escgnn_tpu.models.ogb_gnn import OgbGNN, OgbGNNConfig
from escgnn_tpu.train.metrics import (
    average_precision,
    masked_bce_with_logits,
    rocauc,
)


@pytest.fixture(scope="module")
def ogb_batch():
    raw = synthetic_ogb_mol(num_graphs=3, seed=0, num_tasks=2, nan_frac=0.3)
    ecfg = EscConfig(h=2, use_rd=True, self_loop=True)
    feats = featurize_many(raw, ecfg)
    spec = BatchSpec.from_graphs(feats, batch_size=3)
    return jax.tree.map(jnp.asarray, pad_and_batch(feats, spec))


def test_ogb_forward_and_loss(ogb_batch):
    cfg = OgbGNNConfig(num_tasks=2, num_layers=2, emb_dim=16, dropout=0.0)
    model = OgbGNN(cfg)
    variables = model.init(jax.random.key(0), ogb_batch)
    out = model.apply(variables, ogb_batch)
    assert out.shape == (ogb_batch.num_graphs, 2)
    loss = masked_bce_with_logits(out, ogb_batch)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize(
    "pooling", ["sum", "max", "attention", "combine", "set2set", "sort"]
)
def test_ogb_pooling_zoo(ogb_batch, pooling):
    cfg = OgbGNNConfig(
        num_tasks=1, num_layers=1, emb_dim=8, dropout=0.0,
        graph_pooling=pooling, virtual_node=False,
    )
    model = OgbGNN(cfg)
    variables = model.init(jax.random.key(0), ogb_batch)
    out = model.apply(variables, ogb_batch)
    assert out.shape == (ogb_batch.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rocauc_and_ap():
    y = np.array([[0.0], [1.0], [1.0], [0.0], [np.nan]])
    s = np.array([[0.1], [0.9], [0.8], [0.2], [0.5]])
    assert rocauc(y, s) == 1.0
    assert average_precision(y, s) == 1.0
    # single-class task -> nan
    y1 = np.ones((4, 1))
    assert np.isnan(rocauc(y1, s[:4]))


def test_masked_bce_ignores_nan():
    from escgnn_tpu.data.container import GraphBatch

    y = jnp.array([[1.0, jnp.nan], [0.0, 1.0], [0.0, 0.0]])
    logits = jnp.array([[5.0, 999.0], [-5.0, 5.0], [-5.0, -5.0]])
    gm = jnp.array([True, True, False])  # last graph is padding
    batch = GraphBatch(
        senders=jnp.zeros(1, jnp.int32),
        receivers=jnp.zeros(1, jnp.int32),
        edge_mask=jnp.ones(1, bool),
        node_mask=jnp.ones(1, bool),
        node_graph=jnp.zeros(1, jnp.int32),
        graph_mask=gm,
        y=y,
    )
    loss = float(masked_bce_with_logits(logits, batch))
    # all labeled, unmasked entries are confidently correct -> tiny loss;
    # the NaN entry (logit 999) and padded graph must not contribute
    assert loss < 0.05


@pytest.mark.parametrize(
    "subpool", ["sum", "mean", "max", "attention", "center", "combine"]
)
def test_ogb_subgraph_pooling_stage(ogb_batch, subpool):
    # synthesize a trivial two-level batch: one "copy" per graph, so the
    # subpool stage runs over real segment ids and the graph pooling
    # runs over segment rows (wiring/shape check for every mode)
    import dataclasses as dc

    b = dc.replace(
        ogb_batch,
        node_segment=ogb_batch.node_graph,
        segment_graph=jnp.arange(ogb_batch.num_graphs, dtype=jnp.int32),
        segment_mask=jnp.ones(ogb_batch.num_graphs, bool),
    )
    cfg = OgbGNNConfig(
        num_tasks=1, num_layers=1, emb_dim=8, dropout=0.0,
        graph_pooling="mean", subgraph_pooling=subpool, virtual_node=False,
    )
    model = OgbGNN(cfg)
    variables = model.init(jax.random.key(0), b)
    out = model.apply(variables, b)
    assert out.shape == (b.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ogb_rni_perturb_skip_encoder(ogb_batch):
    import dataclasses as dc

    cfg = OgbGNNConfig(
        num_tasks=1, num_layers=1, emb_dim=8, dropout=0.0,
        virtual_node=False, rni=True,
    )
    model = OgbGNN(cfg)
    variables = model.init(
        {"params": jax.random.key(0), "rni": jax.random.key(1)}, ogb_batch
    )
    # RNI draws from the "rni" stream when deterministic=False:
    # different keys -> different outputs; deterministic -> no noise
    o1 = model.apply(variables, ogb_batch, deterministic=False,
                     rngs={"rni": jax.random.key(1)})
    o2 = model.apply(variables, ogb_batch, deterministic=False,
                     rngs={"rni": jax.random.key(2)})
    od = model.apply(variables, ogb_batch, deterministic=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert np.all(np.isfinite(np.asarray(od)))

    # FLAG perturb hook: gradient w.r.t. the perturbation is nonzero
    cfg2 = dc.replace(cfg, rni=False)
    model2 = OgbGNN(cfg2)
    v2 = model2.init(jax.random.key(0), ogb_batch)
    p0 = jnp.zeros((ogb_batch.num_nodes, cfg2.emb_dim))

    def f(p):
        return jnp.sum(model2.apply(v2, ogb_batch, perturb=p) ** 2)

    g = jax.grad(f)(p0)
    assert float(jnp.sum(jnp.abs(g))) > 0.0

    # skip_node_encoder: h0 = raw x (needs x width == emb_dim)
    cfg3 = dc.replace(cfg, rni=False, skip_node_encoder=True, emb_dim=9)
    b3 = dc.replace(ogb_batch, x=ogb_batch.x.astype(jnp.float32))
    model3 = OgbGNN(cfg3)
    v3 = model3.init(jax.random.key(0), b3)
    assert "node_encoder" not in v3["params"]["gnn_node"]
    out3 = model3.apply(v3, b3)
    assert np.all(np.isfinite(np.asarray(out3)))


def test_ogb_center_pool_virtual(ogb_batch):
    import dataclasses as dc

    b = dc.replace(
        ogb_batch,
        node_segment=ogb_batch.node_graph,
        segment_graph=jnp.arange(ogb_batch.num_graphs, dtype=jnp.int32),
        segment_mask=jnp.ones(ogb_batch.num_graphs, bool),
    )
    cfg = OgbGNNConfig(
        num_tasks=1, num_layers=2, emb_dim=8, dropout=0.0,
        virtual_node=True, subgraph_pooling="center",
    )
    model = OgbGNN(cfg)
    variables = model.init(jax.random.key(0), b)
    out = model.apply(variables, b)
    assert out.shape == (b.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ogb_use_rp():
    """use_rp projects extras['rp'] into h0 (reference
    ogb_mol_gnn.py:449-450,531-535); the rp signal must reach the
    output, and zero rp must be a no-op wrt the rp-free graph."""
    from escgnn_tpu.featurize.rw import attach_return_prob

    raw = synthetic_ogb_mol(num_graphs=3, seed=1, num_tasks=1)
    ecfg = EscConfig(h=2, use_rd=True, self_loop=True)
    raw = [attach_return_prob(g, steps=8) for g in raw]
    feats = featurize_many(raw, ecfg)
    assert all("rp" in (g.extras or {}) for g in feats)  # survives featurize
    spec = BatchSpec.from_graphs(feats, batch_size=3)
    batch = jax.tree.map(jnp.asarray, pad_and_batch(feats, spec))
    assert batch.extras["rp"].shape == (batch.num_nodes, 8)

    cfg = OgbGNNConfig(num_tasks=1, num_layers=1, emb_dim=8, dropout=0.0,
                       virtual_node=False, use_rp=8)
    model = OgbGNN(cfg)
    variables = model.init(jax.random.key(0), batch)
    out = model.apply(variables, batch)
    assert out.shape == (batch.num_graphs, 1)
    assert "rp_projection" in variables["params"]["gnn_node"]

    # perturbing rp changes the output (the feature is actually consumed)
    batch2 = batch.replace(
        extras={**batch.extras, "rp": batch.extras["rp"] + 1.0}
    )
    out2 = model.apply(variables, batch2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_ogb_uniform_dedup_matches_flat():
    """The flagship-playbook layout (uniform per-graph blocks + dedup
    ESC rows) must predict what the flat/width layout predicts on real
    graphs — same params, different physical layout (round-3 port of
    the NestedGIN_eff optimization recipe to OgbGNN)."""
    raw = synthetic_ogb_mol(num_graphs=4, seed=1, num_tasks=2)
    ecfg = EscConfig(h=2, use_rd=True, self_loop=True)
    feats = featurize_many(raw, ecfg)
    b_flat = jax.tree.map(
        jnp.asarray,
        pad_and_batch(feats, BatchSpec.from_graphs(feats, batch_size=4)),
    )
    b_uni = jax.tree.map(
        jnp.asarray,
        pad_and_batch(
            feats,
            BatchSpec.uniform(feats, batch_size=4, enc_layout="dedup"),
        ),
    )
    assert b_uni.nodes_per_graph is not None
    assert b_uni.enc_row_weight is not None

    cfg = OgbGNNConfig(
        num_tasks=2, num_layers=3, emb_dim=24, dropout=0.0,
        virtual_node=True, graph_pooling="mean",
    )
    model = OgbGNN(cfg)
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


def test_ogb_bf16_runs_and_grads_flow():
    raw = synthetic_ogb_mol(num_graphs=3, seed=2, num_tasks=1)
    ecfg = EscConfig(h=2, use_rd=True, self_loop=True)
    feats = featurize_many(raw, ecfg)
    b = jax.tree.map(
        jnp.asarray,
        pad_and_batch(
            feats,
            BatchSpec.uniform(feats, batch_size=3, enc_layout="dedup"),
        ),
    )
    cfg = OgbGNNConfig(
        num_tasks=1, num_layers=2, emb_dim=16, dropout=0.0,
        virtual_node=True, compute_dtype="bfloat16",
    )
    model = OgbGNN(cfg)
    variables = model.init(jax.random.key(0), b)
    params, bs = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def grads_fn(p):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": bs}, b,
                deterministic=True, use_running_average=False,
                mutable=["batch_stats"],
            )
            return masked_bce_with_logits(out, b)

        return jax.grad(loss_fn)(p)

    g = grads_fn(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.7
