import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.models.ppgn import PPGN, PPGNConfig, diag_offdiag_meanpool
from tests.test_model import make_graphs, to_jax


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    graphs = make_graphs(rng, k=3)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    return to_jax(pad_and_batch(graphs, spec)), graphs


def test_ppgn_graph_level(batch):
    b, graphs = batch
    cfg = PPGNConfig(emb_dim=8, num_rb_layers=2, max_nodes=16)
    model = PPGN(cfg)
    variables = model.init(jax.random.key(0), b)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, b)
    assert out.shape == (b.num_graphs, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ppgn_node_level(batch):
    b, graphs = batch
    cfg = PPGNConfig(emb_dim=8, num_rb_layers=2, max_nodes=16, node_level=True)
    model = PPGN(cfg)
    variables = model.init(jax.random.key(1), b)
    out = model.apply(variables, b)
    assert out.shape == (b.num_nodes, 1)
    real = np.asarray(out)[np.asarray(b.node_mask)]
    assert np.all(np.isfinite(real))


def test_ppgn_padding_invariance(batch):
    """A bigger node budget must not change outputs (dense masking)."""
    b, graphs = batch
    spec1 = BatchSpec.from_graphs(graphs, batch_size=3)
    spec2 = BatchSpec(
        num_graphs=4,
        num_nodes=spec1.num_nodes + 24,
        num_edges=spec1.num_edges + 128,
        enc_width=spec1.enc_width,
        y_is_node_level=spec1.y_is_node_level,
    )
    b2 = to_jax(pad_and_batch(graphs, spec2))
    cfg = PPGNConfig(emb_dim=8, num_rb_layers=2, max_nodes=16, use_esc=False)
    model = PPGN(cfg)
    variables = model.init(jax.random.key(0), b)
    o1 = np.asarray(model.apply(variables, b))
    o2 = np.asarray(model.apply(variables, b2))
    # fp32 accumulation order differs between batch shapes; semantics equal
    np.testing.assert_allclose(
        o1[np.asarray(b.graph_mask)], o2[np.asarray(b2.graph_mask)],
        rtol=2e-3, atol=1e-3,
    )


def test_diag_offdiag_meanpool_golden():
    # one graph, 2 real nodes of 3 slots, known values
    x = jnp.zeros((1, 3, 3, 1))
    x = x.at[0, 0, 0, 0].set(1.0).at[0, 1, 1, 0].set(3.0)
    x = x.at[0, 0, 1, 0].set(5.0).at[0, 1, 0, 0].set(7.0)
    nm = jnp.array([[True, True, False]])
    out = np.asarray(diag_offdiag_meanpool(x, nm, "graph"))
    assert np.isclose(out[0, 0], 2.0)  # mean diag (1+3)/2
    assert np.isclose(out[0, 1], 6.0)  # mean offdiag (5+7)/(4-2)


def test_ppgn_bf16_close_to_f32_and_grads_finite():
    """compute_dtype='bfloat16' regular blocks (f32 params/accumulate/
    head) stay close to the f32 forward and train with finite grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.models.ppgn import PPGN, PPGNConfig
    from tests.test_model import make_graphs

    rng = np.random.default_rng(3)
    graphs = make_graphs(rng, k=3)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))

    kw = dict(emb_dim=16, num_rb_layers=2,
              max_nodes=spec.max_nodes_per_graph, node_level=True,
              use_esc=True)
    m32 = PPGN(PPGNConfig(**kw))
    m16 = PPGN(PPGNConfig(compute_dtype="bfloat16", **kw))
    variables = m32.init(jax.random.key(0), b)

    o32 = np.asarray(m32.apply(variables, b))
    o16 = np.asarray(m16.apply(variables, b))
    mask = np.asarray(b.node_mask)
    scale = np.maximum(np.abs(o32[mask]).max(), 1e-3)
    assert np.max(np.abs((o32 - o16)[mask])) / scale < 0.05

    @jax.jit
    def grads_fn(p):
        def loss_fn(p):
            out, _ = m16.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                b, deterministic=True, use_running_average=False,
                mutable=["batch_stats"],
            )
            err = jnp.abs(out - b.y) * b.node_mask[:, None]
            return err.sum() / b.node_mask.sum()

        return jax.grad(loss_fn)(p)

    g = grads_fn(variables["params"])
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g)
    )
