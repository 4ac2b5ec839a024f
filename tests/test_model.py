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


def make_graphs(rng, k=3, node_level=True):
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=9)
        y = (
            rng.normal(size=(n, 1)).astype(np.float32)
            if node_level
            else rng.normal(size=(1,)).astype(np.float32)
        )
        g = GraphData(
            num_nodes=n, edge_index=ei, x=np.ones((n, 10), np.float32), y=y
        )
        graphs.append(esc_transform(g, cfg))
    return graphs


def to_jax(b):
    return jax.tree.map(jnp.asarray, b)


@pytest.fixture(scope="module")
def setup():
    """One shared model+batch+variables (init is tracing-bound and slow on
    the 2-core CI CPU)."""
    rng = np.random.default_rng(0)
    cfg = NestedGINEffConfig(hidden=16, num_layers=2, graph_pred=False)
    model = NestedGINEff(cfg)
    graphs = make_graphs(rng, k=2)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = to_jax(pad_and_batch(graphs, spec))
    variables = model.init(jax.random.key(0), b)
    return model, graphs, spec, b, variables


def test_forward_node_level(setup):
    model, _, _, b, variables = setup
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, b)
    assert out.shape == (b.num_nodes, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_padding_invariance(setup):
    """Extra padding must not change predictions on real nodes: BN stats,
    segment sums and the head are all masked."""
    model, graphs, spec1, b1, variables = setup
    big_spec = BatchSpec(
        num_graphs=spec1.num_graphs + 2,
        num_nodes=spec1.num_nodes + 32,
        num_edges=spec1.num_edges + 128,
        enc_width=spec1.enc_width + 8,
        y_is_node_level=spec1.y_is_node_level,
    )
    b2 = to_jax(pad_and_batch(graphs, big_spec))

    @jax.jit
    def fwd_train(v, b):
        out, _ = model.apply(
            v, b, use_running_average=False, mutable=["batch_stats"]
        )
        return out

    out1, out2 = fwd_train(variables, b1), fwd_train(variables, b2)
    m1 = np.asarray(b1.node_mask)
    m2 = np.asarray(b2.node_mask)
    np.testing.assert_allclose(
        np.asarray(out1)[m1], np.asarray(out2)[m2], rtol=2e-4, atol=2e-5
    )


def test_grad_flows(setup):
    model, _, _, b, variables = setup
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    @jax.jit
    def grads_fn(p):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": bs},
                b,
                use_running_average=False,
                mutable=["batch_stats"],
            )
            err = jnp.abs(out - b.y) * b.node_mask[:, None]
            return err.sum() / b.node_mask.sum()

        return jax.grad(loss_fn)(p)

    g = grads_fn(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.7


def test_uniform_layout_matches_flat(setup):
    """The uniform per-graph block layout (dense-einsum GINE path) must
    predict exactly what the flat layout (take + segment_sum) predicts on
    real nodes — same graphs, same params, different physical layout."""
    model, graphs, _, b_flat, variables = setup
    uspec = BatchSpec.uniform(graphs, batch_size=2)
    b_uni = to_jax(pad_and_batch(graphs, uspec))
    assert b_uni.nodes_per_graph is not None

    @jax.jit
    def fwd_train(v, b):
        out, _ = model.apply(
            v, b, use_running_average=False, mutable=["batch_stats"]
        )
        return out

    out_f = np.asarray(fwd_train(variables, b_flat))
    out_u = np.asarray(fwd_train(variables, b_uni))
    mf = np.asarray(b_flat.node_mask)
    mu = np.asarray(b_uni.node_mask)
    # flat layout packs graphs consecutively; uniform strides by n_u — the
    # masked rows enumerate the same real nodes in the same order either way
    np.testing.assert_allclose(out_f[mf], out_u[mu], rtol=2e-4, atol=2e-5)


def test_uniform_grads_flow(setup):
    model, graphs, _, _, variables = setup
    uspec = BatchSpec.uniform(graphs, batch_size=2)
    b = to_jax(pad_and_batch(graphs, uspec))
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    @jax.jit
    def grads_fn(p):
        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": bs},
                b,
                use_running_average=False,
                mutable=["batch_stats"],
            )
            err = jnp.abs(out - b.y) * b.node_mask[:, None]
            return err.sum() / b.node_mask.sum()

        return jax.grad(loss_fn)(p)

    g = grads_fn(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_forward_graph_level():
    rng = np.random.default_rng(1)
    cfg = NestedGINEffConfig(
        hidden=16, num_layers=2, graph_pred=True, pool="add",
        use_x_embedding_jk=False,
    )
    model = NestedGINEff(cfg)
    graphs = make_graphs(rng, k=2, node_level=False)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = to_jax(pad_and_batch(graphs, spec))
    variables = model.init(jax.random.key(0), b)
    out = model.apply(variables, b)
    assert out.shape == (b.num_graphs, 1)
