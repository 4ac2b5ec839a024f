"""Pallas PPGN pooling kernel (ops/ppgn_pool.py) vs the jnp reference:
forward and gradient equality (interpret mode on CPU), plus the
bf16-read accumulation change in diag_offdiag_meanpool being exactly
the old cast-first math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.ops.ppgn_pool import (
    diag_row_col_pool,
    diag_row_col_pool_xla,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("G,N,C", [(8, 8, 128), (4, 24, 128)])
def test_pallas_pool_matches_xla_forward(dtype, G, N, C):
    x = jax.random.normal(jax.random.key(0), (G, N, N, C)).astype(dtype)
    got = jax.jit(diag_row_col_pool)(x)
    want = jax.jit(diag_row_col_pool_xla)(x)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_pallas_pool_gradient_matches_xla():
    G, N, C = 4, 8, 128
    x = jax.random.normal(jax.random.key(1), (G, N, N, C))

    def f(fn):
        return lambda x: jnp.sum(jnp.sin(fn(x)))

    g_pallas = jax.jit(jax.grad(f(diag_row_col_pool)))(x)
    g_xla = jax.jit(jax.grad(f(diag_row_col_pool_xla)))(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-5, atol=1e-6
    )


def test_meanpool_accumulation_matches_cast_first():
    # jnp.sum(bf16, dtype=f32) must equal sum(bf16.astype(f32)) — the
    # r05 byte-halving change relies on this equivalence
    from escgnn_tpu.models.ppgn import diag_offdiag_meanpool

    G, N, C = 4, 10, 16
    x = jax.random.normal(jax.random.key(2), (G, N, N, C)).astype(
        jnp.bfloat16
    )
    nm = jnp.arange(N)[None, :] < jnp.asarray([10, 7, 5, 1])[:, None]
    for level in ("graph", "node"):
        new = diag_offdiag_meanpool(x, nm, level=level)
        old = diag_offdiag_meanpool(
            x.astype(jnp.float32), nm, level=level
        )
        assert new.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(new), np.asarray(old), rtol=1e-6, atol=1e-6
        )


def test_ppgn_model_pallas_pool_end_to_end():
    """PPGN with pool_impl=pallas trains one step and matches the xla
    pooling's loss/grads."""
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
    from escgnn_tpu.data.counting import (
        CountingDatasetConfig,
        generate_counting_graphs,
        normalize_targets,
    )
    from escgnn_tpu.featurize.escgnn import EscConfig
    from escgnn_tpu.featurize.transform import featurize_many
    from escgnn_tpu.models.ppgn import PPGN, PPGNConfig
    from escgnn_tpu.train.loop import l1_node_loss

    splits = generate_counting_graphs(
        CountingDatasetConfig(num_graphs=12, seed=0)
    )
    splits, _, _ = normalize_targets(splits, 0)
    feats = featurize_many(
        splits["train"][:4], EscConfig(h=2, use_rd=True, self_loop=True)
    )
    spec = BatchSpec.from_graphs(feats, batch_size=4)
    b = jax.tree.map(jnp.asarray, pad_and_batch(feats, spec))

    losses, grads = {}, {}
    for impl in ("xla", "pallas"):
        model = PPGN(PPGNConfig(
            emb_dim=32, num_rb_layers=2,
            max_nodes=spec.max_nodes_per_graph, node_level=True,
            use_esc=True, pool_impl=impl,
        ))
        var = model.init(jax.random.key(0), b)

        @jax.jit
        def loss_fn(params, var=var, model=model):
            out, _ = model.apply(
                {"params": params, "batch_stats": var.get("batch_stats", {})},
                b, deterministic=True, use_running_average=False,
                mutable=["batch_stats"],
            )
            return l1_node_loss(out, b)

        losses[impl], grads[impl] = jax.value_and_grad(loss_fn)(
            var["params"]
        )
    np.testing.assert_allclose(
        float(losses["xla"]), float(losses["pallas"]), rtol=1e-6
    )
    for a, c in zip(jax.tree.leaves(grads["xla"]),
                    jax.tree.leaves(grads["pallas"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6
        )
