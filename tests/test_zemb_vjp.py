"""Correctness of the z-embedding reduce implementations vs XLA's native
gather+einsum: the custom-VJP "gather" path and the default "countmat"
(dense count matrix, plain autodiff) path."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.ops import zemb as zemb_mod
from escgnn_tpu.ops.zemb import zemb_weighted_gather, _gather_reduce


@contextlib.contextmanager
def impl(name):
    prev = zemb_mod._IMPL
    zemb_mod.set_impl(name)
    try:
        yield
    finally:
        zemb_mod.set_impl(prev)


def _problem(rng, E=256, P=8, Z=50, H=16):
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int32))
    cnt = jnp.asarray((rng.random((E, P)) * 3).astype(np.float32))
    return table, idx, cnt


def test_custom_vjp_matches_native(rng):
    table, idx, cnt = _problem(rng)

    with impl("gather"):
        out = zemb_weighted_gather(table, idx, cnt)
        ref = _gather_reduce(table, idx, cnt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

        def loss_custom(t, c):
            return jnp.sum(jnp.sin(zemb_weighted_gather(t, idx, c)))

        def loss_native(t, c):
            return jnp.sum(jnp.sin(_gather_reduce(t, idx, c)))

        # exact agreement with the fp32 backward
        zemb_mod.set_backward_matmul_dtype(jnp.float32)
        try:
            gt_c, gc_c = jax.grad(loss_custom, argnums=(0, 1))(table, cnt)
            gt_n, gc_n = jax.grad(loss_native, argnums=(0, 1))(table, cnt)
            np.testing.assert_allclose(
                np.asarray(gt_c), np.asarray(gt_n), rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(gc_c), np.asarray(gc_n), rtol=1e-5, atol=1e-5
            )
            # bf16 default: rounding-level agreement (cosine > 0.999)
            zemb_mod.set_backward_matmul_dtype(jnp.bfloat16)
            gt_b = jax.grad(loss_custom)(table, cnt)
            a, b = np.asarray(gt_b).ravel(), np.asarray(gt_n).ravel()
            cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b))
            assert cos > 0.999
        finally:
            zemb_mod.set_backward_matmul_dtype(jnp.bfloat16)


def test_countmat_matches_native(rng):
    """The default dense-count-matrix path: forward values and BOTH grads
    (table via the transpose matmul, counts via the select autodiff) must
    match the native gather+einsum to f32 summation-order tolerance."""
    table, idx, cnt = _problem(rng)

    with impl("countmat"):
        out = zemb_weighted_gather(table, idx, cnt)
        ref = _gather_reduce(table, idx, cnt)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

        def loss_cm(t, c):
            return jnp.sum(jnp.sin(zemb_weighted_gather(t, idx, c)))

        def loss_native(t, c):
            return jnp.sum(jnp.sin(_gather_reduce(t, idx, c)))

        gt_c, gc_c = jax.grad(loss_cm, argnums=(0, 1))(table, cnt)
        gt_n, gc_n = jax.grad(loss_native, argnums=(0, 1))(table, cnt)
        np.testing.assert_allclose(
            np.asarray(gt_c), np.asarray(gt_n), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gc_c), np.asarray(gc_n), rtol=1e-4, atol=1e-5
        )


def test_countmat_duplicate_buckets(rng):
    """Repeated bucket ids within one row must accumulate (the count matrix
    sums over the width axis)."""
    Z, H = 10, 4
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray([[3, 3, 7, 0]], dtype=jnp.int32)
    cnt = jnp.asarray([[1.0, 2.0, 5.0, 0.0]], dtype=jnp.float32)
    with impl("countmat"):
        out = np.asarray(zemb_weighted_gather(table, idx, cnt))
    want = 3.0 * np.asarray(table[3]) + 5.0 * np.asarray(table[7])
    np.testing.assert_allclose(out[0], want, rtol=1e-6)


def test_custom_vjp_ragged_fallback(rng):
    # E not divisible by 64 -> scatter fallback path
    E, P, Z, H = 100, 4, 20, 8
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int32))
    cnt = jnp.asarray(rng.random((E, P)).astype(np.float32))

    with impl("gather"):
        def loss(t):
            return jnp.sum(zemb_weighted_gather(t, idx, cnt) ** 2)

        g = jax.grad(loss)(table)

    def loss_n(t):
        return jnp.sum(_gather_reduce(t, idx, cnt) ** 2)

    gn = jax.grad(loss_n)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gn), rtol=1e-5,
                               atol=1e-5)
