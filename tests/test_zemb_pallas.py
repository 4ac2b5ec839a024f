"""Pallas z-emb kernel correctness (interpret mode on CPU).

The kernel computes in bf16 (C tile + table) with f32 accumulation, so
agreement with the f32 gather reference is rounding-level, checked via
cosine similarity and a scale-relative error bound.
"""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.ops.zemb import _gather_reduce
from escgnn_tpu.ops.zemb_pallas import zemb_pallas


def _close_bf16(out, ref):
    a = np.asarray(out).ravel()
    b = np.asarray(ref).ravel()
    cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.9999, cos
    scale = np.abs(b).max() + 1e-12
    assert np.max(np.abs(a - b)) / scale < 3e-2


def test_pallas_matches_gather(rng):
    E, P, Z, H = 512, 8, 64, 16
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int32))
    cnt = jnp.asarray((rng.random((E, P)) * 3).round().astype(np.float32))
    out = zemb_pallas(table, idx, cnt, block_e=128, interpret=True)
    ref = _gather_reduce(table, idx, cnt)
    _close_bf16(out, ref)


def test_pallas_int16_wire(rng):
    E, P, Z, H = 256, 4, 32, 8
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int16))
    cnt = jnp.asarray(rng.integers(0, 5, (E, P)).astype(np.int16))
    out = zemb_pallas(table, idx, cnt, block_e=128, interpret=True)
    ref = _gather_reduce(table, idx.astype(jnp.int32),
                         cnt.astype(jnp.float32))
    _close_bf16(out, ref)


def test_pallas_duplicate_buckets_accumulate(rng):
    # the same bucket appearing twice in one edge's row must sum
    E, P, Z, H = 128, 4, 16, 8
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(np.full((E, P), 3, np.int32))
    cnt = jnp.asarray(np.ones((E, P), np.float32))
    out = np.asarray(zemb_pallas(table, idx, cnt, block_e=128,
                                 interpret=True))
    want = P * np.asarray(table)[3]
    np.testing.assert_allclose(out[0], want, rtol=2e-2, atol=1e-3)


def test_countmat_pallas_forward_and_c(rng):
    from escgnn_tpu.ops.zemb_pallas import zemb_countmat_pallas

    R, P, Z, H = 256, 12, 128, 32
    idx = jnp.asarray(rng.integers(0, Z, (R, P)).astype(np.int32))
    cnt = jnp.asarray(rng.integers(0, 4, (R, P)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    z, C = zemb_countmat_pallas(table, idx, cnt, block_r=128, interpret=True)
    # dense oracle (duplicate idx within a row must accumulate)
    Cd = np.zeros((R, Z), np.float32)
    np.add.at(Cd, (np.repeat(np.arange(R), P), np.asarray(idx).ravel()),
              np.asarray(cnt).ravel())
    np.testing.assert_allclose(np.asarray(C), Cd, atol=1e-6)
    # oracle with the kernel's own precision (bf16 matmul, f32 accumulate)
    oracle = jnp.dot(
        jnp.asarray(Cd).astype(jnp.bfloat16), table.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_countmat_pallas_grad_matches_countmat(rng):
    from escgnn_tpu.ops import zemb
    from escgnn_tpu.ops.zemb_pallas import set_interpret

    R, P, Z, H = 128, 8, 128, 16
    idx = jnp.asarray(rng.integers(0, Z, (R, P)).astype(np.int32))
    cnt = jnp.asarray(rng.integers(0, 4, (R, P)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))

    def loss(t, impl):
        zemb.set_impl(impl)
        try:
            return jnp.sum(jnp.sin(zemb.zemb_weighted_gather(t, idx, cnt)))
        finally:
            zemb.set_impl("countmat")

    set_interpret(True)
    try:
        g_ref = jax.grad(lambda t: loss(t, "countmat"))(table)
        g_pal = jax.grad(lambda t: loss(t, "countmat_pallas"))(table)
    finally:
        set_interpret(False)
    a = np.asarray(g_pal).ravel()
    b = np.asarray(g_ref).ravel()
    cos = a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.999, cos  # bf16 fwd/bwd vs f32 reference
    assert np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12) < 0.05
