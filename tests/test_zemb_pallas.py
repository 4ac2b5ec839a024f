"""Pallas z-emb kernel correctness (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from escgnn_tpu.ops.zemb import _gather_reduce
from escgnn_tpu.ops.zemb_pallas import zemb_pallas


def test_pallas_matches_gather(rng):
    E, P, Z, H = 512, 8, 64, 16
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int32))
    cnt = jnp.asarray((rng.random((E, P)) * 3).astype(np.float32))
    out = zemb_pallas(table, idx, cnt, block_e=128, interpret=True)
    ref = _gather_reduce(table, idx, cnt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_int16_wire(rng):
    E, P, Z, H = 256, 4, 32, 8
    table = jnp.asarray(rng.normal(size=(Z, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Z, (E, P)).astype(np.int16))
    cnt = jnp.asarray(rng.integers(0, 5, (E, P)).astype(np.int16))
    out = zemb_pallas(table, idx, cnt, block_e=128, interpret=True)
    ref = _gather_reduce(table, idx.astype(jnp.int32),
                         cnt.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
