import jax.numpy as jnp
import numpy as np

from escgnn_tpu.ops.segment import (
    masked_mean,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_sum,
)


def test_segment_sum_masked(rng):
    vals = rng.normal(size=(20, 4)).astype(np.float32)
    ids = rng.integers(0, 5, size=20)
    mask = rng.random(20) < 0.7
    out = segment_sum(jnp.array(vals), jnp.array(ids), 5, jnp.array(mask))
    ref = np.zeros((5, 4), np.float32)
    for i in range(20):
        if mask[i]:
            ref[ids[i]] += vals[i]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_segment_mean_empty_segments(rng):
    vals = rng.normal(size=(6, 3)).astype(np.float32)
    ids = np.array([0, 0, 2, 2, 2, 4])
    out = segment_mean(jnp.array(vals), jnp.array(ids), 6)
    ref = np.zeros((6, 3), np.float32)
    ref[0] = vals[:2].mean(0)
    ref[2] = vals[2:5].mean(0)
    ref[4] = vals[5]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_segment_max_min(rng):
    vals = rng.normal(size=(10,)).astype(np.float32)
    ids = rng.integers(0, 4, size=10)
    mask = np.ones(10, bool)
    mask[0] = False
    mx = segment_max(jnp.array(vals), jnp.array(ids), 5, jnp.array(mask))
    mn = segment_min(jnp.array(vals), jnp.array(ids), 5, jnp.array(mask))
    for s in range(5):
        sel = vals[1:][ids[1:] == s]
        if len(sel):
            assert np.isclose(mx[s], sel.max())
            assert np.isclose(mn[s], sel.min())
        else:
            assert mx[s] == 0.0 and mn[s] == 0.0


def test_segment_softmax_sums_to_one(rng):
    logits = rng.normal(size=(12,)).astype(np.float32) * 5
    ids = np.sort(rng.integers(0, 3, size=12))
    mask = rng.random(12) < 0.8
    sm = np.asarray(
        segment_softmax(jnp.array(logits), jnp.array(ids), 3, jnp.array(mask))
    )
    for s in range(3):
        sel = sm[(ids == s) & mask]
        if len(sel):
            assert np.isclose(sel.sum(), 1.0, atol=1e-5)
    assert np.all(sm[~mask] == 0.0)


def test_masked_mean(rng):
    vals = rng.normal(size=(8, 2)).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 0, 1, 1], bool)
    out = masked_mean(jnp.array(vals), jnp.array(mask), axis=0)
    np.testing.assert_allclose(np.asarray(out), vals[mask].mean(0), rtol=1e-5)
