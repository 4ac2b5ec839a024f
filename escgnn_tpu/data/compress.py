"""Lossless compressed device-resident batch pools.

The t2@80k data-scaling run (BASELINE.md) is blocked from 160k+ by pool
HBM: a stacked f32/int32 train pool is ~12.6 MB/batch on counting shapes,
and the tunnel's device_put RSS leak rules out streaming. But the pool
content is almost entirely small non-negative integers — ESC bucket ids
and counts, categorical features, block-local edge indices — and the
dominant array (`enc_countmat`, 65% of the pool) is an f32 count matrix
whose entries are tiny ints.

`compress_tree` downcasts every leaf to the smallest integer dtype that
holds its exact value range (f32 leaves only when they are exactly
integral — lossless by construction); `make_decoder` returns the inverse
cast, applied on device inside the scanned train step where it fuses
into the consumers. Counting pools shrink ~3x (12.6 -> ~4.2 MB/batch),
fitting t2@160k in HBM. Fills the role of torch DataLoader re-collation
(reference `dataloader.py:24-48`) under the static-pool design.
"""

from __future__ import annotations

import numpy as np

_SMALL_INTS = (np.int8, np.int16, np.int32)


def _compress_leaf(v):
    """-> (possibly downcast array, original dtype str | None).

    The meta is the ORIGINAL dtype for every array leaf — even when no
    downcast applied — so one decoder built from one stack is valid for
    any other stack of the same structure (a leaf may compress in the
    val stack but not the test stack; the decoder always casts back to
    the original dtype, a no-op where nothing was compressed)."""
    if not hasattr(v, "dtype"):
        return v, None
    v = np.asarray(v)
    orig = v.dtype
    meta = str(np.dtype(orig))
    if v.ndim == 0 or v.size == 0 or orig == np.bool_:
        return v, meta
    if np.issubdtype(orig, np.integer):
        lo, hi = int(v.min()), int(v.max())
        for dt in _SMALL_INTS:
            info = np.iinfo(dt)
            if info.min <= lo and hi <= info.max:
                if np.dtype(dt).itemsize < orig.itemsize:
                    return v.astype(dt), meta
                return v, meta
        return v, meta
    if np.issubdtype(orig, np.floating):
        if not np.all(np.isfinite(v)):
            return v, meta
        r = np.round(v)
        if not np.array_equal(r, v):
            return v, meta
        lo, hi = int(r.min()), int(r.max())
        for dt in (np.int8, np.int16):
            info = np.iinfo(dt)
            if info.min <= lo and hi <= info.max:
                return r.astype(dt), meta
        return v, meta
    return v, meta


def compress_tree(tree):
    """Downcast each leaf losslessly. Returns (compressed_tree, metas);
    pass `metas` (a {leaf path: original dtype} dict) to
    `make_decoder`."""
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path

    leaves_with_path, treedef = tree_flatten_with_path(tree)
    out, metas = [], {}
    for path, v in leaves_with_path:
        cv, m = _compress_leaf(v)
        out.append(cv)
        metas[keystr(path)] = m
    return jax.tree.unflatten(treedef, out), metas


def compress_tree_like(tree, ref_compressed):
    """Cast `tree`'s leaves to the dtypes of an already-compressed
    reference tree (so every pool shares one decoder and one compiled
    program), asserting the cast is lossless for THIS tree's values."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    ref_leaves = jax.tree.leaves(ref_compressed)
    assert len(leaves) == len(ref_leaves)
    out = []
    for v, r in zip(leaves, ref_leaves):
        if not hasattr(v, "dtype") or v.dtype == r.dtype:
            out.append(v)
            continue
        v = np.asarray(v)
        cv = v.astype(r.dtype)
        assert np.array_equal(cv.astype(v.dtype), v), (
            "pool leaf not losslessly castable to the first pool's "
            f"compressed dtype {r.dtype} (orig {v.dtype})"
        )
        out.append(cv)
    return jax.tree.unflatten(treedef, out)


def make_decoder(metas):
    """Device-side inverse of `compress_tree`: casts every leaf back to
    its (canonicalized) original dtype — a no-op for leaves that were
    not downcast. Keyed by leaf PATH, so a decoder built from one stack
    also restores structurally-reduced views of it (e.g. the ep
    shardings drop the sorted-CSR leaves); unknown paths pass through.
    Identity-cheap — the casts fuse into the first consumer under jit,
    and reading int8 rows from HBM is 4x less traffic than the f32
    they decode to."""
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path

    targets = {
        k: None if m is None else jax.dtypes.canonicalize_dtype(np.dtype(m))
        for k, m in metas.items()
    }

    def decode(tree):
        leaves_with_path, treedef = tree_flatten_with_path(tree)
        out = []
        for path, l in leaves_with_path:
            t = targets.get(keystr(path))
            out.append(l if t is None or l.dtype == t else l.astype(t))
        return jax.tree.unflatten(treedef, out)

    return decode


def pool_nbytes(tree) -> int:
    import jax

    return sum(
        getattr(x, "nbytes", 0) for x in jax.tree.leaves(tree)
    )
