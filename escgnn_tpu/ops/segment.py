"""Masked segment reductions — the gather/scatter substrate.

These fill the role torch_scatter's `scatter_add/mean/min/max` and PyG's
`global_add_pool`/`global_mean_pool` play in the reference (used throughout,
e.g. reference `zinc_models.py:5`, `run_graphcount.py:155`): every pooling
and message aggregation in the framework reduces to one of these.

TPU notes:
  * `jax.ops.segment_sum` lowers to an XLA scatter-add. With edges sorted
    by segment id at collate time we pass `indices_are_sorted=True`, which
    lets XLA use a cheaper implementation.
  * All ops take an explicit validity mask instead of relying on "out of
    range ids are dropped" tricks, so padding policy lives in one place.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _apply_mask(values: jax.Array, mask: Optional[jax.Array], fill=0.0) -> jax.Array:
    if mask is None:
        return values
    m = mask.reshape(mask.shape + (1,) * (values.ndim - mask.ndim))
    return jnp.where(m, values, jnp.asarray(fill, dtype=values.dtype))


def segment_sum(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """sum_i values[i] into rows segment_ids[i]; masked-out rows contribute 0."""
    values = _apply_mask(values, mask)
    return jax.ops.segment_sum(
        values,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Masked segment mean; empty segments yield 0."""
    s = segment_sum(values, segment_ids, num_segments, mask, indices_are_sorted)
    if mask is None:
        ones = jnp.ones(values.shape[0], dtype=s.dtype)
    else:
        ones = mask.astype(s.dtype)
    cnt = jax.ops.segment_sum(
        ones, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - 1))


def segment_max(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
    empty_value: float = 0.0,
) -> jax.Array:
    """Masked segment max; empty segments yield `empty_value`."""
    neg = jnp.asarray(jnp.finfo(values.dtype).min, dtype=values.dtype)
    values = _apply_mask(values, mask, fill=neg)
    out = jax.ops.segment_max(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(out <= neg, jnp.asarray(empty_value, out.dtype), out)


def segment_min(
    values: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
    empty_value: float = 0.0,
) -> jax.Array:
    pos = jnp.asarray(jnp.finfo(values.dtype).max, dtype=values.dtype)
    values = _apply_mask(values, mask, fill=pos)
    out = jax.ops.segment_min(
        values, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(out >= pos, jnp.asarray(empty_value, out.dtype), out)


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Numerically stable softmax within segments (for attention pooling).

    Masked rows are filled with the finite dtype-min BEFORE the exp: a
    masked logit can exceed its segment's masked max (padding edges carry
    arbitrary values), and exp would overflow to inf before the mask —
    forward-masked to zero but poisoning gradients with inf * 0."""
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    filled = _apply_mask(logits, mask, fill=neg)
    mx = segment_max(filled, segment_ids, num_segments, None,
                     indices_are_sorted)
    ex = jnp.exp(jnp.maximum(filled - mx[segment_ids], neg))
    ex = _apply_mask(ex, mask)
    denom = segment_sum(ex, segment_ids, num_segments, None, indices_are_sorted)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, denom.dtype))
    return ex / denom[segment_ids]


def pool_nodes_to_graphs(
    values: jax.Array,
    batch,
    reduce: str = "sum",
) -> jax.Array:
    """Pool per-node rows to per-graph rows: (N, F) -> (G, F).

    On the uniform per-graph block layout (batch.nodes_per_graph set,
    N == G * n_u) this is a masked reshape + axis reduction — no scatter
    at all (the segment-sum was ~140 us/step of the flagship profile).
    Otherwise falls back to the masked sorted segment reduction."""
    G = batch.num_graphs
    n_u = getattr(batch, "nodes_per_graph", None)
    mask = batch.node_mask
    if n_u is not None and values.shape[0] == G * n_u:
        v = values.reshape(G, n_u, *values.shape[1:])
        m = mask.reshape(G, n_u)
        mm = m.reshape(m.shape + (1,) * (v.ndim - 2))
        s = jnp.sum(jnp.where(mm, v, 0.0), axis=1)
        if reduce == "sum":
            return s
        if reduce == "mean":
            cnt = jnp.maximum(jnp.sum(m.astype(s.dtype), axis=1), 1.0)
            return s / cnt.reshape((G,) + (1,) * (s.ndim - 1))
        raise ValueError(reduce)
    fn = {"sum": segment_sum, "mean": segment_mean}[reduce]
    return fn(values, batch.node_graph, G, mask=mask, indices_are_sorted=True)


def pool_copy_blocks(
    values: jax.Array,
    batch,
    num_segments: int,
    reduce: str = "mean",
) -> "jax.Array | None":
    """Pool node rows to subgraph-copy rows on the uniform per-copy
    layout (data/uniform_copies.py): (N, F) -> (S, F) as a masked
    reshape + axis reduction — block index == copy segment id, so the
    result rows align 1:1 with the copy-level segment arrays. Returns
    None when the batch is not copy-uniform (caller falls back to the
    masked sorted segment reduction)."""
    regions = getattr(batch, "seg_regions", None)
    if regions is not None:
        (cs, n_s, _), (cl, n_l, _) = regions
        if num_segments != cs + cl or values.shape[0] != (
            cs * n_s + cl * n_l
        ):
            return None
        outs = []
        off = 0
        for c, n in ((cs, n_s), (cl, n_l)):
            if c == 0:
                continue
            v = values[off:off + c * n].reshape(c, n, *values.shape[1:])
            m = batch.node_mask[off:off + c * n].reshape(c, n)
            mm = m.reshape(m.shape + (1,) * (v.ndim - 2))
            s = jnp.sum(jnp.where(mm, v, 0.0), axis=1)
            if reduce == "mean":
                cnt = jnp.maximum(jnp.sum(m.astype(s.dtype), axis=1), 1.0)
                s = s / cnt.reshape((c,) + (1,) * (s.ndim - 1))
            elif reduce != "sum":
                raise ValueError(reduce)
            outs.append(s)
            off += c * n
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    n_c = getattr(batch, "nodes_per_seg", None)
    if n_c is None or values.shape[0] != num_segments * n_c:
        return None
    m = batch.node_mask.reshape(num_segments, n_c)
    v = values.reshape(num_segments, n_c, *values.shape[1:])
    mm = m.reshape(m.shape + (1,) * (v.ndim - 2))
    s = jnp.sum(jnp.where(mm, v, 0.0), axis=1)
    if reduce == "sum":
        return s
    if reduce == "mean":
        cnt = jnp.maximum(jnp.sum(m.astype(s.dtype), axis=1), 1.0)
        return s / cnt.reshape((num_segments,) + (1,) * (s.ndim - 1))
    raise ValueError(reduce)


def masked_mean(values: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    """Mean of `values` over positions where mask is true."""
    m = mask.reshape(mask.shape + (1,) * (values.ndim - mask.ndim))
    s = jnp.sum(jnp.where(m, values, 0.0), axis=axis)
    n = jnp.maximum(jnp.sum(m, axis=axis), 1)
    return s / n


def gather(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather values[idx] (alias, kept for symmetry)."""
    return jnp.take(values, idx, axis=0)
