"""Structural-embedding reduce: the z_emb hot op.

Reference computes, per edge e (reference `zinc_models.py:590`,
`run_graphcount.py:155`):

    z_emb[e] = sum_{k in nnz(e)} count_k * table[bucket_k]

via flat COO triples + `global_add_pool` (a scatter-add). The TPU-native
form here uses the per-edge fixed-width layout (enc_idx/enc_cnt of shape
(E, P)): the reduce becomes a static gather + weighted sum over the P axis

    z_emb = einsum('eph,ep->eh', table[enc_idx], enc_cnt)

which XLA fuses into a single fast pass (tens of microseconds).

The *backward* w.r.t. the table is the transposed sparse matmul
dT[z] = sum_{(e,p): idx=z} cnt * dZ[e]. XLA's native transpose of the
gather is a scatter-add over E*P row updates, which lowers to a serial
loop on TPU (~13 ms at ZINC batch shapes — measured). The custom VJP
below instead processes edges in blocks: a compare-based one-hot
C_blk[b, z] = sum_p cnt * [idx == z] (VPU), then dT += C_blk^T @ dZ_blk
(MXU) — ~10x faster, no scatter anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# dtype of the blocked one-hot matmuls in the table backward. bf16 doubles
# MXU throughput; counts are small integers (exact in bf16) and gradient
# rounding noise is far below SGD noise. Set to jnp.float32 for exactness.
_BWD_MATMUL_DTYPE = jnp.bfloat16


def set_backward_matmul_dtype(dtype):
    global _BWD_MATMUL_DTYPE
    _BWD_MATMUL_DTYPE = dtype


# forward implementation:
#   "countmat" (default): materialize the dense per-row count matrix
#       C[r, z] = sum_p cnt[r, p] * [idx[r, p] == z]        (R, Z) f32
#     once per step (it is data — independent of the parameters), then
#       z_emb = C @ table          and autodiff gives  dT = C^T @ dZ
#     Both directions are single MXU matmuls; no (R, P, H) gather is ever
#     materialized and no scatter/while loop appears anywhere. Profiled on
#     the ZINC flagship step this replaces ~1.25 ms of gather + scan-VJP
#     with ~0.2 ms of build + matmuls.
#   "gather": XLA take + einsum forward, blocked one-hot-matmul custom VJP
#     (the previous default; still exact, more HBM traffic).
#   "pallas": VMEM-resident-table kernel (ops/zemb_pallas.py — opt-in).
_IMPL = "countmat"


def set_impl(impl: str):
    global _IMPL
    assert impl in ("gather", "pallas", "countmat", "countmat_pallas"), impl
    _IMPL = impl


def _count_matrix(enc_idx, enc_cnt, num_buckets: int):
    """Dense (R, Z) count matrix from the (R, P) width layout.

    Built with a broadcast compare + reduce over the width axis — a single
    VPU loop fusion writing only (R, Z); padding entries carry cnt == 0 so
    they vanish regardless of their idx. f32 (counts are small integers)
    keeps the matmuls bit-comparable with the exact gather path."""
    zr = jnp.arange(num_buckets, dtype=enc_idx.dtype)
    onehot = enc_idx[:, :, None] == zr[None, None, :]
    # no stop_gradient: the cnt->C path is a select, so autodiff yields the
    # exact dCnt when (and only when) someone differentiates wrt counts —
    # training grads are wrt params only and never build that path.
    return jnp.sum(
        jnp.where(onehot, enc_cnt[:, :, None].astype(jnp.float32), 0.0),
        axis=1,
    )


def _countmat_reduce(table, enc_idx, enc_cnt):
    C = _count_matrix(enc_idx, enc_cnt, table.shape[0])
    return jnp.dot(C, table, preferred_element_type=jnp.float32)


def _forward(table, enc_idx, enc_cnt):
    if _IMPL == "pallas":
        from escgnn_tpu.ops.zemb_pallas import zemb_pallas

        return zemb_pallas(table, enc_idx, enc_cnt)
    return _gather_reduce(table, enc_idx, enc_cnt)


def _gather_reduce(table, enc_idx, enc_cnt):
    rows = jnp.take(table, enc_idx, axis=0)  # (E, P, H)
    return jnp.einsum(
        "eph,ep->eh", rows, enc_cnt.astype(rows.dtype),
        preferred_element_type=jnp.float32,
    )


def zemb_weighted_gather(table, enc_idx, enc_cnt):
    """Per-edge weighted sum of embedding-table rows. Returns (E, H).

    Accepts the int16 wire format from the batcher (ids/counts cast here).
    """
    enc_idx = enc_idx.astype(jnp.int32)
    enc_cnt = enc_cnt.astype(jnp.float32)
    if _IMPL == "countmat":
        # plain autodiff: dT = C^T @ dZ is the transpose matmul, no custom VJP
        return _countmat_reduce(table, enc_idx, enc_cnt)
    if _IMPL == "countmat_pallas":
        return _zemb_countmat_pallas_core(table, enc_idx, enc_cnt)
    return _zemb_core(table, enc_idx, enc_cnt)


# --- fused Pallas count-matrix impl (dedup/compacted layout shapes) ---
# forward: one kernel builds the (R, Zc) count tile in VMEM and matmuls
# against the VMEM-resident active table, ALSO writing C out; backward:
# dT = C^T @ dU is then a single MXU matmul with no rebuild.


@partial(jax.custom_vjp, nondiff_argnums=())
def _zemb_countmat_pallas_core(table, enc_idx, enc_cnt):
    from escgnn_tpu.ops.zemb_pallas import zemb_countmat_pallas

    z, _ = zemb_countmat_pallas(table, enc_idx, enc_cnt)
    return z


def _zemb_cmp_fwd(table, enc_idx, enc_cnt):
    from escgnn_tpu.ops.zemb_pallas import zemb_countmat_pallas

    z, C = zemb_countmat_pallas(table, enc_idx, enc_cnt)
    return z, (C, table, enc_idx)


def _zemb_cmp_bwd(res, dZ):
    C, table, enc_idx = res
    mm = _BWD_MATMUL_DTYPE
    dT = jnp.dot(
        C.astype(mm).T, dZ.astype(mm), preferred_element_type=jnp.float32
    ).astype(table.dtype)
    # dCnt: gather + dot (dead-code-eliminated by XLA unless someone
    # actually differentiates w.r.t. the counts)
    rows = jnp.take(table, enc_idx, axis=0)
    dCnt = jnp.einsum(
        "rph,rh->rp", rows, dZ, preferred_element_type=jnp.float32
    )
    dIdx = np.zeros(enc_idx.shape, jax.dtypes.float0)
    return dT, dIdx, dCnt


_zemb_countmat_pallas_core.defvjp(_zemb_cmp_fwd, _zemb_cmp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def _zemb_core(table, enc_idx, enc_cnt):
    return _forward(table, enc_idx, enc_cnt)


def _zemb_fwd(table, enc_idx, enc_cnt):
    return _forward(table, enc_idx, enc_cnt), (table, enc_idx, enc_cnt)


def _zemb_bwd(res, dZ):
    table, enc_idx, enc_cnt = res
    Z = table.shape[0]
    E, P = enc_idx.shape

    # --- dTable: blocked one-hot matmul (see module docstring) ---
    B = 128 if E % 128 == 0 else (64 if E % 64 == 0 else 1)
    if B == 1:  # ragged edge count: fall back to XLA's scatter transpose
        dT = jax.vjp(lambda t: _gather_reduce(t, enc_idx, enc_cnt), table)[1](dZ)[0]
    else:
        nb = E // B
        zr = jnp.arange(Z, dtype=enc_idx.dtype)
        mm_dtype = _BWD_MATMUL_DTYPE

        def body(acc, i):
            idx_b = jax.lax.dynamic_slice_in_dim(enc_idx, i * B, B)
            cnt_b = jax.lax.dynamic_slice_in_dim(enc_cnt, i * B, B)
            dZ_b = jax.lax.dynamic_slice_in_dim(dZ, i * B, B)
            onehot = (idx_b[:, :, None] == zr[None, None, :]).astype(mm_dtype)
            Cb = jnp.einsum(
                "bpz,bp->bz", onehot, cnt_b.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jnp.einsum(
                "bz,bh->zh",
                Cb.astype(mm_dtype),
                dZ_b.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        dT, _ = jax.lax.scan(
            body, jnp.zeros(table.shape, jnp.float32), jnp.arange(nb)
        )
        dT = dT.astype(table.dtype)

    # --- dCnt: cheap gather + dot ---
    rows = jnp.take(table, enc_idx, axis=0)  # (E, P, H)
    dCnt = jnp.einsum(
        "eph,eh->ep", rows, dZ, preferred_element_type=jnp.float32
    ).astype(enc_cnt.dtype)

    dIdx = np.zeros(enc_idx.shape, jax.dtypes.float0)
    return dT, dIdx, dCnt


_zemb_core.defvjp(_zemb_fwd, _zemb_bwd)


# ---------------------------------------------------------------------------
# Flat COO layout: entry k contributes cnt[k] * table[idx[k]] to edge
# edge_id[k]. Gathers only the ACTUAL nnz entries (~1.7x less HBM traffic
# than the (E, P) width layout at ZINC shapes, where avg nnz 28 pads to
# width 48). Entries arrive sorted by edge from the batcher.
# ---------------------------------------------------------------------------


def zemb_weighted_flat(table, flat_idx, flat_cnt, flat_edge, num_edges: int):
    """Per-edge weighted sum of table rows from flat COO entries.
    Returns (num_edges, H) float32. Padding entries have cnt == 0."""
    return _zemb_flat_core(
        table,
        flat_idx.astype(jnp.int32),
        flat_cnt.astype(jnp.float32),
        flat_edge.astype(jnp.int32),
        num_edges,
    )


def zemb_unique_rows(table, batch):
    """Dedup layout only: the (R, H) reduce over the batch's UNIQUE
    histogram rows — no edge expansion. Returns None on other layouts.

    Callers that run their per-edge z pipeline on unique rows (weighted
    BN with `batch.enc_row_weight`, then one take to edges — see
    NestedGINEff) use this to shrink the whole z path ~R/E."""
    if getattr(batch, "enc_edge_row", None) is None:
        return None
    if getattr(batch, "enc_bucket_ids", None) is not None:
        # bucket compaction: gather the batch's active table rows so
        # the count-matrix build scales with the dataset's bucket
        # vocabulary, not the full table height (grad flows back
        # through a one-hot-matmul embed_take)
        from escgnn_tpu.ops.embed import embed_take

        table = embed_take(table, batch.enc_bucket_ids.astype(jnp.int32))
        if getattr(batch, "enc_countmat", None) is not None:
            # host-precomputed C: the whole reduce is one MXU matmul
            # (identical math to building C on device — C is batch data)
            return jnp.dot(
                batch.enc_countmat, table,
                preferred_element_type=jnp.float32,
            )
    return zemb_weighted_gather(table, batch.enc_idx, batch.enc_cnt)


# VMEM budget for the expansion-backward kernel's resident (R, H) f32
# accumulator; above this the XLA scatter transpose runs instead. The
# kernel owns the core's VMEM while it runs (its only other residents
# are a (128, H) gradient tile and the onehot), so ~12 MB of the 16 MB
# is safe.
_EXPAND_KERNEL_VMEM_BYTES = 12 * 2**20


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _expand_rows_core(u, edge_row, perm, rows_sorted, num_rows):
    return jnp.take(u, edge_row, axis=0)


def _expand_fwd(u, edge_row, perm, rows_sorted, num_rows):
    return jnp.take(u, edge_row, axis=0), (perm, rows_sorted)


def _expand_bwd(num_rows, res, dZ):
    perm, rows_sorted = res
    from escgnn_tpu.ops.expand_pallas import sorted_segment_sum_pallas

    dU = sorted_segment_sum_pallas(
        jnp.take(dZ, perm, axis=0), rows_sorted, num_rows
    )
    int_zero = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dU, int_zero(perm), int_zero(perm), int_zero(rows_sorted)


_expand_rows_core.defvjp(_expand_fwd, _expand_bwd)


def expand_rows(u, batch):
    """Expand unique-row values (R, H) to edges (E, H) via
    `batch.enc_edge_row`. Forward is one take; backward is the Pallas
    sorted-segment-sum (see ops/expand_pallas.py) when the batch carries
    the sorted-CSR view and the row accumulator fits VMEM, else XLA's
    scatter transpose."""
    from escgnn_tpu.ops import expand_pallas

    R, H = u.shape
    use_kernel = (
        getattr(batch, "enc_edge_perm", None) is not None
        and (R + 136) * H * 4 <= _EXPAND_KERNEL_VMEM_BYTES
        and batch.enc_edge_perm.shape[0] % 128 == 0
        and (jax.default_backend() == "tpu" or expand_pallas._INTERPRET)
    )
    if use_kernel:
        return _expand_rows_core(
            u, batch.enc_edge_row, batch.enc_edge_perm,
            batch.enc_row_sorted, R,
        )
    return jnp.take(u, batch.enc_edge_row, axis=0)


def zemb_from_batch(table, batch):
    """Dispatch on the batch's encoding layout.

    Dedup layout: reduce only the batch's UNIQUE histogram rows, then
    broadcast to edges with one cheap (R, H) -> (E, H) take — on ZINC
    batches R ~ 0.3 E, cutting both the forward gather traffic and the
    table-VJP matmul work ~3x (measured 7.3 -> 5.2 ms on the flagship
    train step)."""
    u = zemb_unique_rows(table, batch)
    if u is not None:
        return expand_rows(u, batch)
    if getattr(batch, "enc_flat_idx", None) is not None:
        return zemb_weighted_flat(
            table, batch.enc_flat_idx, batch.enc_flat_cnt,
            batch.enc_flat_edge, batch.num_edges,
        )
    return zemb_weighted_gather(table, batch.enc_idx, batch.enc_cnt)


def _flat_fwd_impl(table, idx, cnt, edge, num_edges):
    rows = jnp.take(table, idx, axis=0) * cnt[:, None]
    return jax.ops.segment_sum(
        rows, edge, num_segments=num_edges, indices_are_sorted=True
    )


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _zemb_flat_core(table, idx, cnt, edge, num_edges):
    return _flat_fwd_impl(table, idx, cnt, edge, num_edges)


def _zemb_flat_fwd(table, idx, cnt, edge, num_edges):
    return _flat_fwd_impl(table, idx, cnt, edge, num_edges), (
        table, idx, cnt, edge,
    )


def _zemb_flat_bwd(num_edges, res, dZ):
    table, idx, cnt, edge = res
    Z = table.shape[0]
    K = idx.shape[0]

    # dTable[z] = sum_{k: idx_k = z} cnt_k * dZ[edge_k] — blocked one-hot
    # matmul exactly like the width layout's VJP (no scatter).
    B = 128 if K % 128 == 0 else (64 if K % 64 == 0 else 1)
    if B == 1:
        dT = jax.vjp(
            lambda t: _flat_fwd_impl(t, idx, cnt, edge, num_edges), table
        )[1](dZ)[0]
    else:
        nb = K // B
        zr = jnp.arange(Z, dtype=idx.dtype)
        mm_dtype = _BWD_MATMUL_DTYPE

        def body(acc, i):
            idx_b = jax.lax.dynamic_slice_in_dim(idx, i * B, B)
            cnt_b = jax.lax.dynamic_slice_in_dim(cnt, i * B, B)
            edge_b = jax.lax.dynamic_slice_in_dim(edge, i * B, B)
            dZ_b = jnp.take(dZ, edge_b, axis=0)  # (B, H)
            onehot = (idx_b[:, None] == zr[None, :]).astype(mm_dtype)
            onehot = onehot * cnt_b.astype(mm_dtype)[:, None]  # (B, Z)
            acc = acc + jnp.einsum(
                "bz,bh->zh", onehot, dZ_b.astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        dT, _ = jax.lax.scan(
            body, jnp.zeros(table.shape, jnp.float32), jnp.arange(nb)
        )
        dT = dT.astype(table.dtype)

    # dCnt[k] = table[idx_k] . dZ[edge_k]
    dCnt = jnp.einsum(
        "kh,kh->k",
        jnp.take(table, idx, axis=0),
        jnp.take(dZ, edge, axis=0),
        preferred_element_type=jnp.float32,
    ).astype(cnt.dtype)

    dIdx = np.zeros(idx.shape, jax.dtypes.float0)
    dEdge = np.zeros(edge.shape, jax.dtypes.float0)
    return dT, dIdx, dCnt, dEdge


_zemb_flat_core.defvjp(_zemb_flat_fwd, _zemb_flat_bwd)
