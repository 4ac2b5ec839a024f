"""Pallas sorted-segment-sum for the dedup expansion backward.

The dedup z-emb path expands unique-row values to edges with one take
(`z = u[edge_row]`); its XLA transpose is a scatter-add of (E, H) edge
gradients into (R, H) rows — a serial op on TPU (~127 us at ZINC flagship
shapes, the largest single op in the step). With the edges pre-sorted by
row id on the host (`enc_edge_perm`/`enc_row_sorted`, data/batching.py),
the same reduction is tiled matmul work: each edge tile covers a
CONTIGUOUS row range [r_lo, r_lo + S) (row ids are dense and ascending),
so a (S, T) one-hot of local row offsets contracted with the (T, H)
gradient tile on the MXU gives the tile's row partials, accumulated into
a VMEM-resident output at a dynamic (8-aligned) row offset. The grid is
sequential on TPU, so cross-tile accumulation into the shared output
block is race-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(v: bool):
    global _INTERPRET
    _INTERPRET = v


def _kernel(lo_ref, rows_ref, g_ref, out_ref, *, tile_e: int, span: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    r_lo = lo_ref[i]  # 8-aligned floor of the tile's first row id
    local = rows_ref[:, 0] - r_lo  # (T,) in [0, span)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (span, tile_e), 0)
    onehot = (iota_s == local[None, :]).astype(jnp.bfloat16)
    partial = jnp.dot(
        onehot, g_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (span, H)
    sl = pl.ds(pl.multiple_of(r_lo, 8), span)
    out_ref[sl, :] = out_ref[sl, :] + partial


def sorted_segment_sum_pallas(
    g_sorted, rows_sorted, num_rows: int, tile_e: int = 128,
    interpret=None,
):
    """Sum rows of `g_sorted` (E, H) by the ascending, gap-free segment
    ids `rows_sorted` (E,) -> (num_rows, H) float32.

    Requirements (guaranteed by the dedup batcher): E % tile_e == 0;
    ids non-decreasing; every id in [0, max_id] occurs (so a tile of
    tile_e edges spans at most tile_e distinct ids). The matmuls run in
    bf16 (the step's backward matmul dtype); set tile_e to taste.
    """
    if interpret is None:
        interpret = _INTERPRET
    E, H = g_sorted.shape
    assert E % tile_e == 0, (E, tile_e)
    n_tiles = E // tile_e
    span = tile_e + 8  # +8: alignment slack for the 8-aligned row start
    r_pad = num_rows + span  # dynamic-slice overrun room
    r_pad = ((r_pad + 7) // 8) * 8
    rows_sorted = rows_sorted.astype(jnp.int32)
    # 8-aligned first-row offset per tile (host data -> tiny device op)
    tile_lo = (rows_sorted[::tile_e] // 8) * 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_e, 1), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_e, H), lambda i, lo: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_pad, H), lambda i, lo: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile_e=tile_e, span=span),
        out_shape=jax.ShapeDtypeStruct((r_pad, H), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_lo, rows_sorted[:, None], g_sorted)
    return out[:num_rows]
