"""Pallas TPU kernel for the z-embedding weighted gather-reduce.

The XLA gather form of `z_emb[e] = sum_p cnt[e,p] * table[idx[e,p]]`
moves E*P full embedding rows through HBM (~3.5 ms/fwd at ZINC batch
shapes — the largest single cost in the train step). This kernel keeps
the 1800 x H table resident in VMEM (~1.8 MB at H=256) and streams edge
blocks: per block, P in-VMEM row-gathers + multiply-accumulate, one HBM
write of the (BE, H) output. Data movement drops to idx/cnt in + z_emb
out (~17 MB total vs ~600 MB for the gather form).

Status: opt-in (`escgnn_tpu.ops.zemb.set_impl("pallas")`), correctness
covered by interpret-mode tests. Measured on v5e at ZINC batch shapes
(E=12160, P=48, H=256): 4.99 ms/fwd vs 6.4 ms for the XLA gather in the
same scan-xs setting — a win, but the production path (gather fwd +
blocked-matmul VJP, whole-step 7.3 ms) still beats routing through this
kernel because the compare-accumulate C build is VPU-bound at
O(E*P*Z) work. A true row-gather primitive (unavailable in Mosaic at
this JAX version: dynamic_gather requires equal input/indices/output
shapes) would drop this to O(E*P*H) ~ 0.2 ms; revisit when available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret-mode switch for CPU tests of the custom_vjp wrapper in
# ops/zemb.py (which cannot thread a per-call flag through custom_vjp)
_INTERPRET = False


def set_interpret(v: bool):
    global _INTERPRET
    _INTERPRET = v


def _kernel(idx_ref, cnt_ref, table_ref, out_ref, *, block_e: int, width: int):
    # Mosaic has no general row-gather (dynamic_gather wants equal
    # input/indices/output shapes), so the per-block reduce is expressed
    # as: build the (BE, Z) sparse coefficient tile in VMEM with P
    # compare-accumulate passes (VPU), then ONE (BE, Z) @ (Z, H) MXU
    # matmul against the VMEM-resident table.
    table = table_ref[:].astype(jnp.bfloat16)  # (Z, H)
    idx = idx_ref[:]  # (BE, P) int32
    cnt = cnt_ref[:]  # (BE, P) f32
    P = idx.shape[1]
    Z = table.shape[0]

    iota_z = jax.lax.broadcasted_iota(jnp.int32, (block_e, Z), 1)
    C = jnp.zeros((block_e, Z), jnp.bfloat16)
    for p in range(P):  # static unroll; P is small (<= ~72)
        hit = iota_z == idx[:, p][:, None]
        C = C + jnp.where(hit, cnt[:, p][:, None], 0.0).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(C, table, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def zemb_pallas(table, enc_idx, enc_cnt, block_e: int = 128,
                interpret: bool = False):
    """Forward-only Pallas z-emb reduce. (E, P) int/float -> (E, H) f32.

    E must be a multiple of `block_e` (the batcher pads to multiples of
    128). Backward still uses the blocked one-hot-matmul VJP.
    """
    E, P = enc_idx.shape
    Z, H = table.shape
    assert E % block_e == 0, (E, block_e)
    return pl.pallas_call(
        functools.partial(_kernel, block_e=block_e, width=H),
        out_shape=jax.ShapeDtypeStruct((E, H), jnp.float32),
        grid=(E // block_e,),
        in_specs=[
            pl.BlockSpec((block_e, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        enc_idx.astype(jnp.int32),
        enc_cnt.astype(jnp.float32),
        table.astype(jnp.float32),
    )


def _countmat_kernel(idx_ref, cnt_ref, table_ref, out_ref, c_ref,
                     *, block_r: int):
    """Fused count-matrix build + matmul over a row tile; also writes the
    C tile so the table backward is one XLA matmul (dT = C^T @ dU)."""
    idx = idx_ref[:]  # (BR, P) int32
    cnt = cnt_ref[:]  # (BR, P) f32
    P = idx.shape[1]
    Z = table_ref.shape[0]

    iota_z = jax.lax.broadcasted_iota(jnp.int32, (block_r, Z), 1)
    C = jnp.zeros((block_r, Z), jnp.float32)
    for p in range(P):  # static unroll; P is small (<= ~72)
        hit = iota_z == idx[:, p][:, None]
        C = C + jnp.where(hit, cnt[:, p][:, None], 0.0)
    c_ref[:] = C
    out_ref[:] = jnp.dot(
        C.astype(jnp.bfloat16), table_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def zemb_countmat_pallas(table, enc_idx, enc_cnt, block_r: int = 128,
                         interpret=None):
    """Count-matrix z-emb reduce for the dedup+compacted layout:
    (R, P) idx/cnt + (Zc, H) active table -> ((R, H) f32, (R, Zc) f32 C).

    Built for SMALL Zc (bucket compaction): the whole active table and a
    (block_r, Zc) C tile live in VMEM; the C build is P compare-
    accumulate passes (VPU) and the reduce is one MXU matmul per tile.
    The returned C makes the table backward a single transposed matmul
    (see ops/zemb.py impl "countmat_pallas").
    """
    if interpret is None:
        interpret = _INTERPRET
    R, P = enc_idx.shape
    Z, H = table.shape
    assert R % block_r == 0, (R, block_r)
    return pl.pallas_call(
        functools.partial(_countmat_kernel, block_r=block_r),
        out_shape=(
            jax.ShapeDtypeStruct((R, H), jnp.float32),
            jax.ShapeDtypeStruct((R, Z), jnp.float32),
        ),
        grid=(R // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_r, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, Z), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        enc_idx.astype(jnp.int32),
        enc_cnt.astype(jnp.float32),
        table.astype(jnp.float32),
    )
