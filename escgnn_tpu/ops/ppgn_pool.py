"""Pallas diag/row/col pooling kernel for the dense PPGN grid.

Round-4 roofline verdict (BASELINE.md): the forward reduce of
`diag_offdiag_meanpool` over the (G, N, N, C) grid runs at 68 GB/s
inside XLA's fusion (87 MB, 1.28 ms = 10% of the PPGN_eff step),
while the same reductions take ~125 us isolated — the cost is the
fusion context (mask-select + converts + several reductions merged
into one badly-scheduled kernel), and an optimization_barrier made it
WORSE (commit 4d93bf3). This kernel takes the pooling out of XLA's
hands entirely: one pass over the grid in VMEM computes the diagonal,
row sums, and column sums together, reading bf16 and accumulating
f32.

Forward-only by design: the backward of the pooling is a cheap
broadcast (dx[n,k] = g_row[n] + g_col[k] + g_diag[n]·1[n=k]) that XLA
fuses into the regular-block backward chain, so the custom VJP emits
plain jnp there.

Reference op: `diag_offdiag_meanpool`, `run_graphcount.py:197-205`
(node-level variant). Opt-in via PPGNConfig.pool_impl="pallas".
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


def _pool_kernel(x_ref, out_ref):
    # x_ref: (Gb, N, N, C) in VMEM; out_ref: (Gb, N, 2C) f32
    x = x_ref[...]
    N = x.shape[1]
    row = jnp.sum(x, axis=2, dtype=jnp.float32)   # (Gb, N, C)
    col = jnp.sum(x, axis=1, dtype=jnp.float32)   # (Gb, N, C)
    n1 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    n2 = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = (n1 == n2).astype(jnp.float32)[None, :, :, None]
    diag = jnp.sum(x.astype(jnp.float32) * eye, axis=2)  # (Gb, N, C)
    C = x.shape[-1]
    out_ref[..., :C] = diag
    out_ref[..., C:] = row + col - 2.0 * diag


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def diag_row_col_pool(x):
    """(G, N, N, C) -> (G, N, 2C) f32: [diag ‖ row+col-2·diag].

    The node-level `diag_offdiag_meanpool` body as one Pallas pass."""
    return _pool_fwd_impl(x)


def _pool_fwd_impl(x):
    G, N, _, C = x.shape
    # a few graphs per program amortize grid overhead; VMEM per block
    # at bench shapes (8, 24, 24, 128) bf16 = 1.2 MB
    gb = 8 if G % 8 == 0 else (4 if G % 4 == 0 else 1)
    return pl.pallas_call(
        _pool_kernel,
        grid=(G // gb,),
        in_specs=[pl.BlockSpec(
            (gb, N, N, C), lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (gb, N, 2 * C), lambda g: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((G, N, 2 * C), jnp.float32),
        # CPU (tests / virtual meshes): Mosaic only targets TPU — run
        # the same kernel under the interpreter (repo convention:
        # ops/zemb_pallas.py auto-detects the same way via set_interpret)
        interpret=_INTERPRET or jax.default_backend() == "cpu",
    )(x)


def _pool_fwd(x):
    # residual: a zero-size array carrying x's dtype (pytree-safe; the
    # dx shape is recoverable from g's (G, N, 2C))
    return _pool_fwd_impl(x), jnp.zeros((0,), x.dtype)


def _pool_bwd(res, g):
    dtype = res.dtype
    N = g.shape[1]
    C = g.shape[-1] // 2
    g_diag = g[..., :C]
    g_off = g[..., C:]
    # dx[g,n,k,c] = g_off[n] (row) + g_off[k] (col)
    #              + (g_diag[n] - 2*g_off[n]) on the diagonal
    dx = g_off[:, :, None, :] + g_off[:, None, :, :]
    eye = jnp.eye(N, dtype=g.dtype)[None, :, :, None]
    dx = dx + (g_diag - 2.0 * g_off)[:, :, None, :] * eye
    return (dx.astype(dtype),)


diag_row_col_pool.defvjp(_pool_fwd, _pool_bwd)


def diag_row_col_pool_xla(x):
    """jnp reference implementation (same math, same f32 accumulation)."""
    diag = jnp.einsum("gnnc->gnc", x).astype(jnp.float32)
    row = jnp.sum(x, axis=2, dtype=jnp.float32)
    col = jnp.sum(x, axis=1, dtype=jnp.float32)
    return jnp.concatenate([diag, row + col - 2.0 * diag], axis=-1)
