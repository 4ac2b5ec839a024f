"""Pallas TPU kernel for the z-embedding weighted gather-reduce.

The XLA gather form of `z_emb[e] = sum_p cnt[e,p] * table[idx[e,p]]`
moves E*P full embedding rows through HBM (~3.5 ms/fwd at ZINC batch
shapes — the largest single cost in the train step). This kernel keeps
the 1800 x H table resident in VMEM (~1.8 MB at H=256) and streams edge
blocks: per block, P in-VMEM row-gathers + multiply-accumulate, one HBM
write of the (BE, H) output. Data movement drops to idx/cnt in + z_emb
out (~17 MB total vs ~600 MB for the gather form).

Status: opt-in (`escgnn_tpu.ops.zemb.set_impl("pallas")`). Correctness is
covered by interpret-mode tests; enable after benchmarking on the target
chip (the shared compile service was too backed up to time it in-repo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, cnt_ref, table_ref, out_ref, *, block_e: int, width: int):
    table = table_ref[:]  # (Z, H), VMEM-resident
    idx = idx_ref[:]  # (BE, P) int32
    cnt = cnt_ref[:]  # (BE, P) f32
    P = idx.shape[1]

    def body(p, acc):
        rows = jnp.take(table, idx[:, p], axis=0)  # (BE, H) VMEM gather
        return acc + rows * cnt[:, p][:, None]

    acc = jax.lax.fori_loop(
        0, P, body, jnp.zeros((block_e, width), jnp.float32)
    )
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def zemb_pallas(table, enc_idx, enc_cnt, block_e: int = 256,
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
