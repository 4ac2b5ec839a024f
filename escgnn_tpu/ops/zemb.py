"""Structural-embedding reduce: the z_emb hot op.

Reference computes, per edge e (reference `zinc_models.py:590`,
`run_graphcount.py:155`):

    z_emb[e] = sum_{k in nnz(e)} count_k * table[bucket_k]

via flat COO triples + `global_add_pool` (a scatter-add). The TPU-native
form here uses the per-edge fixed-width layout (enc_idx/enc_cnt of shape
(E, P)): the reduce becomes a static gather + weighted sum over the P axis

    z_emb = einsum('eph,ep->eh', table[enc_idx], enc_cnt)

which XLA fuses into a single pass with no scatter. Padding entries carry
cnt == 0 and contribute exactly 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zemb_weighted_gather(
    table: jax.Array,  # (Z, H) embedding table (z_initial.weight)
    enc_idx: jax.Array,  # (E, P) int32 bucket ids
    enc_cnt: jax.Array,  # (E, P) float32 counts (0 for padding)
) -> jax.Array:
    """Per-edge weighted sum of embedding-table rows. Returns (E, H)."""
    rows = jnp.take(table, enc_idx, axis=0)  # (E, P, H)
    return jnp.einsum(
        "eph,ep->eh", rows, enc_cnt.astype(rows.dtype),
        preferred_element_type=jnp.float32,
    )
