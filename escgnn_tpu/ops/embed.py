"""Embedding lookup with a matmul backward.

`jnp.take(table, ids)` is the right forward, but XLA's transpose of a
row gather is a scatter-add over one row per id — profiled at ~86 us/step
for the flagship step's edge-type embedding (vocab 100). For the small
vocabularies the reference uses (node/edge type embeddings, AtomEncoder),
the gradient is better computed as

    dT = onehot(ids)^T @ dY        # (V, N) @ (N, D) on the MXU

with the one-hot built by a broadcast compare (N*V ops, trivial at these
sizes). Fills the role of torch nn.Embedding's backward (reference
`zinc_models.py:563-564` et al.).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def embed_take(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table[ids] for int32 ids (any leading shape); grad via one-hot matmul."""
    return jnp.take(table, ids, axis=0)


def _fwd(table, ids):
    # residuals must be jax types: keep the (unmodified) table reference
    # for its shape/dtype — free, no copy
    return jnp.take(table, ids, axis=0), (table, ids)


def _bwd(res, dY):
    table, ids = res
    V, table_dtype = table.shape[0], table.dtype
    flat_ids = ids.reshape(-1)
    dY2 = dY.reshape(len(flat_ids), -1)
    onehot = (
        flat_ids[:, None] == jnp.arange(V, dtype=flat_ids.dtype)[None, :]
    ).astype(dY2.dtype)
    dT = jnp.einsum(
        "nv,nd->vd", onehot, dY2, preferred_element_type=jnp.float32
    ).astype(table_dtype)
    return dT, np.zeros(ids.shape, jax.dtypes.float0)


embed_take.defvjp(_fwd, _bwd)
