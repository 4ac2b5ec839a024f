"""Device mesh utilities.

The reference's entire distributed story is a torch DistributedSampler
(reference `kernel/train_eval.py:44-52`). The TPU-native design: a
`jax.sharding.Mesh` with a `data` axis (graphs are independent, so data
parallelism shards whole padded sub-batches; collectives are XLA psums
over ICI). Model/edge partitioning gets its own axis later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from escgnn_tpu.data.container import GraphBatch


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """`shape` gives a true multi-axis factorization (e.g. (2, 4) for a
    2-D dp x ep mesh); by default all devices land on the first axis."""
    devs = jax.devices()
    if shape is not None:
        assert len(shape) == len(axis_names), (shape, axis_names)
        n = int(np.prod(shape))
        assert n <= len(devs), f"requested {n} devices, have {len(devs)}"
        return Mesh(np.asarray(devs[:n]).reshape(tuple(shape)), axis_names)
    n = n_devices or len(devs)
    assert n <= len(devs), f"requested {n} devices, have {len(devs)}"
    shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), axis_names)


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack D identically-shaped batches along a new leading device axis."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def shard_stacked(batch: GraphBatch, mesh: Mesh, axis: str = "data") -> GraphBatch:
    """Place a [D, ...]-stacked batch with the leading axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), tree)
