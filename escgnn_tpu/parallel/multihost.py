"""Multi-host (multi-process) training scaffolding.

The reference's whole distribution story is a torch DistributedSampler
+ rank-local loaders (`kernel/train_eval.py:44-52`). The TPU-native
equivalent: `jax.distributed.initialize` connects the processes of a
multi-host slice, every process sees the GLOBAL device list, a Mesh is
laid out over all devices, and each process feeds its LOCAL shard of
every batch through `jax.make_array_from_process_local_data` — XLA's
collectives ride ICI/DCN underneath the same `shard_map`/GSPMD train
steps used single-host (parallel/{data_parallel,edge_partition}.py).

This dev environment exposes one process and one chip, so the module
is written to be exactly degenerate at process_count == 1: the drivers
call `init_multihost()` unconditionally behind `--multihost`, and with
one process nothing changes (tests/test_multihost.py locks this).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Connect this process to the slice; returns (process_count,
    process_index).

    Degenerate path: with no coordinator given and no multi-process
    environment (JAX_COORDINATOR_ADDRESS / Cloud TPU metadata),
    `jax.distributed.initialize` is NOT called and (1, 0) is returned —
    single-process runs stay byte-identical. On a real slice, pass the
    coordinator explicitly or launch with the standard env vars and
    every argument may stay None (jax auto-discovers on Cloud TPU)."""
    explicit = coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    env = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not explicit and not env:
        return 1, 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count(), jax.process_index()


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """This process's strided shard of a dataset — the
    DistributedSampler role (reference kernel/train_eval.py:44-52:
    `DistributedSampler(dataset, num_replicas=world_size, rank=rank)`).
    Identity at process_count == 1."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    return list(items[pi::pc])


def make_global_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> jax.sharding.Mesh:
    """Mesh over the GLOBAL device list (all processes). Single-host
    this equals parallel.mesh.make_mesh; multi-host every process must
    build the same mesh from the same jax.devices() order."""
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    assert n <= len(devs), (shape, len(devs))
    return jax.sharding.Mesh(
        np.asarray(devs[:n]).reshape(tuple(shape)), tuple(axis_names)
    )


def host_local_to_global(tree, mesh: jax.sharding.Mesh, spec):
    """Assemble global arrays from per-process local data: each process
    passes ITS shard of every leaf (the rows its mesh axis portion
    owns) and receives addressable global jax.Arrays. Single-process
    this is exactly device_put with the sharding (the degenerate case
    the tests lock); multi-host it is the standard
    `jax.make_array_from_process_local_data` feeding path."""
    sharding = jax.sharding.NamedSharding(mesh, spec)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)
