"""Data-parallel training step over a device mesh.

shard_map over the `data` axis: each device runs the full model on its
local padded sub-batch; gradients (and BatchNorm batch statistics) are
averaged with `lax.pmean` over ICI, then the replicated optimizer update
runs identically everywhere. This subsumes the reference's
DistributedSampler + DDP path (`kernel/train_eval.py:44-57`) — with the
improvement that BN statistics are synchronized across replicas (torch
DDP leaves them per-replica).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.train.loop import TrainState


def make_dp_train_step(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
):
    """Returns train_step(state, stacked_batch, rng) -> (state, loss).

    `stacked_batch` has a leading device axis of size mesh.shape[axis],
    sharded over the mesh (see `parallel.mesh.shard_stacked`). `state` and
    `rng` are replicated.
    """

    def local_step(state: TrainState, batches: GraphBatch, rng: jax.Array):
        # shard_map hands us the local [1, ...] slice; drop the device axis.
        batch = jax.tree.map(lambda x: x[0], batches)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return loss_fn(out, batch), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        # Synchronize BN running stats so replicas stay bit-identical.
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_pool_train_step(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    decode=None,
):
    """Whole-epoch data-parallel training in ONE dispatch: `lax.scan`
    over an order matrix on a replicated device-resident batch pool.

    The driver-facing dp path (reference role: DistributedSampler +
    DDP, `kernel/train_eval.py:44-57`): each scan step consumes D pool
    batches — device d runs batch `order[step, d]` — so the effective
    batch is D x batch_size with mean-of-means gradient weighting.
    Gradients, loss, and BatchNorm statistics are `lax.pmean`'d over ICI
    and the replicated Adam update runs identically everywhere.

    Returns train_epoch(state, stacked_pool, order, rng) -> (state,
    losses (steps,)). `stacked_pool` is the [B, ...] stacked batch pool
    (replicated — every device holds it, which is what device-resident
    pools already do on one chip); `order` is (steps, D) int32 pool
    indices.
    """

    def local_epoch(state: TrainState, stacked: GraphBatch, order, rng):
        my = jax.lax.axis_index(axis)

        def body(state, idxs):
            batch = jax.tree.map(lambda a: a[idxs[my]], stacked)
            if decode is not None:
                # compressed device pools (data/compress.py)
                batch = decode(batch)
            step_rng = jax.random.fold_in(
                jax.random.fold_in(rng, state.step), my
            )

            def compute(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    deterministic=False,
                    use_running_average=False,
                    mutable=["batch_stats"],
                    rngs={"dropout": step_rng},
                )
                return loss_fn(out, batch), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                compute, has_aux=True
            )(state.params)
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            new_stats = jax.lax.pmean(new_stats, axis)
            updates, new_opt = state.tx.update(
                grads, state.opt_state, state.params
            )
            return (
                state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=new_stats,
                    opt_state=new_opt,
                ),
                loss,
            )

        return jax.lax.scan(body, state, order.astype(jnp.int32))

    sharded = jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState replicated over the mesh (params, BN stats,
    optimizer state; the tx itself is static)."""
    from escgnn_tpu.parallel.mesh import replicate

    return state.replace(
        step=replicate(state.step, mesh),
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=jax.tree.map(
            lambda x: replicate(x, mesh) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
    )
