"""Edge-partitioned training via GSPMD sharding annotations.

The scaling axis the reference lacks entirely (its only distribution is a
DistributedSampler, `kernel/train_eval.py:44-52`): the batched
supergraph's EDGE arrays (senders/receivers/attrs/ESC encodings) are
sharded over the `model` mesh axis while node state and parameters stay
replicated. We annotate the input shardings and let XLA's SPMD
partitioner place the collectives — partial per-node scatter-adds become
psums over ICI, backward included — which is the correct-by-construction
form of this parallelism (hand-psum'd shard_map would mis-scale the
gradients of replicated-path parameters).

`models/layers.py` also carries explicit `edge_shard_axis` /
`axis_name` plumbing for manual shard_map experiments; the GSPMD path
here is the supported one.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from escgnn_tpu.data.container import GraphBatch
from escgnn_tpu.train.loop import TrainState

EDGE_FIELDS = ("senders", "receivers", "edge_mask", "edge_attr",
               "enc_idx", "enc_cnt", "enc_edge_row")
# The flat COO encoding (enc_flat_*) is K-indexed, not E-indexed, so it is
# replicated; GSPMD reshards the (E, H) z-emb output onto the edge axis.
# In the dedup layout enc_idx/enc_cnt are R-indexed (unique rows) and
# likewise replicated, while the E-indexed enc_edge_row map shards.
# Use the width layout for edge-partitioned runs when encoding size
# dominates (it shards exactly).


NODE_FIELDS = ("x", "pos", "node_mask", "node_graph", "node_local", "y")
GRAPH_FIELDS = ("graph_mask",)


def _batch_shardings(batch: GraphBatch, mesh: Mesh, edge_spec, row_spec):
    """Pytree of NamedShardings: edge-aligned arrays get `edge_spec`,
    node/graph-aligned arrays `row_spec`, everything else replicated."""
    dedup = getattr(batch, "enc_edge_row", None) is not None

    def spec_for(name, x):
        if x is None:
            return None
        if name in EDGE_FIELDS and not (
            dedup and name in ("enc_idx", "enc_cnt")
        ):
            return NamedSharding(mesh, edge_spec)
        if name in NODE_FIELDS or name in GRAPH_FIELDS:
            return NamedSharding(mesh, row_spec)
        return NamedSharding(mesh, P())

    fields = {}
    for f in dataclasses.fields(GraphBatch):
        if f.name == "extras":
            continue
        if not f.metadata.get("pytree_node", True):
            # static (aux-data) fields — e.g. the uniform-layout block
            # metadata — must match the batch's pytree structure exactly
            fields[f.name] = getattr(batch, f.name)
        else:
            fields[f.name] = spec_for(f.name, getattr(batch, f.name))
    extras = None
    if batch.extras:
        extras = {k: NamedSharding(mesh, P()) for k in batch.extras}
    return GraphBatch(extras=extras, **fields)


def batch_shardings(batch: GraphBatch, mesh: Mesh, axis: str = "model"):
    """1-D edge partition: edge-dim arrays split over `axis`,
    everything else replicated."""
    return _batch_shardings(batch, mesh, edge_spec=P(axis), row_spec=P())


def shard_batch_by_edges(batch: GraphBatch, mesh: Mesh, axis: str = "model"):
    # drop the sorted-CSR expansion view: its Pallas backward kernel
    # assumes an unpartitioned edge axis (ops/zemb.py expand_rows); the
    # GSPMD path uses XLA's take/scatter transpose instead
    batch = batch.replace(enc_edge_perm=None, enc_row_sorted=None)
    shardings = batch_shardings(batch, mesh, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), batch, shardings
    )


def batch_shardings_2d(
    batch: GraphBatch,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """2-D dp x ep shardings: node/graph-aligned arrays split over the
    `data` axis (graphs are row-contiguous in the uniform block layout,
    so this is graph-level data parallelism), edge-aligned arrays split
    over BOTH axes (data-parallel groups of graphs, then their edges
    partitioned across the model axis). Parameters stay replicated; XLA's
    SPMD partitioner inserts the psums (model-axis for node scatter-adds,
    data-axis inside loss/BN reductions)."""
    return _batch_shardings(
        batch, mesh,
        edge_spec=P((data_axis, model_axis)),
        row_spec=P(data_axis),
    )


def shard_batch_2d(
    batch: GraphBatch,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Device-put a host batch with the 2-D dp x ep shardings; drops the
    sorted-CSR expansion view like `shard_batch_by_edges` (the Pallas
    backward assumes an unpartitioned edge axis)."""
    batch = batch.replace(enc_edge_perm=None, enc_row_sorted=None)
    shardings = batch_shardings_2d(batch, mesh, data_axis, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), batch, shardings
    )


def make_dp_ep_train_step(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    example_batch: GraphBatch,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Jitted train step over a 2-D (data, model) mesh: graphs data-
    parallel, each group's edges partitioned over the model axis.
    Numerically identical to the single-device step (GSPMD only moves
    where partial sums are computed); see tests/test_edge_partition.py.
    Feed batches through `shard_batch_2d`."""
    example_batch = example_batch.replace(
        enc_edge_perm=None, enc_row_sorted=None
    )
    return make_ep_train_step(
        model, loss_fn, mesh, example_batch,
        shardings=batch_shardings_2d(
            example_batch, mesh, data_axis, model_axis
        ),
    )


def shard_pool_by_edges(stacked_pool, mesh: Mesh, axis: str = "model"):
    """Device-put a [B, ...]-stacked batch pool (`stacked_batch_pools` /
    `stack_split` output) with 1-D edge shardings: edge-aligned arrays
    split over `axis` on their edge dimension (axis 1 of the stacked
    array), node/graph arrays and the dedup-layout encoding tables
    replicated. Drops the sorted-CSR expansion view like
    `shard_batch_by_edges` (its Pallas backward assumes an unpartitioned
    edge axis)."""
    stacked_pool = stacked_pool.replace(
        enc_edge_perm=None, enc_row_sorted=None
    )
    shardings = _batch_shardings(
        stacked_pool, mesh, edge_spec=P(None, axis), row_spec=P()
    )
    # device_put shards host arrays directly (and reshards device
    # arrays); staging through jnp.asarray would commit the full
    # unsharded pool to one device first and defeat ep's memory scaling
    return jax.tree.map(jax.device_put, stacked_pool, shardings)


def shard_pool_2d(
    stacked_pool,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Device-put a [B, ...]-stacked batch pool with 2-D dp x ep
    shardings: node/graph rows split over `data_axis` (axis 1 of the
    stacked arrays), edge arrays split over BOTH axes. Drops the
    sorted-CSR expansion view like `shard_batch_by_edges`."""
    stacked_pool = stacked_pool.replace(
        enc_edge_perm=None, enc_row_sorted=None
    )
    shardings = _batch_shardings(
        stacked_pool, mesh,
        edge_spec=P(None, (data_axis, model_axis)),
        row_spec=P(None, data_axis),
    )
    return jax.tree.map(jax.device_put, stacked_pool, shardings)


def make_dp_ep_pool_train_step(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    example_pool: GraphBatch,
    data_axis: str = "data",
    model_axis: str = "model",
    decode=None,
):
    """Whole-epoch 2-D dp x ep training in ONE dispatch: the
    `make_ep_pool_train_step` scan with `shard_pool_2d` shardings —
    node/graph rows split over the data axis, edges over data x model.
    GSPMD inserts the data-axis psums (loss/BN reductions) and
    model-axis psums (per-node scatter-adds), so each step is
    numerically the single-device step up to fp reduction order
    (tests/test_driver_mesh.py). The driver-facing `--mesh dp_ep` path.

    Returns train_epoch(state, stacked_pool, order, rng) ->
    (state, losses); `state` must be replicated over the mesh.
    """
    from escgnn_tpu.train.loop import make_pool_epoch_fn

    example_pool = example_pool.replace(
        enc_edge_perm=None, enc_row_sorted=None
    )
    pool_sh = _batch_shardings(
        example_pool, mesh,
        edge_spec=P(None, (data_axis, model_axis)),
        row_spec=P(None, data_axis),
    )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        make_pool_epoch_fn(model, loss_fn, decode),
        in_shardings=(None, pool_sh, repl, repl),
        donate_argnums=(0,),
    )


def make_ep_pool_train_step(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    example_pool: GraphBatch,
    axis: str = "model",
    decode=None,
):
    """Whole-epoch edge-partitioned training in ONE dispatch: `lax.scan`
    over a shuffled order vector of a device-resident stacked pool whose
    edge arrays are sharded over `axis` (`shard_pool_by_edges`).

    The driver-facing ep path (run_zinc.py / run_graphcount.py
    `--mesh ep`). Unlike dp, all devices cooperate on the SAME batch each
    step — the SPMD partitioner turns the partial per-node scatter-adds
    into psums over ICI — so each step is numerically the single-device
    step up to fp reduction order (tests/test_edge_partition.py). The
    reference has no analogue; its only distribution is a
    DistributedSampler (`kernel/train_eval.py:44-52`).

    Returns train_epoch(state, stacked_pool, order, rng) ->
    (state, losses (steps,)); `state` must be replicated over the mesh.
    """
    from escgnn_tpu.train.loop import make_pool_epoch_fn

    example_pool = example_pool.replace(
        enc_edge_perm=None, enc_row_sorted=None
    )
    pool_sh = _batch_shardings(
        example_pool, mesh, edge_spec=P(None, axis), row_spec=P()
    )
    repl = NamedSharding(mesh, P())
    return jax.jit(
        make_pool_epoch_fn(model, loss_fn, decode),
        in_shardings=(None, pool_sh, repl, repl),
        donate_argnums=(0,),
    )


def make_ep_train_step(
    model,
    loss_fn: Callable,
    mesh: Mesh,
    example_batch: GraphBatch,
    axis: str = "model",
    shardings=None,
):
    """Jitted train step whose inputs carry edge shardings; XLA partitions
    compute + gradients across the mesh axis automatically. `shardings`
    overrides the default 1-D edge specs (the 2-D dp x ep step reuses
    this closure with `batch_shardings_2d`)."""
    repl = NamedSharding(mesh, P())

    def step(state: TrainState, batch: GraphBatch, rng: jax.Array):
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
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    # state/rng replicated; batch edge arrays sharded
    bsh = shardings if shardings is not None else batch_shardings(
        example_batch, mesh, axis
    )
    return jax.jit(
        step,
        in_shardings=(None, bsh, repl),
        donate_argnums=(0,),
    )
