"""Edge-partitioned (GSPMD) step: numerical agreement with single-device.

Gradients are compared directly (not post-Adam params): the partitioner
changes fp32 reduction order, and Adam's first step turns sign flips of
near-zero gradient components into full ±lr differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.parallel.edge_partition import (
    batch_shardings,
    make_ep_train_step,
    shard_batch_by_edges,
)
from escgnn_tpu.parallel.mesh import make_mesh
from escgnn_tpu.train.loop import (
    TrainState,
    adam_with_plateau,
    l1_node_loss,
)
from tests.test_model import make_graphs, to_jax


def test_ep_gradients_match_single_device():
    from escgnn_tpu.ops import zemb as zemb_mod

    zemb_mod.set_backward_matmul_dtype(jnp.float32)
    try:
        rng_np = np.random.default_rng(0)
        graphs = make_graphs(rng_np, k=4)
        spec = BatchSpec.from_graphs(graphs, batch_size=4)
        batch_host = pad_and_batch(graphs, spec)

        model = NestedGINEff(NestedGINEffConfig(hidden=16, num_layers=2))
        b1 = to_jax(batch_host)
        variables = model.init(jax.random.key(0), b1)
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        def loss_of(params, batch):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs},
                batch,
                deterministic=True,
                use_running_average=False,
                mutable=["batch_stats"],
            )
            return l1_node_loss(out, batch)

        g_ref = jax.jit(jax.grad(loss_of))(params, b1)

        mesh = make_mesh(4, axis_names=("model",))
        b_sh = shard_batch_by_edges(batch_host, mesh, "model")
        bsh_spec = batch_shardings(b_sh, mesh, "model")
        g_ep = jax.jit(jax.grad(loss_of), in_shardings=(None, bsh_spec))(
            params, b_sh
        )

        for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
            )
    finally:
        zemb_mod.set_backward_matmul_dtype(jnp.bfloat16)


def test_ep_train_step_runs_and_trains():
    rng_np = np.random.default_rng(1)
    graphs = make_graphs(rng_np, k=4)
    spec = BatchSpec.from_graphs(graphs, batch_size=4)
    batch_host = pad_and_batch(graphs, spec)
    model = NestedGINEff(NestedGINEffConfig(hidden=16, num_layers=2))
    b1 = to_jax(batch_host)
    variables = model.init(jax.random.key(0), b1)
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(1e-3),
    )
    mesh = make_mesh(4, axis_names=("model",))
    b_sh = shard_batch_by_edges(batch_host, mesh, "model")
    step = make_ep_train_step(model, l1_node_loss, mesh, b_sh, "model")
    losses = []
    key = jax.random.key(3)
    for i in range(5):
        key, sub = jax.random.split(key)
        state, loss = step(state, b_sh, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_dp_ep_2d_gradients_match_single_device():
    """2-D (data x model) mesh: graphs data-parallel, edges additionally
    partitioned — gradients must match the single-device step."""
    from jax.sharding import Mesh

    from escgnn_tpu.ops import zemb as zemb_mod
    from escgnn_tpu.parallel.edge_partition import (
        batch_shardings_2d,
        shard_batch_2d,
    )

    zemb_mod.set_backward_matmul_dtype(jnp.float32)
    try:
        rng_np = np.random.default_rng(1)
        graphs = make_graphs(rng_np, k=4)
        spec = BatchSpec.from_graphs(graphs, batch_size=4)
        batch_host = pad_and_batch(graphs, spec)

        model = NestedGINEff(NestedGINEffConfig(hidden=16, num_layers=2))
        b1 = to_jax(batch_host)
        variables = model.init(jax.random.key(0), b1)
        params = variables["params"]
        bs = variables.get("batch_stats", {})

        def loss_of(params, batch):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs},
                batch,
                deterministic=True,
                use_running_average=False,
                mutable=["batch_stats"],
            )
            return l1_node_loss(out, batch)

        g_ref = jax.jit(jax.grad(loss_of))(params, b1)

        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", "model"))
        b_sh = shard_batch_2d(batch_host, mesh)
        bsh = batch_shardings_2d(
            batch_host.replace(enc_edge_perm=None, enc_row_sorted=None),
            mesh,
        )
        g_2d = jax.jit(jax.grad(loss_of), in_shardings=(None, bsh))(
            params, b_sh
        )

        for a, b in zip(jax.tree.leaves(g_2d), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
            )
    finally:
        zemb_mod.set_backward_matmul_dtype(jnp.bfloat16)


def test_ep_pool_epoch_matches_single_device_pool():
    """Driver-facing ep path (run_zinc/run_graphcount --mesh ep): a whole
    pool epoch through `make_ep_pool_train_step` on the UNIFORM dedup
    layout (static block metadata in the pytree aux — regression for the
    shardings-tree aux mismatch) must match `make_pool_train_step` on a
    single device."""
    from escgnn_tpu.data.prefetch import stacked_batch_pools
    from escgnn_tpu.ops import zemb as zemb_mod
    from escgnn_tpu.parallel.data_parallel import replicate_state
    from escgnn_tpu.parallel.edge_partition import (
        make_ep_pool_train_step,
        shard_pool_by_edges,
    )
    from escgnn_tpu.train.loop import make_pool_train_step

    zemb_mod.set_backward_matmul_dtype(jnp.float32)
    try:
        rng_np = np.random.default_rng(2)
        graphs = make_graphs(rng_np, k=8)
        spec = BatchSpec.uniform(graphs, 4, enc_layout="dedup")
        model = NestedGINEff(NestedGINEffConfig(hidden=16, num_layers=2))
        pool_host, n_batches, _ = stacked_batch_pools(graphs, spec, k=1,
                                                      seed=0)
        pool = pool_host[0]
        b0 = jax.tree.map(lambda a: a[0], pool)
        variables = model.init(jax.random.key(0), b0)
        state = TrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            adam_with_plateau(1e-3),
        )
        order = jnp.arange(n_batches, dtype=jnp.int32)
        rng = jax.random.key(5)

        # replicate BEFORE the reference step runs: both steps donate
        # their state argument
        mesh = make_mesh(4, axis_names=("model",))
        state_ep = replicate_state(state, mesh)

        ref_step = make_pool_train_step(model, l1_node_loss)
        # single-device pool drops the expansion view too, so the compute
        # graph (not just the partitioning) matches the ep step's
        pool_ref = pool.replace(enc_edge_perm=None, enc_row_sorted=None)
        # deep-copied state: both pool steps donate their state argument,
        # and CPU device_put replication can alias the source buffers
        state_ref_in = TrainState.create(
            jax.tree.map(jnp.array, state.params),
            jax.tree.map(jnp.array, state.batch_stats),
            adam_with_plateau(1e-3),
        )
        state_ref, losses_ref = ref_step(state_ref_in, pool_ref, order, rng)
        pool_sh = shard_pool_by_edges(pool, mesh)
        ep_step = make_ep_pool_train_step(model, l1_node_loss, mesh, pool_sh)
        state_ep, losses_ep = ep_step(state_ep, pool_sh, order, rng)

        np.testing.assert_allclose(
            np.asarray(losses_ep), np.asarray(losses_ref), rtol=1e-4,
            atol=1e-5,
        )
        # params: loose bound only — Adam turns sign flips of near-zero
        # gradient components (fp reduction order) into full +/-lr
        # differences per step (see module docstring); the tight
        # equivalence check is the direct-gradient test above
        for a, b in zip(
            jax.tree.leaves(state_ep.params), jax.tree.leaves(state_ref.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.1, atol=5e-3
            )
    finally:
        zemb_mod.set_backward_matmul_dtype(jnp.bfloat16)
