"""Data-parallel step correctness on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.models.nested_gin_eff import NestedGINEff, NestedGINEffConfig
from escgnn_tpu.parallel.data_parallel import make_dp_train_step
from escgnn_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_stacked,
    stack_batches,
)
from escgnn_tpu.train.loop import TrainState, adam_with_plateau, l1_node_loss
from tests.test_model import make_graphs, to_jax


def test_dp_step_runs_on_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(0)
    n_dev = 4
    mesh = make_mesh(n_dev)

    graphs = make_graphs(rng, k=2 * n_dev)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    per_dev = [
        pad_and_batch(graphs[2 * i:2 * i + 2], spec) for i in range(n_dev)
    ]
    stacked = shard_stacked(stack_batches(per_dev), mesh)

    model = NestedGINEff(NestedGINEffConfig(hidden=8, num_layers=2))
    variables = model.init(jax.random.key(0), to_jax(per_dev[0]))
    state = TrainState.create(
        variables["params"], variables.get("batch_stats", {}),
        adam_with_plateau(1e-3),
    )
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=jax.tree.map(
            lambda x: replicate(x, mesh) if hasattr(x, "shape") else x,
            state.opt_state,
        ),
    )
    step = make_dp_train_step(model, l1_node_loss, mesh)
    key = jax.device_put(
        jax.random.key(1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    params_before = jax.tree.map(np.asarray, state.params)  # state is donated
    state2, loss = step(state, stacked, key)
    assert np.isfinite(float(loss))
    # params must remain finite and have actually moved
    p0 = jax.tree.leaves(state2.params)[0]
    assert np.isfinite(np.asarray(p0)).all()
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state2.params,
        params_before,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_dp_matches_single_device():
    """With every replica holding the SAME batch (and dropout off), the
    psum'd dp update must equal the single-device update exactly."""
    from escgnn_tpu.train.loop import make_train_step

    rng = np.random.default_rng(1)
    n_dev = 4
    mesh = make_mesh(n_dev)

    graphs = make_graphs(rng, k=2)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batch = pad_and_batch(graphs, spec)
    stacked = shard_stacked(stack_batches([batch] * n_dev), mesh)

    model = NestedGINEff(
        NestedGINEffConfig(hidden=8, num_layers=2, dropout=0.0)
    )
    variables = model.init(jax.random.key(0), to_jax(batch))

    def fresh():
        return TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            adam_with_plateau(1e-3),
        )

    # single device
    s1, loss1 = make_train_step(model, l1_node_loss)(
        fresh(), to_jax(batch), jax.random.key(3)
    )

    # dp over 4 replicas of the same batch
    sd = fresh()
    sd = sd.replace(
        params=replicate(sd.params, mesh),
        batch_stats=replicate(sd.batch_stats, mesh),
        opt_state=jax.tree.map(
            lambda x: replicate(x, mesh) if hasattr(x, "shape") else x,
            sd.opt_state,
        ),
    )
    key = jax.device_put(
        jax.random.key(3),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    step = make_dp_train_step(model, l1_node_loss, mesh)
    s2, loss2 = step(sd, stacked, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        s1.params, s2.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        s1.batch_stats, s2.batch_stats,
    )


def test_dp_pool_epoch_matches_manual_average():
    """make_dp_pool_train_step: each scan step must equal the manual
    average-of-grads update over its D pool batches (dropout off)."""
    import optax

    from escgnn_tpu.parallel.data_parallel import (
        make_dp_pool_train_step,
        replicate_state,
    )
    from escgnn_tpu.train.loop import stack_batches as stack_pool

    rng = np.random.default_rng(2)
    n_dev = 4
    mesh = make_mesh(n_dev)

    graphs = make_graphs(rng, k=2 * n_dev)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batches = [
        pad_and_batch(graphs[2 * i:2 * i + 2], spec) for i in range(n_dev)
    ]
    pool = jax.tree.map(jnp.asarray, stack_pool(batches))
    order = jnp.arange(n_dev, dtype=jnp.int32).reshape(1, n_dev)

    model = NestedGINEff(
        NestedGINEffConfig(hidden=8, num_layers=2, dropout=0.0)
    )
    variables = model.init(jax.random.key(0), to_jax(batches[0]))

    def fresh():
        return TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            optax.sgd(1e-2),
        )

    # manual reference: average per-batch grads / losses / BN stats
    def per_batch(params, batch_stats, batch):
        def compute(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                to_jax(batch),
                deterministic=False,
                use_running_average=False,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(9)},
            )
            return l1_node_loss(out, to_jax(batch)), mut["batch_stats"]

        return jax.value_and_grad(compute, has_aux=True)(params)

    s_ref = fresh()
    results = [per_batch(s_ref.params, s_ref.batch_stats, b) for b in batches]
    grads = jax.tree.map(
        lambda *gs: sum(gs) / n_dev, *[g for (_, _), g in results]
    )
    want_loss = float(np.mean([float(l) for (l, _), _ in results]))
    want_stats = jax.tree.map(
        lambda *ss: sum(ss) / n_dev, *[s for (_, s), _ in results]
    )
    updates, _ = s_ref.tx.update(grads, s_ref.opt_state, s_ref.params)
    want_params = optax.apply_updates(s_ref.params, updates)

    sd = replicate_state(fresh(), mesh)
    step = make_dp_pool_train_step(model, l1_node_loss, mesh)
    key = jax.device_put(
        jax.random.key(1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    s2, losses = step(sd, pool, order, key)

    np.testing.assert_allclose(float(losses[0]), want_loss, rtol=1e-5)
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=1e-4, atol=1e-6
        ),
        s2.params, want_params,
    )
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=1e-4, atol=1e-6
        ),
        s2.batch_stats, want_stats,
    )
