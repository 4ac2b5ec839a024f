"""Halo-exchange partitioned aggregation == single-device aggregation."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.parallel.halo import (
    make_halo_gine_forward,
    plan_halo_sharding,
    scatter_edge_payload,
    shard_plan,
)
from escgnn_tpu.parallel.mesh import make_mesh
from escgnn_tpu.ops.segment import segment_sum
from tests.conftest import random_graph


def _batch(rng, k=6):
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=12)
        graphs.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.normal(size=(n, 4)).astype(np.float32),
        ))
    spec = BatchSpec.from_graphs(graphs, batch_size=k)
    return pad_and_batch(graphs, spec)


def _reference_agg(batch, x, e):
    msg = jax.nn.relu(jnp.take(x, jnp.asarray(batch.senders), axis=0) + e)
    return segment_sum(
        msg, jnp.asarray(batch.receivers), batch.num_nodes,
        mask=jnp.asarray(batch.edge_mask), indices_are_sorted=True,
    )


def test_halo_plan_structure(rng):
    b = _batch(rng)
    D = 4
    plan = plan_halo_sharding(b, D)
    N = b.num_nodes
    assert plan.nodes_per_shard * D == N
    # every real edge appears exactly once across shards
    real = int(np.asarray(b.edge_mask).sum())
    assert int(plan.edge_mask.sum()) == real
    ids = np.sort(plan.edge_perm[plan.edge_mask])
    np.testing.assert_array_equal(ids, np.sort(
        np.flatnonzero(np.asarray(b.edge_mask))
    ))
    # local receivers stay in range and non-decreasing per shard
    for d in range(D):
        r = plan.receivers[d]
        assert r.min() >= 0 and r.max() < plan.nodes_per_shard
        assert np.all(np.diff(r) >= 0)


def test_halo_aggregation_matches_single_device(rng):
    assert len(jax.devices()) == 8
    b = _batch(rng)
    D = 4
    mesh = make_mesh(D, axis_names=("model",))
    plan = plan_halo_sharding(b, D)

    F = 4
    N, E = b.num_nodes, b.edge_mask.shape[0]
    x = rng.normal(size=(N, F)).astype(np.float32)
    e = rng.normal(size=(E, F)).astype(np.float32)

    want = np.asarray(_reference_agg(b, jnp.asarray(x), jnp.asarray(e)))

    plan_sh = shard_plan(plan, mesh)
    e_sh = jax.device_put(
        jnp.asarray(scatter_edge_payload(plan, e)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model")),
    )
    x_sh = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model")),
    )
    fwd = make_halo_gine_forward(mesh)
    got = np.asarray(fwd(x_sh, e_sh, plan_sh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_halo_gradients_flow(rng):
    b = _batch(rng, k=4)
    D = 2
    mesh = make_mesh(D, axis_names=("model",))
    plan = plan_halo_sharding(b, D)
    F = 3
    N, E = b.num_nodes, b.edge_mask.shape[0]
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    e = rng.normal(size=(E, F)).astype(np.float32)
    plan_sh = shard_plan(plan, mesh)
    e_sh = jnp.asarray(scatter_edge_payload(plan, e))
    fwd = make_halo_gine_forward(mesh)

    def loss_halo(x):
        return jnp.sum(jnp.sin(fwd(x, e_sh, plan_sh)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(_reference_agg(b, x, jnp.asarray(e))))

    g_h = np.asarray(jax.grad(loss_halo)(x))
    g_r = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(g_h, g_r, rtol=1e-4, atol=1e-5)


def test_halo_train_step_matches_single_device(rng):
    """2-layer GINE stack trained one step under the halo partition ==
    the same step computed on one device (same loss, same params)."""
    from escgnn_tpu.parallel.halo import make_halo_train_step

    b = _batch(rng, k=4)
    D = 4
    mesh = make_mesh(D, axis_names=("model",))
    plan = plan_halo_sharding(b, D)
    F, L = 4, 2
    N, E = b.num_nodes, b.edge_mask.shape[0]
    x = rng.normal(size=(N, F)).astype(np.float32)
    y = rng.normal(size=(N, F)).astype(np.float32)
    e = rng.normal(size=(E, F)).astype(np.float32)
    nm = np.asarray(b.node_mask)
    params = {}
    for i in range(L):
        params[f"w_{i}"] = jnp.asarray(
            rng.normal(size=(F, F)).astype(np.float32) * 0.3
        )
        params[f"b_{i}"] = jnp.zeros(F)

    plan_sh = shard_plan(plan, mesh)
    e_sh = jnp.asarray(scatter_edge_payload(plan, e))
    step = make_halo_train_step(mesh, num_layers=L, lr=1e-2)
    new_params, loss = step(
        params, jnp.asarray(x), e_sh, jnp.asarray(y), jnp.asarray(nm),
        plan_sh,
    )

    # single-device reference
    def forward(params):
        h = jnp.asarray(x)
        for i in range(L):
            agg = _reference_agg(b, h, jnp.asarray(e))
            h = jax.nn.relu((h + agg) @ params[f"w_{i}"] + params[f"b_{i}"])
        return h

    def loss_fn(params):
        err = jnp.where(nm[:, None], forward(params) - y, 0.0)
        return jnp.sum(err * err) / max(nm.sum(), 1)

    want_loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    want_params = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=1e-4, atol=1e-6
        ),
        new_params, want_params,
    )


def test_halo_real_model_matches_single_device(rng):
    """The REAL NestedGINEff (z-emb width path, masked BN with psum'd
    statistics, JK, node-level head) trained one step under receiver-range
    halo sharding == the same Adam step on one device: same loss, same
    updated params, same BN running stats."""
    from escgnn_tpu.models.nested_gin_eff import (
        NestedGINEff,
        NestedGINEffConfig,
    )
    from escgnn_tpu.parallel.halo import (
        build_halo_batch,
        make_halo_nested_train_step,
    )
    import optax

    from escgnn_tpu.train.loop import (
        TrainState,
        l1_node_loss,
        make_train_step,
    )
    from tests.test_model import make_graphs, to_jax

    D = 4
    mesh = make_mesh(D, axis_names=("model",))
    graphs = make_graphs(rng, k=4)
    spec = BatchSpec.from_graphs(graphs, batch_size=4)  # width enc layout
    b = pad_and_batch(graphs, spec)
    assert b.num_nodes % D == 0

    base_cfg = NestedGINEffConfig(hidden=8, num_layers=2, graph_pred=False)
    base = NestedGINEff(base_cfg)
    variables = base.init(jax.random.key(0), to_jax(b))

    def fresh():
        # SGD (not Adam): the structurally-zero gradients of bias-into-BN
        # params are computed as catastrophic cancellations whose float
        # noise differs between reduction orders; Adam's first step is
        # ~lr*sign(g), which amplifies that noise to full lr. SGD keeps
        # the comparison proportional to the (tiny) gradient difference.
        return TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            optax.sgd(1e-2),
        )

    s1, loss1 = make_train_step(base, l1_node_loss)(
        fresh(), to_jax(b), jax.random.key(3)
    )

    halo_model = NestedGINEff(
        NestedGINEffConfig(
            hidden=8, num_layers=2, graph_pred=False, halo_axis="model"
        )
    )
    plan = plan_halo_sharding(b, D)
    hb = jax.tree.map(jnp.asarray, build_halo_batch(b, plan))
    step = make_halo_nested_train_step(halo_model, mesh, "model")
    s2, loss2 = step(fresh(), hb, jax.random.key(3))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-4, atol=1e-5
        ),
        s2.params, s1.params,
    )
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-4, atol=1e-5
        ),
        s2.batch_stats, s1.batch_stats,
    )


def test_halo_graph_level_head_matches_single_device(rng):
    """Graph-level halo (round 3): local per-graph partial pools psum'd
    to replicated (G, .) rows, head BN without axis psum, local loss =
    full graph loss / D. One SGD step must match the single-device step
    exactly (loss, params, BN stats)."""
    from escgnn_tpu.models.nested_gin_eff import (
        NestedGINEff,
        NestedGINEffConfig,
    )
    from escgnn_tpu.parallel.halo import (
        build_halo_batch,
        make_halo_nested_train_step,
    )
    import optax

    from escgnn_tpu.train.loop import (
        TrainState,
        l1_graph_loss,
        make_train_step,
    )
    from tests.test_model import make_graphs, to_jax

    D = 4
    mesh = make_mesh(D, axis_names=("model",))
    graphs = make_graphs(rng, k=4, node_level=False)
    spec = BatchSpec.from_graphs(graphs, batch_size=4)  # width enc layout
    b = pad_and_batch(graphs, spec)
    assert b.num_nodes % D == 0

    kw = dict(hidden=8, num_layers=2, graph_pred=True, pool="add",
              use_x_embedding_jk=False)
    base = NestedGINEff(NestedGINEffConfig(**kw))
    variables = base.init(jax.random.key(0), to_jax(b))

    def fresh():
        return TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            optax.sgd(1e-2),
        )

    s1, loss1 = make_train_step(base, l1_graph_loss)(
        fresh(), to_jax(b), jax.random.key(3)
    )

    halo_model = NestedGINEff(
        NestedGINEffConfig(halo_axis="model", **kw)
    )
    plan = plan_halo_sharding(b, D)
    hb = jax.tree.map(jnp.asarray, build_halo_batch(b, plan))
    step = make_halo_nested_train_step(
        halo_model, mesh, "model", graph_loss_fn=l1_graph_loss
    )
    s2, loss2 = step(fresh(), hb, jax.random.key(3))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-4, atol=1e-5
        ),
        s2.params, s1.params,
    )
    jax.tree.map(
        lambda a, w: np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-4, atol=1e-5
        ),
        s2.batch_stats, s1.batch_stats,
    )


def test_halo_plan_budgets_shared_shapes(rng):
    """Shared budgets make every batch's halo shapes identical, so ONE
    compiled step serves a pool of batches (the driver --mesh halo
    path)."""
    b1, b2 = _batch(rng, k=4), _batch(rng, k=4)
    D = 4
    p1 = plan_halo_sharding(b1, D)
    p2 = plan_halo_sharding(b2, D)
    eb = max(p1.edge_shard, p2.edge_shard)
    bb = max(p1.boundary_send.shape[1], p2.boundary_send.shape[1])
    hb = max(p1.halo_src.shape[1], p2.halo_src.shape[1])
    q1 = plan_halo_sharding(b1, D, eb, bb, hb)
    q2 = plan_halo_sharding(b2, D, eb, bb, hb)
    assert q1.senders.shape == q2.senders.shape
    assert q1.boundary_send.shape == q2.boundary_send.shape
    assert q1.halo_src.shape == q2.halo_src.shape
    # budget padding must not change the aggregation result
    F = 4
    mesh = make_mesh(D, axis_names=("model",))
    x = rng.normal(size=(b1.num_nodes, F)).astype(np.float32)
    e = rng.normal(size=(b1.edge_mask.shape[0], F)).astype(np.float32)
    want = np.asarray(_reference_agg(b1, jnp.asarray(x), jnp.asarray(e)))
    fwd = make_halo_gine_forward(mesh)
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model"))
    got = fwd(
        jax.device_put(jnp.asarray(x), sh),
        jax.device_put(jnp.asarray(scatter_edge_payload(q1, e)), sh),
        shard_plan(q1, mesh),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
