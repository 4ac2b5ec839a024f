"""make_multi_train_step == K sequential make_train_step steps."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.models.baselines import BaselineGNN, BaselineGNNConfig
from escgnn_tpu.train.loop import (
    TrainState,
    adam_with_plateau,
    ce_graph_loss,
    make_multi_train_step,
    make_train_step,
    stack_batches,
)
from tests.conftest import random_graph


def test_multi_step_matches_sequential(rng):
    graphs = []
    for i in range(6):
        n, ei = random_graph(rng, max_n=7)
        graphs.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.normal(size=(n, 4)).astype(np.float32),
            y=np.asarray([i % 2], np.int64),
        ))
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batch_list = [
        pad_and_batch(graphs[i:i + 2], spec) for i in range(0, 6, 2)
    ]

    model = BaselineGNN(BaselineGNNConfig(
        conv="gcn", hidden=8, num_layers=1, out_dim=2, dropout=0.0,
    ))
    b0 = jax.tree.map(jnp.asarray, batch_list[0])
    variables = model.init(jax.random.key(0), b0)

    def fresh_state():
        # deep-copy: the train steps donate (and delete) their inputs
        return TrainState.create(
            jax.tree.map(jnp.array, variables["params"]),
            jax.tree.map(jnp.array, variables.get("batch_stats", {})),
            adam_with_plateau(1e-2),
        )

    # sequential
    step = make_train_step(model, ce_graph_loss)
    s1 = fresh_state()
    key = jax.random.key(7)
    seq_losses = []
    for b in batch_list:
        s1, loss = step(s1, jax.tree.map(jnp.asarray, b), key)
        seq_losses.append(float(loss))

    # one scan dispatch
    multi = make_multi_train_step(model, ce_graph_loss)
    s2 = fresh_state()
    stacked = jax.tree.map(jnp.asarray, stack_batches(batch_list))
    s2, losses = multi(s2, stacked, key)

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s1.params, s2.params,
    )
    assert int(s2.step) == 3


def test_adam_grad_clip_bounds_update():
    """adam_with_plateau(grad_clip=c) clips the global grad norm before
    the Adam moments — a 1e6-scaled gradient must produce the SAME
    first-step update as its clipped direction, and set_learning_rate
    must still reach the injected hyperparams through the chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        get_learning_rate,
        set_learning_rate,
    )

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    g_small = {"w": jnp.full((4,), 1e-4), "b": jnp.full((2,), -1e-4)}
    g_huge = jax.tree.map(lambda x: x * 1e10, g_small)

    def first_update(tx, grads):
        state = TrainState.create(params, {}, tx)
        updates, _ = state.tx.update(grads, state.opt_state, state.params)
        return updates

    clipped = first_update(adam_with_plateau(1e-3, grad_clip=1.0), g_huge)
    # direction identical to the small-gradient update (Adam first step
    # is ~lr * sign for any magnitude, so compare against the explicitly
    # normalized gradient instead): clip rescales to norm 1
    norm = float(
        jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(g_huge)))
    )
    want = first_update(
        adam_with_plateau(1e-3),
        jax.tree.map(lambda x: x / norm, g_huge),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5
        ),
        clipped, want,
    )

    state = TrainState.create(params, {}, adam_with_plateau(1e-3, 1.0))
    state = set_learning_rate(state, 5e-4)
    np.testing.assert_allclose(get_learning_rate(state), 5e-4, rtol=1e-6)
