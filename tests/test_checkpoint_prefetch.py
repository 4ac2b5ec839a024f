"""CheckpointManager roundtrip + prefetched_batches equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, batch_iterator, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.data.prefetch import prefetched_batches
from escgnn_tpu.train.checkpoint import CheckpointManager
from tests.conftest import random_graph


def _tree(rng):
    return {
        "params": {
            "w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(3,)).astype(np.float32)),
        },
        "stats": {"mean": jnp.zeros(3), "var": jnp.ones(3)},
    }


def test_checkpoint_roundtrip(tmp_path, rng):
    ckpt = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    assert ckpt.latest_step() is None
    assert ckpt.restore() is None
    t1, t2, t3 = _tree(rng), _tree(rng), _tree(rng)
    ckpt.save(1, t1)
    ckpt.save(5, t2)
    ckpt.save(9, t3)
    assert ckpt.latest_step() == 9
    # max_to_keep=2: step 1 evicted
    assert sorted(ckpt.all_steps()) == [5, 9]
    out = ckpt.restore(template=t1)  # latest
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        out, t3,
    )
    out5 = ckpt.restore(5, template=t1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        out5, t2,
    )


def test_prefetched_matches_plain_iterator(rng):
    graphs = []
    for i in range(7):
        n, ei = random_graph(rng, max_n=8)
        graphs.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.normal(size=(n, 3)).astype(np.float32),
            y=np.asarray([float(i)], np.float32),
        ))
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    plain = list(batch_iterator(graphs, spec))
    pref = list(prefetched_batches(graphs, spec, to_device=True))
    assert len(plain) == len(pref)
    for a, b in zip(plain, pref):
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            jax.tree.map(np.asarray, a), jax.tree.map(np.asarray, b),
        )


def test_prefetched_shuffle_covers_all(rng):
    graphs = []
    for i in range(10):
        n, ei = random_graph(rng, max_n=6)
        graphs.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.normal(size=(n, 2)).astype(np.float32),
            y=np.asarray([float(i)], np.float32),
        ))
    spec = BatchSpec.from_graphs(graphs, batch_size=4)
    ys = []
    for b in prefetched_batches(
        graphs, spec, shuffle=True, rng=np.random.default_rng(3)
    ):
        ys.extend(np.asarray(b.y)[np.asarray(b.graph_mask), 0].tolist())
    assert sorted(ys) == [float(i) for i in range(10)]


def test_stacked_batch_pools_and_stack_split(rng):
    from escgnn_tpu.data.prefetch import stack_split, stacked_batch_pools

    graphs = []
    for i in range(10):
        n, ei = random_graph(rng, max_n=6)
        graphs.append(GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.normal(size=(n, 2)).astype(np.float32),
            y=np.asarray([float(i)], np.float32),
        ))
    spec = BatchSpec.from_graphs(graphs, batch_size=4)

    # stack_split: leading axis == batch count, slices == batch_iterator
    stacked = stack_split(graphs, spec)
    plain = list(batch_iterator(graphs, spec))
    assert np.asarray(stacked.y).shape[0] == len(plain)
    for i, b in enumerate(plain):
        np.testing.assert_array_equal(np.asarray(stacked.y)[i], b.y)
        np.testing.assert_array_equal(np.asarray(stacked.x)[i], b.x)

    # pools: every pool covers all graphs; num_batches is the ceil count
    pools, nb, _ = stacked_batch_pools(graphs, spec, k=3, seed=0)
    assert len(pools) == 3 and nb == 3
    for p in pools:
        ys = np.asarray(p.y)[np.asarray(p.graph_mask)].ravel()
        assert sorted(ys.tolist()) == [float(i) for i in range(10)]
    # the byte budget caps k (one pool here is far over 1 byte)
    few, _, _ = stacked_batch_pools(graphs, spec, k=3, seed=0,
                                 max_total_bytes=1)
    assert len(few) == 1
