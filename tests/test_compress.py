"""Lossless pool compression (data/compress.py): round-trip equality and
train-step equivalence on compressed device-resident pools (the round-4
lever extending the t2 data-scaling curve past the HBM limit)."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, batch_iterator
from escgnn_tpu.data.compress import (
    compress_tree,
    compress_tree_like,
    make_decoder,
    pool_nbytes,
)
from escgnn_tpu.data.counting import (
    CountingDatasetConfig,
    generate_counting_graphs,
    normalize_targets,
)
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import featurize_many


def _counting_batch():
    splits = generate_counting_graphs(
        CountingDatasetConfig(num_graphs=60, seed=0)
    )
    splits, _, _ = normalize_targets(splits, 2)
    feats = featurize_many(
        splits["train"], EscConfig(h=2, use_rd=True, self_loop=True)
    )
    spec = BatchSpec.uniform(feats, 16, enc_layout="dedup")
    return list(batch_iterator(feats, spec))


def test_compress_roundtrip_exact():
    batches = _counting_batch()
    host = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    ctree, metas = compress_tree(host)
    # meaningful shrink on counting shapes (countmat f32 -> int8 etc.)
    assert pool_nbytes(ctree) < 0.5 * pool_nbytes(host)
    decode = make_decoder(metas)
    dev = jax.tree.map(jnp.asarray, ctree)
    back = decode(dev)
    ref = jax.tree.map(jnp.asarray, host)  # canonicalized dtypes
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(back)):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compress_like_shares_dtypes():
    batches = _counting_batch()
    host = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    c0, _ = compress_tree(host)
    # shuffled membership -> same value universe, same dtypes
    rev = list(reversed(batches))
    host2 = jax.tree.map(lambda *xs: np.stack(xs), *rev)
    c2 = compress_tree_like(host2, c0)
    for a, b in zip(jax.tree.leaves(c0), jax.tree.leaves(c2)):
        assert a.dtype == b.dtype


def test_decoder_valid_across_stacks():
    """One decoder (built from one stack) restores a DIFFERENT stack
    where some leaf may not have compressed."""
    batches = _counting_batch()
    h1 = jax.tree.map(lambda *xs: np.stack(xs), *batches[:1])
    h2 = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    _, metas = compress_tree(h1)
    decode = make_decoder(metas)
    c2, _ = compress_tree(h2)
    back = decode(jax.tree.map(jnp.asarray, c2))
    ref = jax.tree.map(jnp.asarray, h2)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(back)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pool_train_step_equal_compressed():
    """The scanned pool epoch on a compressed pool produces the same
    losses and parameters as on the uncompressed pool."""
    from escgnn_tpu.models.nested_gin_eff import (
        NestedGINEff,
        NestedGINEffConfig,
    )
    from escgnn_tpu.train.loop import (
        TrainState,
        adam_with_plateau,
        l1_node_loss,
        make_pool_train_step,
    )

    batches = _counting_batch()
    host = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    pool_f32 = jax.tree.map(jnp.asarray, host)
    ctree, metas = compress_tree(host)
    pool_c = jax.tree.map(jnp.asarray, ctree)
    decode = make_decoder(metas)

    model = NestedGINEff(NestedGINEffConfig(
        hidden=32, num_layers=2, dropout=0.0, act="elu", graph_pred=False,
        use_x_embedding_jk=False, head_order="dropout_act",
    ))
    b0 = jax.tree.map(lambda a: a[0], pool_f32)
    var = model.init(jax.random.key(0), b0)

    def fresh_state():
        # copy: the pool step donates its state (same initial buffers
        # would otherwise be consumed by the first call)
        return TrainState.create(
            jax.tree.map(jnp.array, var["params"]),
            jax.tree.map(jnp.array, var.get("batch_stats", {})),
            adam_with_plateau(1e-3),
        )

    order = jnp.arange(len(batches), dtype=jnp.int32)
    rng = jax.random.key(1)
    s1, l1 = make_pool_train_step(model, l1_node_loss)(
        fresh_state(), pool_f32, order, rng
    )
    s2, l2 = make_pool_train_step(model, l1_node_loss, decode=decode)(
        fresh_state(), pool_c, order, rng
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
