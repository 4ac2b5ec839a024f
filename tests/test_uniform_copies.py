"""Uniform per-copy block layout (data/uniform_copies.py): structural
invariants + numerical equivalence of the copy-family models (NGNN /
I2GNN) between the ragged union layout and the blocked einsum layout.

The blocked layout is the round-4 answer to the copy-family scatter
bottleneck (reference ragged design: `utils_edge_I2.py:132-256`,
`zinc_models.py:200-248`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.data.uniform_copies import (
    copy_block_sizes,
    uniformize_copies,
    uniformize_dataset,
)
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.featurize.pair_subgraphs import (
    PairSubgraphConfig,
    create_pair_subgraphs,
)
from escgnn_tpu.models.i2gnn import I2GNN, I2GNNConfig
from escgnn_tpu.models.ngnn import NGNN, NGNNConfig
from tests.conftest import random_graph


def _raw_graphs(rng, k=3, max_n=8):
    out = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=max_n)
        out.append(GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 10, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        ))
    return out


def _ngnn_graphs(rng, k=3):
    cfg = NodeSubgraphConfig(h=2, use_rd=True)
    return [create_node_subgraphs(g, cfg) for g in _raw_graphs(rng, k)]


def _i2_graphs(rng, k=2):
    cfg = PairSubgraphConfig(h=2, use_rd=True)
    return [create_pair_subgraphs(g, cfg) for g in _raw_graphs(rng, k, 7)]


def test_uniformize_structure(rng):
    graphs = _ngnn_graphs(rng)
    n_c, e_c = copy_block_sizes(graphs)
    for g in graphs:
        u = uniformize_copies(g, n_c, e_c)
        C = int(g.extras["num_subgraphs"])
        assert u.num_nodes == C * n_c
        assert u.edge_index.shape[1] == C * e_c
        ex = u.extras
        # valid node count and per-node payload multiset preserved
        assert ex["node_valid"].sum() == g.num_nodes
        assert ex["edge_valid"].sum() == g.num_edges
        assert sorted(u.x[ex["node_valid"], 0].tolist()) == \
            sorted(np.asarray(g.x)[:, 0].tolist())
        # copy ids are the block index everywhere (padding included)
        assert np.array_equal(
            ex["node_to_subgraph"],
            np.repeat(np.arange(C), n_c),
        )
        # every edge stays inside its copy's block; padding edges park on
        # the trailing slot
        src, dst = u.edge_index
        assert np.all(src // n_c == dst // n_c)
        ev = ex["edge_valid"]
        assert np.all(dst[~ev] % n_c == n_c - 1)
        # receivers non-decreasing within each copy's edge slot range
        d2 = dst.reshape(C, e_c)
        assert np.all(np.diff(d2, axis=1) >= 0)
        # roots stay at local slot 0: z of block-leading valid rows is 0
        lead = np.arange(C) * n_c
        assert np.all(ex["z"][lead, 0] == 0)


def test_copy_uniform_batch_alignment(rng):
    graphs = _ngnn_graphs(rng)
    uni = uniformize_dataset(graphs)
    spec = BatchSpec.copy_uniform(uni, batch_size=len(uni))
    b = pad_and_batch(uni, spec)
    n_c = spec.copy_nodes
    assert b.nodes_per_seg == n_c
    S = b.segment_mask.shape[0]
    assert b.node_mask.shape[0] == S * n_c
    assert b.edge_mask.shape[0] == S * spec.copy_edges
    # block index == segment id for every valid node
    blk = np.arange(b.node_mask.shape[0]) // n_c
    ns = np.asarray(b.node_segment)
    nm = np.asarray(b.node_mask)
    assert np.array_equal(ns[nm], blk[nm])
    # masks count exactly the real nodes/edges
    assert nm.sum() == sum(g.num_nodes for g in graphs)
    assert np.asarray(b.edge_mask).sum() == sum(g.num_edges for g in graphs)


@pytest.mark.parametrize("pooling", ["mean", "center"])
def test_ngnn_ragged_vs_blocked_equal(rng, pooling):
    graphs = _ngnn_graphs(rng)
    spec_r = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    b_r = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec_r))
    uni = uniformize_dataset(graphs)
    spec_u = BatchSpec.copy_uniform(uni, batch_size=len(uni))
    b_u = jax.tree.map(jnp.asarray, pad_and_batch(uni, spec_u))

    model = NGNN(NGNNConfig(
        num_layers=2, hidden=16, use_rd=True, subgraph_pooling=pooling,
    ))
    var = model.init(jax.random.PRNGKey(0), b_r)
    out_r = model.apply(var, b_r)
    out_u = model.apply(var, b_u)
    G = len(graphs)
    np.testing.assert_allclose(
        np.asarray(out_r)[:G], np.asarray(out_u)[:G], rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("sp2", ["mean", "mean-center-side"])
def test_i2gnn_ragged_vs_blocked_equal(rng, sp2):
    graphs = _i2_graphs(rng)
    spec_r = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    b_r = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec_r))
    uni = uniformize_dataset(graphs)
    spec_u = BatchSpec.copy_uniform(uni, batch_size=len(uni))
    b_u = jax.tree.map(jnp.asarray, pad_and_batch(uni, spec_u))

    model = I2GNN(I2GNNConfig(
        num_layers=2, hidden=16, use_rd=True, subgraph2_pooling=sp2,
        double_pooling=(sp2 == "mean"), use_pooling_nn=(sp2 != "mean"),
    ))
    var = model.init(jax.random.PRNGKey(0), b_r)
    out_r = model.apply(var, b_r)
    out_u = model.apply(var, b_u)
    G = len(graphs)
    np.testing.assert_allclose(
        np.asarray(out_r)[:G], np.asarray(out_u)[:G], rtol=2e-5, atol=2e-5
    )


def test_blocked_training_step_matches_ragged(rng):
    """One SGD step on the blocked layout produces the same loss and the
    same parameter update as on the ragged layout."""
    graphs = _ngnn_graphs(rng)
    spec_r = BatchSpec.from_graphs(graphs, batch_size=len(graphs))
    b_r = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec_r))
    uni = uniformize_dataset(graphs)
    spec_u = BatchSpec.copy_uniform(uni, batch_size=len(uni))
    b_u = jax.tree.map(jnp.asarray, pad_and_batch(uni, spec_u))

    model = NGNN(NGNNConfig(num_layers=2, hidden=16, use_rd=True))
    var = model.init(jax.random.PRNGKey(0), b_r)
    G = len(graphs)
    y = jnp.stack([jnp.asarray(g.y).reshape(-1) for g in graphs])

    def loss_fn(params, b):
        out, _ = model.apply(
            {**var, "params": params}, b,
            use_running_average=False, mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(out[:G] - y))

    l_r, g_r = jax.value_and_grad(loss_fn)(var["params"], b_r)
    l_u, g_u = jax.value_and_grad(loss_fn)(var["params"], b_u)
    np.testing.assert_allclose(float(l_r), float(l_u), rtol=2e-5)
    flat_r = jax.tree.leaves(g_r)
    flat_u = jax.tree.leaves(g_u)
    for a, bb in zip(flat_r, flat_u):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-5
        )
