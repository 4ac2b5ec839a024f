"""NestedPPGN forward/shape/mask tests."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.models.nested_ppgn import (
    NestedPPGN,
    NestedPPGNConfig,
    diag_offdiag_pool_masked,
)
from tests.conftest import random_graph


def make_copy_graphs(rng, k=2):
    cfg = NodeSubgraphConfig(h=2, use_rd=True, keep_orig_adj=True)
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 5, n).astype(np.int32)[:, None],
            y=np.asarray([rng.integers(0, 2)], np.int64),
        )
        graphs.append(create_node_subgraphs(g, cfg))
    return graphs


def test_orig_adj_batched(rng):
    graphs = make_copy_graphs(rng, 2)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    assert spec.max_segments_per_graph > 0
    b = pad_and_batch(graphs, spec)
    adj = b.extras["orig_adj"]
    assert adj.shape[0] == 2
    for gi, g in enumerate(graphs):
        ns = g.extras["orig_adj"].shape[0]
        np.testing.assert_array_equal(adj[gi, :ns, :ns], g.extras["orig_adj"])
        assert adj[gi, ns:, :].sum() == 0


def test_diag_offdiag_pool_masked_golden():
    # one graph, 2 real nodes of 3 slots, 1 channel
    x = np.zeros((1, 3, 3, 1), np.float32)
    x[0, :2, :2, 0] = [[1.0, 5.0], [-2.0, 3.0]]
    x[0, 2, 2, 0] = 99.0  # padding junk must be ignored
    m = jnp.asarray([[True, True, False]])
    mx = np.asarray(diag_offdiag_pool_masked(jnp.asarray(x), m, "max"))
    mn = np.asarray(diag_offdiag_pool_masked(jnp.asarray(x), m, "min"))
    me = np.asarray(diag_offdiag_pool_masked(jnp.asarray(x), m, "mean"))
    assert mx[0, 0] == 3.0 and mx[0, 1] == 5.0  # diag max, offdiag max
    assert mn[0, 0] == 1.0 and mn[0, 1] == -2.0
    np.testing.assert_allclose(me[0], [2.0, 1.5], atol=1e-6)


def test_nested_ppgn_graph_pred(rng):
    graphs = make_copy_graphs(rng, 2)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = NestedPPGN(
        NestedPPGNConfig(emb_dim=8, num_rb_layers=1, num_tasks=2,
                         use_rd=True, max_nodes_per_subgraph=8)
    )
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-5
    )


def test_nested_ppgn_node_level(rng):
    graphs = make_copy_graphs(rng, 2)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = NestedPPGN(
        NestedPPGNConfig(emb_dim=8, num_rb_layers=1, num_tasks=3,
                         graph_pred=False, classify=False,
                         max_nodes_per_subgraph=8)
    )
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (spec.num_segments, 3)
    # padded subgraph rows are exactly zero
    sm = np.asarray(b.segment_mask)
    assert np.all(np.asarray(out)[~sm] == 0)
    assert np.all(np.isfinite(np.asarray(out)))


def test_nested_ppgn_padding_invariance(rng):
    import dataclasses

    graphs = make_copy_graphs(rng, 2)
    s1 = BatchSpec.from_graphs(graphs, batch_size=2)
    s2 = dataclasses.replace(
        s1, num_nodes=s1.num_nodes + 16, num_edges=s1.num_edges + 128,
        num_segments=s1.num_segments + 8,
    )
    b1 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s1))
    b2 = jax.tree.map(jnp.asarray, pad_and_batch(graphs, s2))
    model = NestedPPGN(
        NestedPPGNConfig(emb_dim=8, num_rb_layers=1, num_tasks=2,
                         use_rd=True, max_nodes_per_subgraph=8)
    )
    v = model.init(jax.random.key(0), b1)
    o1 = model.apply(v, b1)
    o2 = model.apply(v, b2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)
