import jax
import jax.numpy as jnp
import numpy as np
import pytest

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.node_subgraphs import (
    NodeSubgraphConfig,
    create_node_subgraphs,
)
from escgnn_tpu.models.ngnn import NGNN, NGNNConfig
from tests.conftest import random_graph


def make_copy_graphs(rng, k=3, use_rd=True):
    cfg = NodeSubgraphConfig(h=2, use_rd=use_rd)
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=8)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=rng.integers(0, 10, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        graphs.append(create_node_subgraphs(g, cfg))
    return graphs


def test_node_subgraph_transform_structure(rng):
    n, ei = random_graph(rng, n=7, p=0.4)
    g = GraphData(
        num_nodes=n, edge_index=ei,
        x=np.arange(n, dtype=np.int32)[:, None],
    )
    cfg = NodeSubgraphConfig(h=2, use_rd=True)
    big = create_node_subgraphs(g, cfg)
    ex = big.extras
    assert ex["num_subgraphs"] == n
    # every copy's root has z == 0 and rd == 0
    seg = ex["node_to_subgraph"]
    firsts = np.searchsorted(seg, np.arange(n))
    assert np.all(ex["z"][firsts, 0] == 0)
    assert np.allclose(ex["rd"][firsts, 0], 0.0, atol=1e-5)
    # copied features match root-relabeling: first node of copy v is v
    assert np.all(big.x[firsts, 0] == np.arange(n))
    # edges stay within copies
    assert np.all(seg[big.edge_index[0]] == seg[big.edge_index[1]])


def test_ngnn_forward(rng):
    graphs = make_copy_graphs(rng, 3)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    assert spec.num_segments > 0
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    assert b.node_segment is not None and b.segment_graph is not None

    model = NGNN(NGNNConfig(num_layers=2, hidden=16, use_rd=True))
    variables = model.init(jax.random.key(0), b)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, b)
    assert out.shape == (3, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ngnn_center_pooling(rng):
    graphs = make_copy_graphs(rng, 2)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = NGNN(
        NGNNConfig(num_layers=1, hidden=8, use_rd=True,
                   subgraph_pooling="center")
    )
    variables = model.init(jax.random.key(0), b)
    out = model.apply(variables, b)
    assert np.all(np.isfinite(np.asarray(out)))
