import numpy as np

from escgnn_tpu.data.batching import BatchSpec, batch_iterator, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.transform import esc_transform
from tests.conftest import random_graph


def make_graphs(rng, k=5):
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(k):
        n, ei = random_graph(rng, max_n=10)
        g = GraphData(
            num_nodes=n,
            edge_index=ei,
            x=np.ones((n, 10), np.float32),
            y=rng.normal(size=(n, 1)).astype(np.float32),
        )
        graphs.append(esc_transform(g, cfg))
    return graphs


def test_pad_and_batch_roundtrip(rng):
    graphs = make_graphs(rng, 3)
    spec = BatchSpec.from_graphs(graphs, batch_size=3)
    b = pad_and_batch(graphs, spec)

    assert b.senders.shape == (spec.num_edges,)
    assert b.enc_idx.shape == (spec.num_edges, spec.enc_width)
    assert b.edge_mask.sum() == sum(g.num_edges for g in graphs)
    assert b.node_mask.sum() == sum(g.num_nodes for g in graphs)
    # receivers sorted ascending
    assert np.all(np.diff(b.receivers) >= 0)
    # every real edge's encoding row survives the permutation: compare the
    # multiset of (receiver-node original graph, dense row sum) pairs
    tot_cnt_batch = b.enc_cnt.sum()
    tot_cnt_ref = sum(float(g.enc_cnt.sum()) for g in graphs)
    assert np.isclose(tot_cnt_batch, tot_cnt_ref)
    # node-level y placed at node offsets
    y0 = b.y[: graphs[0].num_nodes]
    np.testing.assert_array_equal(y0, graphs[0].y)
    # padding edges carry zero counts
    assert b.enc_cnt[~b.edge_mask].sum() == 0


def test_edge_payload_permuted_consistently(rng):
    graphs = make_graphs(rng, 2)
    for g in graphs:
        g.edge_attr = np.arange(g.num_edges, dtype=np.int32)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = pad_and_batch(graphs, spec)
    # For each real edge in the batch, its (sender, receiver) localized back
    # to its graph must match the original edge at index edge_attr.
    n0 = graphs[0].num_nodes
    for i in np.nonzero(b.edge_mask)[0]:
        s, r = int(b.senders[i]), int(b.receivers[i])
        gi = 0 if s < n0 else 1
        off = 0 if gi == 0 else n0
        e_orig = int(b.edge_attr[i])
        g = graphs[gi]
        assert g.edge_index[0, e_orig] == s - off
        assert g.edge_index[1, e_orig] == r - off


def test_batch_iterator_covers_dataset(rng):
    graphs = make_graphs(rng, 5)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    batches = list(batch_iterator(graphs, spec, shuffle=False))
    assert len(batches) == 3
    assert batches[-1].graph_mask.sum() == 1
    total_nodes = sum(int(b.node_mask.sum()) for b in batches)
    assert total_nodes == sum(g.num_nodes for g in graphs)


def test_exact_spec_tight(rng):
    from escgnn_tpu.data.batching import BatchSpec, pad_and_batch

    graphs = [  # plain graphs, no encoding
        _plain_graph(rng) for _ in range(8)
    ]
    spec = BatchSpec.exact(graphs)
    tot_n = sum(g.num_nodes for g in graphs)
    tot_e = sum(g.num_edges for g in graphs)
    assert tot_n < spec.num_nodes <= tot_n + 9
    assert tot_e <= spec.num_edges <= tot_e + 128
    b = pad_and_batch(graphs, spec)  # must fit
    assert int(b.edge_mask.sum()) == tot_e


def test_packed_iterator_covers_once(rng):
    from escgnn_tpu.data.batching import (
        BatchSpec, packed_batch_iterator,
    )

    graphs = [_plain_graph(rng) for _ in range(23)]
    spec = BatchSpec.from_graphs(graphs, batch_size=4)
    seen_edges = 0
    n_batches = 0
    for b in packed_batch_iterator(graphs, spec, shuffle=True,
                                   rng=np.random.default_rng(0)):
        seen_edges += int(b.edge_mask.sum())
        n_batches += 1
        assert int(b.graph_mask.sum()) <= spec.num_graphs
    assert seen_edges == sum(g.num_edges for g in graphs)
    # packing should not need more batches than the fixed-count iterator
    assert n_batches <= -(-23 // 4) + 1


def _plain_graph(rng):
    from escgnn_tpu.data.container import GraphData
    from tests.conftest import random_graph

    n, ei = random_graph(rng, max_n=9)
    return GraphData(
        num_nodes=n, edge_index=ei,
        x=rng.normal(size=(n, 3)).astype(np.float32),
        y=np.asarray([0.0], np.float32),
    )
