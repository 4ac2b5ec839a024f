import numpy as np
import pytest

from escgnn_tpu.data.csl import CSL_SKIPS, generate_csl
from escgnn_tpu.featurize.escgnn import EscConfig, esc_encode


def test_csl_generation():
    graphs = generate_csl(seed=0)
    assert len(graphs) == 150
    for g in graphs:
        assert g.num_nodes == 41
        # 4-regular: cycle + skip in both directions
        deg = np.bincount(g.edge_index[0], minlength=41)
        assert np.all(deg == 4)
    labels = np.asarray([int(g.y[0]) for g in graphs])
    assert np.array_equal(np.bincount(labels), [15] * 10)


def test_csl_classes_distinguished_by_encoding():
    """The ESC encoding must separate CSL classes: isomorphic copies get
    identical per-graph histogram multisets, different skips differ."""
    graphs = generate_csl(seed=0)
    # h=3 + rd + self-loop (the reference's config) separates all 10
    # classes; weaker configs (h=2, no rd) provably collide on some skips.
    cfg = EscConfig(h=3, use_rd=True, self_loop=True)

    def graph_signature(g):
        enc = esc_encode(g.num_nodes, g.edge_index, cfg)
        rows = []
        for e in range(enc.edge_index.shape[1]):
            lo, hi = enc.enc_offsets[e], enc.enc_offsets[e + 1]
            rows.append(tuple(zip(enc.enc_idx[lo:hi], enc.enc_cnt[lo:hi])))
        return tuple(sorted(rows))

    # one per class + one permuted copy of class 0
    sigs = [graph_signature(graphs[15 * c]) for c in range(10)]
    assert len(set(sigs)) == 10, "classes must have distinct signatures"
    sig_perm = graph_signature(graphs[1])  # permuted copy of class 0
    assert sig_perm == sigs[0], "isomorphic copies must share signatures"


def test_sr25_encoding_separation_limit():
    """SR25: the ESC encoding separates 99/105 graph pairs; exactly 6
    pairs are bucket-identical (a measured property of the encoding —
    the untrained-model collision check in run_sr.py bottoms out here).
    SR(25,12,5,6) graphs have diameter 2, so h=2 gives the same
    histograms as h=3 and keeps the test fast."""
    from escgnn_tpu.data.sr import load_sr_graphs

    try:
        graphs = load_sr_graphs()
    except FileNotFoundError:
        pytest.skip("sr25 g6 file not available")
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)

    def sig(g):
        enc = esc_encode(g.num_nodes, g.edge_index, cfg)
        rows = []
        for e in range(enc.edge_index.shape[1]):
            lo, hi = enc.enc_offsets[e], enc.enc_offsets[e + 1]
            rows.append(tuple(zip(enc.enc_idx[lo:hi], enc.enc_cnt[lo:hi])))
        return tuple(sorted(rows))

    sigs = [sig(g) for g in graphs]
    n = len(sigs)
    coll = {(i, j) for i in range(n) for j in range(i + 1, n)
            if sigs[i] == sigs[j]}
    assert coll == {(3, 9), (4, 11), (5, 10), (6, 12), (7, 13), (8, 14)}


def test_exp_loader():
    pytest.importorskip("torch")
    from escgnn_tpu.data.planar_sat import load_planar_sat

    try:
        graphs = load_planar_sat("EXP")
    except FileNotFoundError:
        pytest.skip("EXP raw pickle not available")
    assert len(graphs) == 1200
    ys = np.asarray([int(g.y[0]) for g in graphs])
    assert set(ys) == {0, 1}
    # pairs are adjacent with opposite labels
    assert np.all(ys[0::2] != ys[1::2])
    g = graphs[0]
    assert g.edge_index.max() < g.num_nodes
