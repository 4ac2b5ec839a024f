"""Golden tests of the ESC per-edge structural encoding.

The fast vectorized encoder must match (bucket for bucket) the slow
per-edge oracle, which independently re-derives the reference semantics
(`utils_edge_efficient.py:20-151`). Plus hand-computed values on a
triangle.
"""

import numpy as np
import pytest

from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig, esc_encode
from escgnn_tpu.featurize.bfs import hop_distance_matrix
from escgnn_tpu.featurize.layout import EncodingLayout
from escgnn_tpu.featurize.oracle import esc_encode_oracle
from tests.conftest import random_graph


def dense_rows(enc, dim):
    E = enc.edge_index.shape[1]
    out = np.zeros((E, dim), np.float32)
    for e in range(E):
        lo, hi = enc.enc_offsets[e], enc.enc_offsets[e + 1]
        out[e, enc.enc_idx[lo:hi]] = enc.enc_cnt[lo:hi]
    return out


def assert_encodings_equal(num_nodes, edge_index, cfg):
    fast = esc_encode(num_nodes, edge_index, cfg)
    slow = esc_encode_oracle(num_nodes, edge_index, cfg)
    np.testing.assert_array_equal(fast.edge_index, slow.edge_index)
    df = dense_rows(fast, cfg.layout.dim)
    ds = dense_rows(slow, cfg.layout.dim)
    if not np.array_equal(df, ds):
        bad_e, bad_b = np.nonzero(df != ds)
        raise AssertionError(
            f"encoding mismatch at edges {bad_e[:10]} buckets {bad_b[:10]}: "
            f"fast={df[bad_e[:10], bad_b[:10]]} slow={ds[bad_e[:10], bad_b[:10]]}"
        )


@pytest.mark.parametrize(
    "h,use_rd,self_loop",
    [(1, True, True), (2, False, True), (3, True, False), (3, True, True)],
)
def test_fast_matches_oracle_random(rng, self_loop, use_rd, h):
    for _ in range(2):
        n, ei = random_graph(rng, max_n=11)
        cfg = EscConfig(h=h, use_rd=use_rd, self_loop=self_loop)
        assert_encodings_equal(n, ei, cfg)


def test_fast_matches_oracle_disconnected(rng):
    # two components; some nodes unreachable -> z = h+1 labels exercised
    n1, e1 = random_graph(rng, n=6, p=0.5)
    n2, e2 = random_graph(rng, n=5, p=0.5)
    ei = np.concatenate([e1, e2 + n1], axis=1)
    for cfg in [EscConfig(h=2), EscConfig(h=3, self_loop=False)]:
        assert_encodings_equal(n1 + n2, ei, cfg)


def test_hop_distance_matrix_path():
    # path graph 0-1-2-3, undirected
    ei = np.array([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    D = hop_distance_matrix(4, ei, 2)
    assert D[0, 0] == 0 and D[0, 1] == 1 and D[0, 2] == 2
    assert D[0, 3] == 3  # capped at h+1
    assert D[3, 1] == 2


def test_triangle_golden():
    """Hand-computed encoding of a triangle, h=1, no rd, no self-loops.

    Each directed edge (u,v): both ego-nets cover all 3 nodes.
    z labels: u=(0,1), v=(1,0), w=(1,1). Degrees within subgraph: all 2.
    Edges: all 6 directed edges present.
    """
    lay = EncodingLayout(use_rd=False)
    ei = np.array([[0, 1, 1, 2, 2, 0], [1, 0, 2, 1, 0, 2]])
    cfg = EscConfig(h=1, use_rd=False, self_loop=False)
    enc = esc_encode(3, ei, cfg)
    rows = dense_rows(enc, lay.dim)
    for e in range(6):
        r = rows[e]
        assert r[2] == 3  # three nodes of degree 2
        # z0: one node at 0, two at 1; z1 likewise
        assert r[lay.z0_offset + 0] == 1 and r[lay.z0_offset + 1] == 2
        assert r[lay.z1_offset + 0] == 1 and r[lay.z1_offset + 1] == 2
        # 6 directed edges, tuples: (0,1)->(0,1,1,0)=42, (1,0)->(1,0,0,1)=217,
        # (1,2)->(1,0,1,1)=223, (2,1)->(1,1,1,0)=258, (2,0)->(1,1,0,1)=253,
        # (0,2)->(0,1,1,1)=43
        et = lay.edge_type_offset
        for t in (42, 217, 223, 258, 253, 43):
            assert r[et + t] == 1, t
        assert r.sum() == 3 + 3 + 3 + 6


def test_triangle_rd_self_loop():
    """Triangle with self_loop=True, use_rd=True, h=2: check rd buckets.

    Resistance distance between adjacent triangle nodes is 2/3 -> int 0.
    For self-loop edges the phantom root gives rd = diag(L+) = 1/3 -> 0.
    So every rd count lands at bucket 400 (+2 for rd=0 of root & phantom).
    """
    lay = EncodingLayout(use_rd=True)
    ei = np.array([[0, 1, 1, 2, 2, 0], [1, 0, 2, 1, 0, 2]])
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    enc = esc_encode(3, ei, cfg)
    rows = dense_rows(enc, lay.dim)
    assert enc.edge_index.shape[1] == 9  # 6 + 3 self loops
    # normal edge 0: 3 nodes, rd values {0, 2/3, 2/3} -> all bucket 400
    assert rows[0, lay.rd_offset] == 3
    # self-loop edge (last 3): 4 entries (3 real diag 1/3 + phantom 0)
    assert rows[8, lay.rd_offset] == 4
    # degrees now include self-loops: real nodes have degree 3; phantom 0
    assert rows[8, 3] == 3 and rows[8, 0] == 1
    # oracle agreement
    assert_encodings_equal(3, ei, cfg)


def test_cache_roundtrips_extras(tmp_path, rng):
    """save_graphs/load_graphs must preserve extras of every kind:
    node-aligned arrays, dense matrices, int scalars, 2-row index arrays."""
    from escgnn_tpu.featurize.cache import load_graphs, save_graphs

    n, ei = random_graph(rng, n=6, p=0.5)
    g = GraphData(
        num_nodes=n,
        edge_index=ei,
        x=rng.normal(size=(n, 3)).astype(np.float32),
        y=np.asarray([1.0], np.float32),
        extras={
            "z": rng.integers(0, 5, (n, 2)).astype(np.int64),
            "attn_bias": rng.integers(0, 9, (n, n)).astype(np.int16),
            "num_subgraphs": n,
            "kset2_assign": rng.integers(0, n, (2, 7)).astype(np.int32),
            "rd": rng.normal(size=(n, 1)).astype(np.float32),
        },
    )
    g2 = GraphData(
        num_nodes=n, edge_index=ei,
        x=rng.normal(size=(n, 3)).astype(np.float32),
        y=np.asarray([0.0], np.float32),
        extras={
            "z": rng.integers(0, 5, (n, 2)).astype(np.int64),
            "attn_bias": rng.integers(0, 9, (n, n)).astype(np.int16),
            "num_subgraphs": n - 1,
            "kset2_assign": rng.integers(0, n, (2, 4)).astype(np.int32),
            "rd": rng.normal(size=(n, 1)).astype(np.float32),
        },
    )
    path = str(tmp_path / "g.npz")
    save_graphs(path, [g, g2])
    out = load_graphs(path)
    assert len(out) == 2
    for orig, got in zip([g, g2], out):
        for k, v in orig.extras.items():
            if isinstance(v, int):
                assert got.extras[k] == v
            else:
                np.testing.assert_array_equal(got.extras[k], v)
            if not isinstance(v, int):
                assert got.extras[k].dtype == v.dtype


def test_max_nodes_per_hop_routes_to_sampling_path(rng):
    from escgnn_tpu.featurize.transform import esc_transform

    n, ei = random_graph(rng, n=10, p=0.5)
    g = GraphData(num_nodes=n, edge_index=ei, x=np.ones((n, 3), np.float32))
    cfg = EscConfig(h=2, use_rd=True, self_loop=True, max_nodes_per_hop=2)
    a = esc_transform(g, cfg)
    b = esc_transform(g, cfg)
    # deterministic per-graph seeding, capped subgraphs
    assert np.array_equal(a.enc_idx, b.enc_idx)
    assert np.array_equal(a.enc_cnt, b.enc_cnt)
    # sampling shrinks (or keeps) the histogram mass vs the full encoder
    full = esc_transform(
        g, EscConfig(h=2, use_rd=True, self_loop=True)
    )
    assert a.enc_cnt.sum() <= full.enc_cnt.sum()


@pytest.mark.parametrize("cap", [1, 2, 3])
def test_mnph_fast_matches_oracle_bit_equal(rng, cap):
    """Sampled encoding: vectorized path == per-edge oracle under the
    same derived-seed sampling, across caps and graphs."""
    for trial in range(4):
        n, ei = random_graph(rng, min_n=6, max_n=12, p=0.5)
        cfg = EscConfig(h=3, use_rd=True, self_loop=True,
                        max_nodes_per_hop=cap)
        fast = esc_encode(n, ei, cfg, sample_seed=trial)
        slow = esc_encode_oracle(n, ei, cfg, sample_seed=trial)
        np.testing.assert_array_equal(fast.edge_index, slow.edge_index)
        np.testing.assert_array_equal(
            dense_rows(fast, cfg.layout.dim), dense_rows(slow, cfg.layout.dim)
        )


def test_mnph_caps_subgraph_growth(rng):
    """With cap k, a root discovers at most k new nodes per hop, so the
    z0==d histogram mass per edge is bounded by 1 + h*k + (v-side)."""
    n, ei = random_graph(rng, n=14, p=0.6)
    cap = 2
    cfg = EscConfig(h=3, use_rd=False, self_loop=False,
                    max_nodes_per_hop=cap)
    enc = esc_encode(n, ei, cfg, sample_seed=0)
    lay = cfg.layout
    E = enc.edge_index.shape[1]
    dense = dense_rows(enc, lay.dim)
    # member count per edge = union of two sampled ego-nets
    members = dense[:, :lay.deg_buckets].sum(axis=1)
    assert np.all(members <= 2 * (1 + cfg.h * cap))
    # the full encoder on this dense graph reaches far more nodes
    full = esc_encode(n, ei, EscConfig(h=3, use_rd=False, self_loop=False))
    full_members = dense_rows(full, lay.dim)[:, :lay.deg_buckets].sum(axis=1)
    assert full_members.max() > members.max()


def test_mnph_seed_changes_sample(rng):
    n, ei = random_graph(rng, n=14, p=0.6)
    cfg = EscConfig(h=2, use_rd=False, self_loop=False, max_nodes_per_hop=1)
    a = esc_encode(n, ei, cfg, sample_seed=0)
    b = esc_encode(n, ei, cfg, sample_seed=1)
    c = esc_encode(n, ei, cfg, sample_seed=0)
    np.testing.assert_array_equal(
        dense_rows(a, cfg.layout.dim), dense_rows(c, cfg.layout.dim)
    )
    assert not np.array_equal(
        dense_rows(a, cfg.layout.dim), dense_rows(b, cfg.layout.dim)
    )
