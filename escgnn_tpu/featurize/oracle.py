"""Slow per-edge oracle encoder (tests only).

An independent, deliberately literal re-derivation of the reference
semantics (`utils_edge_efficient.py:20-151`): one BFS per edge endpoint,
explicit node lists with the phantom-duplicate self-loop quirk, scipy
pinv per subgraph. Used exclusively to golden-test the fast vectorized
encoder (`escgnn.py`) — never on the training path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as ssp
from scipy import linalg as slinalg

from escgnn_tpu.featurize.escgnn import EscConfig, EscEncoding, canonical_edges


def _bfs_hops(
    root: int,
    num_hops: int,
    edges: np.ndarray,
    num_nodes: int,
    max_nodes_per_hop: Optional[int],
    sample_seed: int = 0,
) -> dict[int, int]:
    """Hop distance dict {node: dist} for nodes within num_hops of root,
    following edges backwards (sender <- receiver), with optional per-hop
    frontier subsampling as in the reference
    (`utils_edge_efficient.py:238-240`). The subsample is drawn via the
    canonical derived-seed procedure shared with the vectorized path
    (`bfs._sample_frontier`), so both produce the same sampled ego-net
    for a given (graph, root, seed)."""
    from escgnn_tpu.featurize.bfs import _sample_frontier

    senders, receivers = edges[0], edges[1]
    dist = {int(root): 0}
    frontier = [int(root)]
    for k in range(1, num_hops + 1):
        fset = set(frontier)
        nxt = []
        seen_this_hop = set()
        for s, r in zip(senders, receivers):
            if int(r) in fset and int(s) not in dist and int(s) not in seen_this_hop:
                nxt.append(int(s))
                seen_this_hop.add(int(s))
        if not nxt:
            break
        if max_nodes_per_hop is not None and len(nxt) > max_nodes_per_hop:
            nxt = list(_sample_frontier(
                np.asarray(sorted(nxt)), max_nodes_per_hop,
                sample_seed, int(root), k,
            ))
        for nid in nxt:
            dist[nid] = k
        frontier = nxt
    return dist


def esc_encode_oracle(
    num_nodes: int,
    edge_index: np.ndarray,
    cfg: EscConfig,
    sample_seed: int = 0,
) -> EscEncoding:
    lay = cfg.layout
    n = int(num_nodes)
    h = cfg.h
    edges, loop_mask = canonical_edges(n, edge_index, cfg.self_loop)
    E = edges.shape[1]

    all_idx, all_cnt, offsets = [], [], [0]
    for e in range(E):
        u, v = int(edges[0, e]), int(edges[1, e])
        du = _bfs_hops(u, h, edges, n, cfg.max_nodes_per_hop, sample_seed)
        dv = _bfs_hops(v, h, edges, n, cfg.max_nodes_per_hop, sample_seed)
        # Node list: [u, v, remaining-of-u's-net, remaining-of-v's-net].
        # When u == v the leading pair duplicates v (the reference's phantom
        # copy: both entries stay in the list, relabeling points edges at
        # the second).
        nodes = [u, v]
        for w in du:
            if w not in nodes:
                nodes.append(w)
        for w in dv:
            if w not in nodes:
                nodes.append(w)
        z = np.array(
            [[du.get(w, h + 1), dv.get(w, h + 1)] for w in nodes], np.int64
        )
        # Relabel (last assignment wins, as in the reference's index_put).
        local = {}
        for i, w in enumerate(nodes):
            local[w] = i
        member = set(nodes)
        sub_edges = [
            (local[int(a)], local[int(b)])
            for a, b in edges.T
            if int(a) in member and int(b) in member
        ]
        ns = len(nodes)

        hist = np.zeros(lay.dim, np.float64)
        # degree (out-degree over relabeled sub-edges, self-loops included)
        deg = np.zeros(ns, np.int64)
        for a, b in sub_edges:
            deg[a] += 1
        for d in deg:
            hist[int(d)] += 1
        # z one-hots
        for z0, z1 in z:
            hist[lay.z0_offset + int(z0)] += 1
            hist[lay.z1_offset + int(z1)] += 1
        # resistance distance to local node 0
        if cfg.use_rd:
            A = ssp.coo_matrix(
                (np.ones(len(sub_edges)), tuple(zip(*sub_edges)) if sub_edges else ([], [])),
                shape=(ns, ns),
            ).tocsr()
            lap = ssp.csgraph.laplacian(A).toarray()
            Li = slinalg.pinv(lap)
            rd = (
                Li[0, 0] + np.diagonal(Li) - Li[0, :] - Li[:, 0]
            )
            rd32 = rd.astype(np.float32)
            for val in rd32:
                hist[lay.rd_offset + int(val)] += 1
        # subgraph edge types (self-loops removed)
        w216, w36, w6, w1 = lay.pack_tuple_base()
        for a, b in sub_edges:
            if a == b:
                continue
            t = w216 * z[a, 0] + w36 * z[a, 1] + w6 * z[b, 0] + w1 * z[b, 1]
            hist[lay.edge_type_offset + int(t)] += 1

        nz = np.nonzero(hist)[0]
        all_idx.append(nz.astype(np.int32))
        all_cnt.append(hist[nz].astype(np.float32))
        offsets.append(offsets[-1] + len(nz))

    return EscEncoding(
        edge_index=edges.astype(np.int32),
        enc_idx=np.concatenate(all_idx) if all_idx else np.zeros(0, np.int32),
        enc_cnt=np.concatenate(all_cnt) if all_cnt else np.zeros(0, np.float32),
        enc_offsets=np.asarray(offsets, np.int64),
        self_loop_attr_mask=loop_mask,
    )
