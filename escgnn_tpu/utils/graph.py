"""Small host-side graph utilities.

`negate_edge_index` mirrors the reference GraphGPS helper
(`GraphGPS/graphgps/utils.py:12-58`, unit-tested at
`GraphGPS/unittests/test_negate_edge_index.py`): the complementary edge
set of a (batched) sparse adjacency, ignoring self-loops — used by
SAN-style attention layers that attend over real and absent edges with
separate keys.
"""

from __future__ import annotations

import numpy as np


def negate_edge_index(edge_index, batch=None) -> np.ndarray:
    """Complementary (2, E') edge index per graph, self-loops excluded.

    `batch` assigns each node to a graph (None = one graph). Nodes of a
    graph must be contiguous. Output edges are sorted by (source, dest)
    within each graph, matching the reference's dense-mask scan order.
    """
    edge_index = np.asarray(edge_index).reshape(2, -1)
    if batch is None:
        n = int(edge_index.max()) + 1 if edge_index.size else 1
        batch = np.zeros(n, np.int64)
    batch = np.asarray(batch, np.int64)
    out_src, out_dst = [], []
    for g in range(int(batch.max()) + 1 if batch.size else 0):
        nodes = np.flatnonzero(batch == g)
        if nodes.size == 0:
            continue
        lo, n = nodes[0], nodes.size
        adj = np.zeros((n, n), bool)
        sel = (batch[edge_index[0]] == g) & (batch[edge_index[1]] == g)
        adj[edge_index[0][sel] - lo, edge_index[1][sel] - lo] = True
        np.fill_diagonal(adj, True)  # self-loops excluded from the complement
        a, b = np.nonzero(~adj)
        out_src.append(a + lo)
        out_dst.append(b + lo)
    if not out_src:
        return np.zeros((2, 0), np.int64)
    return np.stack(
        [np.concatenate(out_src), np.concatenate(out_dst)]
    ).astype(np.int64)
