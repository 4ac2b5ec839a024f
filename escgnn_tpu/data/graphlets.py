"""Per-node induced 4-node graphlet counts.

The `count_graphlet` targets of the reference's counting benchmark
(`GraphCountDataset.py`, README `count_graphlet` runs): for every node,
the number of induced 4-node subgraphs of each type it belongs to —
columns = [tailed triangle, chordal cycle (diamond), 4-clique,
4-path (P4)]. Exact enumeration over all C(n, 4) node subsets (n <= ~30
in the benchmark, so at most ~30k subsets per graph).
"""

from __future__ import annotations

import itertools

import numpy as np


def count_graphlets_per_node(num_nodes: int, edge_index) -> np.ndarray:
    ei = np.asarray(edge_index)
    A = np.zeros((num_nodes, num_nodes), bool)
    A[ei[0], ei[1]] = True
    A |= A.T
    np.fill_diagonal(A, False)
    counts = np.zeros((num_nodes, 4), np.int64)
    for quad in itertools.combinations(range(num_nodes), 4):
        sub = A[np.ix_(quad, quad)]
        deg = sub.sum(1)
        ne = int(deg.sum()) // 2
        col = -1
        if ne == 6:
            col = 2  # 4-clique
        elif ne == 5:
            col = 1  # chordal cycle / diamond
        elif ne == 4 and deg.max() == 3:
            col = 0  # tailed triangle (degrees 1,2,2,3)
        elif ne == 3 and deg.max() == 2 and deg.min() == 1:
            col = 3  # induced path P4 (degrees 1,1,2,2)
        if col >= 0:
            counts[list(quad), col] += 1
    return counts
