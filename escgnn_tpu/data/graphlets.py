"""Per-node induced graphlet counts.

The `count_graphlet` targets of the reference's counting benchmark
(`GraphCountDataset.py`, README `count_graphlet` runs, targets 0-4):
for every node, the number of induced subgraphs of each type it belongs
to — columns = [tailed triangle, chordal cycle (diamond), 4-clique,
4-path (P4), triangle-rectangle]. The first four are 4-node graphlets,
counted by exact enumeration over all C(n, 4) node subsets (n <= ~30 in
the benchmark, so at most ~30k subsets per graph). The fifth is the
6-node motif of a triangle and a chordless 4-cycle sharing exactly one
vertex (induced: the 6-node subgraph has exactly the 7 motif edges),
counted by crossing the triangle list with the induced-C4 list.
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
    counts = np.zeros((num_nodes, 5), np.int64)
    c4s: list[tuple[int, ...]] = []
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
        elif ne == 4 and deg.max() == 2:
            c4s.append(quad)  # chordless 4-cycle (degrees 2,2,2,2)
        elif ne == 3 and deg.max() == 2 and deg.min() == 1:
            col = 3  # induced path P4 (degrees 1,1,2,2)
        if col >= 0:
            counts[list(quad), col] += 1
    triangles = [
        t for t in itertools.combinations(range(num_nodes), 3)
        if A[t[0], t[1]] and A[t[1], t[2]] and A[t[0], t[2]]
    ]
    for tri in triangles:
        ts = set(tri)
        for quad in c4s:
            if len(ts.intersection(quad)) != 1:
                continue
            union = list(ts.union(quad))  # 6 nodes
            if int(A[np.ix_(union, union)].sum()) // 2 == 7:
                counts[union, 4] += 1
    return counts
