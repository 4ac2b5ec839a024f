"""Random-walk return-probability node encoder.

Mirror of reference `utils_edge_efficient.py:312-341` (`return_prob`):
k-step return probabilities of the lazy walk on A + I, computed through
the symmetric normalization eigendecomposition
rp[v, t] = sum_i U[v,i]^2 * lambda_i^(t+1). Attached as a node-aligned
extra ('rp'); models may concatenate it to node features.
"""

from __future__ import annotations

import numpy as np

from escgnn_tpu.data.container import GraphData


def attach_return_prob(g: GraphData, steps: int = 50) -> GraphData:
    n = g.num_nodes
    A = np.zeros((n, n))
    ei = np.asarray(g.edge_index)
    np.add.at(A, (ei[0], ei[1]), 1.0)
    A = A + np.eye(n)  # self loops, as in the reference
    d = A.sum(1)
    dinv_sqrt = 1.0 / np.sqrt(d)
    B = dinv_sqrt[:, None] * A * dinv_sqrt[None, :]
    lam, U = np.linalg.eigh(B)
    W = U * U  # (n, n): W[v, i] = U[v, i]^2
    rp = np.empty((n, steps), np.float32)
    li = lam.copy()
    for t in range(steps):
        rp[:, t] = W @ li
        li = li * lam
    extras = dict(g.extras or {})
    extras["rp"] = rp
    g.extras = extras
    return g
