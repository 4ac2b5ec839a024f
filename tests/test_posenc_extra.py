"""Heat-kernel diag + electrostatic encoding tests (reference
posenc_stats parity)."""

import numpy as np

from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.posenc import (
    attach_electrostatic,
    attach_heat_kernel_diag,
    heat_kernel_diag,
)
from tests.conftest import random_graph


def _complete_graph(n):
    src, dst = np.nonzero(~np.eye(n, dtype=bool))
    return GraphData(
        num_nodes=n, edge_index=np.stack([src, dst]).astype(np.int32)
    )


def test_heat_kernel_diag_complete_graph():
    # K_n Laplacian: eigenvalue n with multiplicity n-1 (plus 0);
    # heat diag = sum exp(-t n) phi^2 = exp(-t n) * (n-1)/n per node
    n = 5
    g = _complete_graph(n)
    out = heat_kernel_diag(g, [0.5, 1.0])
    for c, t in enumerate([0.5, 1.0]):
        want = np.exp(-t * n) * (n - 1) / n
        np.testing.assert_allclose(out[:, c], want, atol=1e-6)


def test_heat_kernel_diag_converges_to_uniform_complement():
    # as t -> inf the heat diag -> 0 (only zero-eigval term removed)
    g = _complete_graph(4)
    out = heat_kernel_diag(g, [100.0])
    assert np.all(out < 1e-6)


def test_electrostatic_shape_and_symmetry(rng):
    n, ei = random_graph(rng, n=8, p=0.5)
    g = GraphData(num_nodes=n, edge_index=ei)
    g = attach_electrostatic(g)
    enc = g.extras["elstatic"]
    assert enc.shape == (8, 10)
    assert np.all(np.isfinite(enc))
    # column 0 is a min over the diag-subtracted pinv -> nonpositive
    assert np.all(enc[:, 0] <= 1e-9)


def test_attach_heat_kernel_diag(rng):
    n, ei = random_graph(rng, n=7, p=0.4)
    g = attach_heat_kernel_diag(
        GraphData(num_nodes=n, edge_index=ei), kernel_times=(1.0, 2.0)
    )
    hk = g.extras["hkdiag"]
    assert hk.shape == (7, 2)
    # diffusion decays with time on every node
    assert np.all(hk[:, 1] <= hk[:, 0] + 1e-9)
