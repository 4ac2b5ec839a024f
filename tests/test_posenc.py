"""Positional-encoding tests — mirrors the reference's only real unit
test (GraphGPS/unittests/test_eigvecs.py: eigvec normalization on line
graphs and ER graphs vs numpy) plus RWSE/degree goldens and GPS wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from escgnn_tpu.data.batching import BatchSpec, pad_and_batch
from escgnn_tpu.data.container import GraphData
from escgnn_tpu.featurize.escgnn import EscConfig
from escgnn_tpu.featurize.posenc import (
    attach_degree,
    attach_lap_pe,
    attach_rwse,
    eigvec_normalizer,
    laplacian_eigendecomposition,
)
from escgnn_tpu.featurize.spd import attach_attn_bias
from escgnn_tpu.featurize.transform import esc_transform
from escgnn_tpu.models.gps import GPSConfig, GPSModel
from tests.conftest import random_graph


def _line_graph(n):
    a = np.arange(n - 1)
    return GraphData(
        num_nodes=n,
        edge_index=np.stack(
            [np.concatenate([a, a + 1]), np.concatenate([a + 1, a])]
        ).astype(np.int32),
    )


def test_eigvec_normalizations_line_graphs():
    # the reference's test: L1 -> |v| sums to 1; L2 -> unit norm;
    # abs-max -> max |v| = 1 (test_eigvecs.py:46-75)
    for n in range(4, 10):
        g = _line_graph(n)
        vals, vecs = laplacian_eigendecomposition(g)
        for norm, check in [
            ("L1", lambda v: np.abs(v).sum(0)),
            ("L2", lambda v: np.sqrt((v ** 2).sum(0))),
            ("abs-max", lambda v: np.abs(v).max(0)),
        ]:
            nv = eigvec_normalizer(vecs, vals, norm)
            np.testing.assert_array_almost_equal(
                check(nv), np.ones(n), decimal=6
            )


def test_eigvec_normalizations_random_graphs(rng):
    for _ in range(3):
        n, ei = random_graph(rng, max_n=9)
        g = GraphData(num_nodes=n, edge_index=ei)
        vals, vecs = laplacian_eigendecomposition(g)
        nv = eigvec_normalizer(vecs, vals, "L2")
        np.testing.assert_array_almost_equal(
            np.sqrt((nv ** 2).sum(0)), np.ones(n), decimal=6
        )


def test_lap_pe_line_graph_golden():
    # path graph eigenvalues: 2 - 2 cos(pi k / n); the Fiedler vector of a
    # path is monotone
    g = attach_lap_pe(_line_graph(6), k=4)
    pe = g.extras["lap_pe"]
    ev = g.extras["lap_eigvals"]
    want = 2 - 2 * np.cos(np.pi * np.arange(1, 5) / 6)
    np.testing.assert_allclose(ev[0], want, atol=1e-5)
    fiedler = pe[:, 0]
    diffs = np.diff(fiedler)
    assert np.all(diffs > 0) or np.all(diffs < 0)


def test_rwse_golden_triangle():
    # triangle: P = (J - I)/2; diag(P^1) = 0; diag(P^2) = 1/2;
    # diag(P^3) = 1/4
    pairs = [(0, 1), (1, 2), (0, 2)]
    ei = np.asarray(
        [[a for a, b in pairs] + [b for a, b in pairs],
         [b for a, b in pairs] + [a for a, b in pairs]], np.int32
    )
    g = attach_rwse(GraphData(num_nodes=3, edge_index=ei), k=3)
    np.testing.assert_allclose(
        g.extras["rwse"][0], [0.0, 0.5, 0.25], atol=1e-6
    )


def test_degree_golden():
    g = attach_degree(_line_graph(4))
    np.testing.assert_array_equal(
        g.extras["degree"][:, 0], [1, 2, 2, 1]
    )


def test_gps_with_posenc(rng):
    cfg = EscConfig(h=2, use_rd=True, self_loop=True)
    graphs = []
    for _ in range(2):
        n, ei = random_graph(rng, max_n=7)
        g = GraphData(
            num_nodes=n, edge_index=ei,
            x=rng.integers(0, 20, n).astype(np.int32)[:, None],
            edge_attr=rng.integers(1, 4, ei.shape[1]).astype(np.int32),
            y=rng.normal(size=(1,)).astype(np.float32),
        )
        g = esc_transform(g, cfg)
        g = attach_attn_bias(g)
        g = attach_lap_pe(g, k=4)
        g = attach_rwse(g, k=6)
        g = attach_degree(g)
        graphs.append(g)
    spec = BatchSpec.from_graphs(graphs, batch_size=2)
    b = jax.tree.map(jnp.asarray, pad_and_batch(graphs, spec))
    model = GPSModel(GPSConfig(
        dim_h=16, num_layers=1, num_heads=2, use_attn_bias=True,
        use_lap_pe=True, use_rwse=True, use_degree=True,
    ))
    v = model.init(jax.random.key(0), b)
    out = model.apply(v, b)
    assert out.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(out)))
