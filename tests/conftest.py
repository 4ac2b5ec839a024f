"""Test config: force CPU with 8 virtual devices so sharding/mesh tests run
without TPU hardware. Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting image's sitecustomize force-registers a TPU backend and
# overrides jax_platforms; the config update wins if applied before
# backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, n=None, p=0.35, min_n=5, max_n=14):
    """Small random undirected graph as (num_nodes, edge_index)."""
    if n is None:
        n = int(rng.integers(min_n, max_n + 1))
    upper = np.triu(rng.random((n, n)) < p, k=1)
    a, b = np.nonzero(upper | upper.T)
    return n, np.stack([a, b]).astype(np.int32)
