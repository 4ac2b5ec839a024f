"""Runtime environment setup shared by every driver.

The reference has no equivalent (CUDA kernels ship precompiled); on TPU
the first jit of each program shape is an XLA compile, and on this dev
setup compiles route through a remote service with high and variable
latency (25-150 s+). The persistent compilation cache makes every driver
re-run, test iteration, and resumed job start at full speed.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent).

    Call before the first jit. `cache_dir` defaults to
    $JAX_CACHE_DIR or ~/.cache/escgnn_tpu/jax.
    """
    import jax

    # honor an explicit JAX_PLATFORMS request: the hosting image's
    # sitecustomize force-registers the remote TPU backend and overrides
    # the env var, so re-assert it through the config (must happen
    # before backend init; same trick as tests/conftest.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "escgnn_tpu", "jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile, even fast ones (defaults skip tiny programs)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: flag names differ; cache is an optimization only
