"""Multi-host scaffolding (parallel/multihost.py): degenerate-exact at
one process, strided data sharding (the reference DistributedSampler
role, kernel/train_eval.py:44-52), global-mesh construction, and the
driver --multihost flag end to end. A real multi-process slice cannot
be exercised in this environment; these tests lock the code path and
its single-process equivalence."""

import os
import subprocess
import sys

import jax
import numpy as np

from escgnn_tpu.parallel.multihost import (
    host_local_to_global,
    init_multihost,
    make_global_mesh,
    process_shard,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_init_multihost_degenerate():
    """No coordinator, no env: initialize is NOT called, (1, 0)."""
    assert "JAX_COORDINATOR_ADDRESS" not in os.environ
    assert init_multihost() == (1, 0)
    # jax still works single-process afterwards
    assert jax.process_count() == 1


def test_process_shard_striding():
    items = list(range(10))
    assert process_shard(items, 0, 1) == items  # degenerate identity
    s0 = process_shard(items, 0, 4)
    s1 = process_shard(items, 1, 4)
    s3 = process_shard(items, 3, 4)
    assert s0 == [0, 4, 8] and s1 == [1, 5, 9] and s3 == [3, 7]
    # every item lands on exactly one process
    all_items = sorted(
        sum((process_shard(items, p, 4) for p in range(4)), [])
    )
    assert all_items == items


def test_make_global_mesh_shapes():
    mesh = make_global_mesh(("data",))
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_global_mesh(("data", "model"), shape=(2, 4))
    assert mesh2.devices.shape == (2, 4)
    assert mesh2.axis_names == ("data", "model")


def test_host_local_to_global_degenerate_equals_device_put():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_global_mesh(("data",))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    g = host_local_to_global({"x": x}, mesh, P("data"))
    want = jax.device_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(np.asarray(g["x"]), np.asarray(want))
    assert g["x"].sharding.spec == want.sharding.spec


def test_run_graphcount_multihost_flag_degenerate(tmp_path):
    """--multihost through the real driver: single process is exactly
    the normal dp path (process 0/1 printed, training runs)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    out = subprocess.run(
        [sys.executable, "run_graphcount.py",
         "--target", "0", "--h", "2", "--num_graphs", "60",
         "--batch_size", "8", "--epochs", "1",
         "--mesh", "dp", "--mesh_devices", "4", "--multihost",
         "--membership_pools", "1",
         "--res_dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    # (the virtual device count depends on the inherited XLA_FLAGS)
    assert "multihost: process 0/1," in out.stdout
    assert "epoch 001" in out.stdout
