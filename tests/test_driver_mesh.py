"""Driver-level smoke of the mesh training paths (run_graphcount
--mesh ep): featurize -> pool -> edge-sharded whole-epoch scan -> eval,
end to end through the real CLI on a 4-virtual-device CPU mesh. The
numeric ep == single-device equivalence lives in
tests/test_edge_partition.py; this locks the driver wiring itself.

Uses the repo-committed n60/h2 featurization cache (data/count_cycle) so
the subprocess spends its time in the train path, not generation.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_graphcount_mesh_ep_smoke(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # honored by setup_jax (utils/env.py)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    out = subprocess.run(
        [sys.executable, "run_graphcount.py",
         "--target", "0", "--h", "2", "--num_graphs", "60",
         "--batch_size", "8", "--epochs", "1",
         "--mesh", "ep", "--mesh_devices", "4",
         "--membership_pools", "1",
         "--res_dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "mesh: ep over 4 devices" in out.stdout
    assert "epoch 001" in out.stdout
    assert os.path.exists(tmp_path / "run" / "log.txt")


def _run_driver(tmp_path, mesh_args, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    return subprocess.run(
        [sys.executable, "run_graphcount.py",
         "--target", "0", "--h", "2", "--num_graphs", "60",
         "--batch_size", "8", "--epochs", "1",
         "--membership_pools", "1",
         "--res_dir", str(tmp_path / "run")]
        + list(mesh_args) + list(extra),
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )


def test_run_graphcount_mesh_halo_smoke(tmp_path):
    """Driver-reachable halo (round 3): receiver-range node+edge shards
    with a per-batch device-resident halo pool."""
    out = _run_driver(
        tmp_path, ["--mesh", "halo", "--mesh_devices", "4"]
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "mesh: halo over 4 devices" in out.stdout
    assert "halo pool:" in out.stdout
    assert "epoch 001" in out.stdout
    assert os.path.exists(tmp_path / "run" / "log.txt")


def test_run_graphcount_mesh_dp_ep_smoke(tmp_path):
    """Driver-reachable 2-D dp x ep mesh (round 3)."""
    out = _run_driver(
        tmp_path,
        ["--mesh", "dp_ep", "--mesh_devices", "4", "--mesh_dp", "2"],
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "mesh: dp_ep over 2x2 devices" in out.stdout
    assert "epoch 001" in out.stdout
    assert os.path.exists(tmp_path / "run" / "log.txt")


def test_run_zinc_mesh_halo_smoke(tmp_path):
    """Graph-level halo through the real ZINC driver (round 3): the
    graph pool is psum'd globally, loss/D per shard."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    out = subprocess.run(
        [sys.executable, "run_zinc.py",
         "--num_graphs", "60", "--batch_size", "8", "--epochs", "1",
         "--hidden", "16", "--layers", "2",
         "--mesh", "halo", "--mesh_devices", "4",
         "--membership_pools", "1",
         "--res_dir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "mesh: halo over 4 devices" in out.stdout
    assert "epoch 001" in out.stdout
