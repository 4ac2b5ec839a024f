"""REAL 2-process multihost dp execution (VERDICT r03 missing #1):
two CPU processes join a jax.distributed slice (2 local devices each,
4 global), run dp train steps through parallel/multihost.py +
parallel/data_parallel.py, and the global losses + updated parameters
must equal the identical single-process 4-device run.

Reference role: torch.distributed DistributedSampler + DDP
(`kernel/train_eval.py:44-57`)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_dp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    # the workers set their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env

def _last_json(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in worker output:\n{out[-2000:]}"
    return json.loads(lines[-1])


def test_two_process_dp_equals_single_process():
    env = _clean_env()
    port = _free_port()

    single = subprocess.run(
        [sys.executable, WORKER, "single"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert single.returncode == 0, single.stderr[-3000:]
    ref = _last_json(single.stdout)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "multi", str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        outs.append(_last_json(out))

    for rec in outs:
        assert rec["mode"] == "multi"
        np.testing.assert_allclose(
            rec["losses"], ref["losses"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            rec["param_checksum"], ref["param_checksum"], rtol=1e-5
        )
    # both processes agree bit-for-bit on the replicated result
    assert outs[0]["losses"] == outs[1]["losses"]
    assert outs[0]["param_checksum"] == outs[1]["param_checksum"]
