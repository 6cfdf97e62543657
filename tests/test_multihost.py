"""REAL multi-process jax.distributed validation (2 simulated hosts).

Spawns two fresh python processes that form a jax.distributed cluster
over a localhost gRPC coordinator (2 CPU devices each -> a 4-device
global mesh) and run the framework's cross-host primitives: the
psum-based position-count merge (parallel.aggregation) and one
data-parallel train step (parallel.shardings). This covers the
multi-host path that single-process virtual-device meshes cannot:
actual cross-process collectives.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_cluster(tmp_path):
    port = _free_port()
    nproc = 2
    outs = [str(tmp_path / f"out_{p}.json") for p in range(nproc)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "deepmod_tpu.testing.multihost_worker",
                str(p), str(nproc), str(port), outs[p],
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for p in range(nproc)
    ]
    logs = []
    for proc in procs:
        try:
            stdout, _ = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for proc, log in zip(procs, logs):
        assert proc.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["devices"] == 4          # 2 processes x 2 local devices
        assert r["local_devices"] == 2
        assert r["counts_ok"], "psum count merge != numpy all-process sum"
    # replicated outputs must agree exactly across processes
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["checksum"] == results[1]["checksum"]
