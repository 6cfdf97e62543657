"""The round perf record must land no matter what the device does.

Round 2's driver-captured bench artifact was a stack trace (a tunnel
FAILED_PRECONDITION killed bench.py during device setup), so bench.py
was rebuilt around child processes + watchdogs + a guaranteed JSON line.
These tests pin that contract: the parent prints exactly ONE parseable
JSON line on stdout in both the success and the everything-failed case.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(extra_env, timeout=600):
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=timeout,
    )
    lines = [l for l in proc.stdout.decode().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {lines!r}"
    return json.loads(lines[0]), proc


def test_bench_parent_emits_one_json_line_on_success():
    record, proc = _run({
        "DMT_BENCH_PLATFORM": "cpu",
        "DMT_BENCH_ITERS": "2",
        "DMT_BENCH_CPU_BATCH": "256",
        "DMT_BENCH_SKIP_E2E": "1",
        "DMT_BENCH_SKIP_TRAIN": "1",  # exercised by test_bench_train_child
        "DMT_BENCH_BUDGET_S": "500",
    })
    assert record["metric"] == "bilstm_windows_per_s"
    assert record["value"] > 0
    assert record["unit"] == "windows/s"
    assert record["backend"] == "cpu"
    assert record["config"].startswith("xla-fp32")
    assert "vs_baseline" in record
    # mfu fields exist (None off-TPU — the FLOP model describes the
    # Pallas kernel) and the flop model itself is reported
    assert "mfu" in record
    assert record["model_flops_per_window"] > 0


def test_bench_parent_emits_degraded_json_when_children_die():
    """Even if every child fails instantly (bogus platform), the parent
    must still print a parseable record with value 0 + error +
    last-known-good context — never a stack trace, never nothing."""
    record, proc = _run({
        "DMT_BENCH_PLATFORM": "no_such_platform",
        "DMT_BENCH_BUDGET_S": "120",  # keeps retries/backoffs short
        "DMT_BENCH_SKIP_E2E": "1",
    })
    assert record["metric"] == "bilstm_windows_per_s"
    assert record["value"] == 0
    assert record["error"]
    assert record["last_known_good"]["value"] > 0


def test_bench_train_child(tmp_path):
    """--child train writes the driver-attested training-throughput
    fields (steps/s, batch, path) the round artifact carries."""
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    env.update({
        "DMT_BENCH_PLATFORM": "cpu",
        "DMT_BENCH_TRAIN_ITERS": "2",
    })
    out = str(tmp_path / "train.json")
    proc = subprocess.run(
        [sys.executable, BENCH, "--child", "train", "--out", out],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = json.load(open(out))
    assert rec["train_steps_per_s"] > 0
    assert rec["train_batch"] == 256  # CPU sizing
    assert rec["train_path"] == "xla-scan"
    assert rec["train_windows_per_s"] == pytest.approx(
        rec["train_steps_per_s"] * rec["train_batch"], rel=0.01
    )
