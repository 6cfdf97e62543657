#!/usr/bin/env python
"""Multi-process detect scaling: merge overhead at 1/2/3 processes.

Runs the SAME synthetic detect job under a real ``jax.distributed``
cluster at 1, 2 and 3 processes (localhost gRPC coordinator, 2 virtual
CPU devices per process — the harness tests/test_multihost.py uses) and
reports, per cluster size:

- total reads/s and windows/s across the cluster
- the ``cross_process_merge`` stage (COO all-gather + count merge — the
  collective that replaces the reference's filesystem merge barrier,
  myDetect.py:1196-1221) as seconds and as a fraction of wall time

IMPORTANT caveat, stated here and in docs/Scaling.md: this VM has TWO
shared cores, so N processes time-slice the same silicon and absolute
reads/s does NOT scale — the meaningful scaling signal on this hardware
is the merge-overhead fraction (the only part of the run that is
communication, and the part that must stay small for the >=80%
1->N-host efficiency north star of BASELINE.json). On real multi-host
TPU the per-host compute is constant and wall time ~= single-host time +
merge overhead.

Usage: python scripts/bench_scale_multiproc.py [--reads 120] [--out FILE]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(nproc: int, dataset: str, workdir: str, timeout: int):
    port = _free_port()
    outs = [os.path.join(workdir, f"n{nproc}_p{p}.json") for p in range(nproc)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out_folder = os.path.join(workdir, f"out_n{nproc}")
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "deepmod_tpu.testing.multihost_worker",
                str(p), str(nproc), str(port), outs[p],
                "detect", dataset, out_folder,
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(nproc)
    ]
    # one shared deadline for the WHOLE cluster; on any failure kill every
    # worker (a surviving process blocked in the collective would hold the
    # coordinator port and skew later same-VM measurements)
    deadline = t0 + timeout
    logs = []
    try:
        for proc in procs:
            stdout, _ = proc.communicate(
                timeout=max(1.0, deadline - time.perf_counter())
            )
            logs.append(stdout.decode(errors="replace"))
        wall = time.perf_counter() - t0
        for proc, log in zip(procs, logs):
            if proc.returncode != 0:
                raise RuntimeError(f"worker failed (n={nproc}):\n{log[-3000:]}")
    except BaseException:
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
        for proc in procs:
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass
        raise
    recs = [json.load(open(o)) for o in outs]
    reads = sum(r["num_reads"] for r in recs)
    windows = sum(r["num_windows"] for r in recs)
    # the collective executes in lockstep on every process; the overhead
    # a host pays is its own stage time (startup skew means early
    # finishers wait inside the collective — report max as worst case)
    merges = [r["stage_seconds"].get("cross_process_merge", 0.0) for r in recs]
    walls = [r["wall_s"] for r in recs]
    return {
        "nproc": nproc,
        "cluster_wall_s": round(wall, 2),
        "engine_wall_s_max": round(max(walls), 2),
        "reads_total": reads,
        "windows_total": windows,
        "reads_per_s": round(reads / max(walls), 2),
        "windows_per_s": round(windows / max(walls), 1),
        "merge_s_max": round(max(merges), 3),
        "merge_s_min": round(min(merges), 3),
        "merge_frac_of_wall": round(max(merges) / max(walls), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=120)
    ap.add_argument("--genome-bp", type=int, default=200_000)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--workdir", default="/tmp/dmt_scale_mp")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    dataset = os.path.join(
        args.workdir, f"ds_r{args.reads}_g{args.genome_bp}"
    )
    if not os.path.isdir(os.path.join(dataset, "fast5")):
        # generate in a CPU-pinned child so this parent never imports jax
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset;"
            f"generate_dataset({dataset!r}, SynthConfig("
            f"genome_sizes={{'chrM': {args.genome_bp}}}, num_reads={args.reads},"
            "read_length=(2000, 5000), seed=17, mod_motif='CG',"
            "mod_level_shift=1.2))"
        )
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run(
            [sys.executable, "-c", code], cwd=REPO, env=env, check=True
        )

    rows = []
    for nproc in (1, 2, 3):
        print(f"running {nproc}-process cluster...", file=sys.stderr,
              flush=True)
        rows.append(run_cluster(nproc, dataset, args.workdir, args.timeout))
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["windows_per_s"]
    summary = {
        "metric": "detect_multiproc_merge_overhead",
        "rows": rows,
        "note": (
            "2-core shared VM: processes time-slice the same silicon, so "
            "absolute reads/s cannot scale here; merge_frac_of_wall is "
            "the scaling-relevant communication cost"
        ),
        "throughput_vs_1proc": [
            round(r["windows_per_s"] / base, 3) for r in rows
        ],
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    main()
