#!/usr/bin/env python
"""Isolated host-pipeline throughput: fast5 -> align -> features, one
thread, warm caches. Prints one JSON line per profile.

This is the HONEST per-thread number: the stage timers inside detect
UNDERSTATE host cost because the prefetch thread overlaps it with device
time. Production sizing: chip rate (bench.py) / this number = host
threads needed to saturate one chip.

Usage: python scripts/bench_host.py [--repeats 3]
"""
import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROFILES = {
    # ~2.1k events/read: per-file costs (HDF5 open) weigh heavier
    "short_reads": dict(
        genome_sizes={"chrS": 50000}, num_reads=120,
        read_length=(1500, 3000), seed=11,
    ),
    # ~7k events/read: HDF5/decompress-bound steady state
    "long_reads": dict(
        genome_sizes={"chrS": 120000}, num_reads=60,
        read_length=(5000, 10000), seed=11,
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from deepmod_tpu.engine import host_worker
    from deepmod_tpu.engine.detect import DetectConfig, _host_options
    from deepmod_tpu.testing import generate_dataset
    from deepmod_tpu.testing.synthetic import SynthConfig

    for name, profile in PROFILES.items():
        work = tempfile.mkdtemp(prefix="dmt_bench_host_")
        try:
            generate_dataset(work, SynthConfig(**profile))
            cfg = DetectConfig(
                wrk_base=os.path.join(work, "fast5"),
                ref=os.path.join(work, "ref.fa"),
                model_path="unused", out_folder="unused",
                file_id="mod", base="C",
            )
            host_worker.init_worker(_host_options(cfg))
            files = sorted(glob.glob(
                os.path.join(work, "fast5", "**", "*.fast5"), recursive=True
            ))
            host_worker.host_process_files(files[: max(4, len(files) // 20)])
            best = 0.0
            windows = 0
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                results, _errs = host_worker.host_process_files(files)
                dt = time.perf_counter() - t0
                windows = sum(r.n_aligned for r in results)
                best = max(best, windows / dt)
            print(json.dumps({
                "metric": f"host_windows_per_s_{name}",
                "value": round(best, 1),
                "unit": "windows/s/thread",
                "windows": windows,
                "files": len(files),
            }))
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
