#!/usr/bin/env python
"""Same-process A/B: host bincount vs on-device sharded_position_counts.

Decides DetectConfig.device_aggregation's default with data (VERDICT r2
weak #3). Per detect batch the engine must turn (position, covered, mod)
observation triples into dense per-(chr,strand) count vectors; the two
candidate implementations are

  host:   np.bincount accumulation into the numpy vectors (what
          PositionCounts.add_base_map amounts to), zero device traffic
  device: scatter-add per local shard + psum over the mesh
          (parallel.aggregation.sharded_position_counts), then one
          device->host fetch of the two length-L vectors

Interleaved A/B in ONE process (this VM's absolute timings swing 1.4x
between runs; only same-process comparisons are valid — CLAUDE.md).

Usage: python scripts/probe_device_agg.py [--cpu-mesh 8] [--reps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force CPU backend with N virtual devices")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.cpu_mesh} "
            + os.environ.get("XLA_FLAGS", "")
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np

    from jax.sharding import Mesh
    from deepmod_tpu.parallel.aggregation import sharded_position_counts

    mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)

    # (observations per batch, chromosome length): a 1000-file detect
    # batch carries ~1-5M target-base observations; E. coli chr = 4.6 Mbp,
    # synthetic bench chr = 1 Mbp
    cases = [(100_000, 1_000_000), (1_000_000, 1_000_000),
             (1_000_000, 4_600_000), (4_000_000, 4_600_000)]
    rows = []
    for n_obs, length in cases:
        n_pad = n_obs + ((-n_obs) % n_dev)
        pos = rng.integers(0, length, n_pad).astype(np.int64)
        mod = (rng.random(n_pad) < 0.3).astype(np.int64)
        covered = np.ones(n_pad, np.int64)

        host_cov = np.zeros(length, np.int64)
        host_mod = np.zeros(length, np.int64)
        dev_cov = np.zeros(length, np.int64)
        dev_mod = np.zeros(length, np.int64)

        # warm compiles off the clock
        c, m = sharded_position_counts(mesh, pos, covered, mod, length)
        np.asarray(c), np.asarray(m)

        t_host = []
        t_dev = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            host_cov += np.bincount(pos, weights=covered,
                                    minlength=length).astype(np.int64)
            host_mod += np.bincount(pos, weights=mod,
                                    minlength=length).astype(np.int64)
            t_host.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            c, m = sharded_position_counts(mesh, pos, covered, mod, length)
            dev_cov += np.asarray(c)
            dev_mod += np.asarray(m)
            t_dev.append(time.perf_counter() - t0)

        assert np.array_equal(host_cov, dev_cov)
        assert np.array_equal(host_mod, dev_mod)
        rows.append({
            "n_obs": n_obs,
            "chrom_len": length,
            "host_ms": round(1e3 * float(np.median(t_host)), 2),
            "device_ms": round(1e3 * float(np.median(t_dev)), 2),
            "device_over_host": round(
                float(np.median(t_dev)) / float(np.median(t_host)), 2
            ),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({
        "metric": "device_aggregation_ab",
        "backend": jax.default_backend(),
        "devices": n_dev,
        "rows": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
