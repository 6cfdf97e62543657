#!/usr/bin/env python
"""Serving-path latency: warm DetectService request round trips.

The serving deployment shape (serve.py: model + aligner index loaded
once, jitted predictor kept warm) answers per-request detect calls; this
probe measures the steady-state request latency for small request sizes
— the metric a serving user cares about, complementing bench.py's batch
throughput. In-process service calls (the HTTP layer adds ~1 ms stdlib
overhead and is covered by tests/test_serve.py).

Usage: python scripts/probe_serve_latency.py [--requests 5]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=5)
    args = ap.parse_args()

    import glob
    import shutil

    import jax

    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import save_bilstm_npz
    from deepmod_tpu.serve import DetectService
    from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

    work = tempfile.mkdtemp(prefix="dmt_serve_probe_")
    try:
        generate_dataset(work, SynthConfig(
            num_reads=16, read_length=(5000, 10000),
            genome_sizes={"chrS": 100_000}, seed=7,
        ))
        config = BiLSTMConfig(num_input=7)
        model = os.path.join(work, "m.npz")
        save_bilstm_npz(
            model, init_bilstm_params(jax.random.PRNGKey(0), config), config
        )
        t0 = time.perf_counter()
        svc = DetectService(
            ref=os.path.join(work, "ref.fa"), model_path=model,
            precision="bf16" if jax.default_backend() == "tpu" else "fp32",
        )
        startup_s = time.perf_counter() - t0
        files = sorted(glob.glob(os.path.join(work, "fast5", "**", "*.fast5"),
                                 recursive=True))
        rows = []
        for size in (1, 4, 8):
            batch = files[:size]
            svc.detect(batch)  # warm (compiles off the clock)
            lat = []
            windows = 0
            for _ in range(args.requests):
                t0 = time.perf_counter()
                out = svc.detect(batch)
                lat.append(time.perf_counter() - t0)
                windows = sum(r["n_aligned"] for r in out["reads"])
            lat.sort()
            rows.append({
                "reads_per_request": size,
                "windows": windows,
                "p50_ms": round(1e3 * lat[len(lat) // 2], 1),
                "best_ms": round(1e3 * lat[0], 1),
            })
            print(json.dumps(rows[-1]), flush=True)

        # concurrent clients: N threads each sending one 1-read request
        # at once; the device-stage coalescer should keep p50 growing
        # sub-linearly vs the serial single-request latency (VERDICT r4
        # #7 — a single-flight service would be ~N x)
        import threading

        conc_rows = []
        serial_p50 = rows[0]["p50_ms"]
        for n_clients, coalesce in ((2, True), (4, True), (8, True),
                                    (8, False), (8, True)):
            # same-process A/B: 8 clients with the coalescer forced to
            # single-flight, bracketed by coalesced runs (tunnel drift
            # makes cross-process comparisons meaningless)
            os.environ["DMT_SERVE_COALESCE"] = "1" if coalesce else "0"
            batch_files = (files * ((n_clients // len(files)) + 1))[:n_clients]
            for _ in range(2):  # warm
                svc.detect(batch_files[:1])
            lats = []
            for _rep in range(args.requests):
                per = [None] * n_clients
                barrier = threading.Barrier(n_clients)

                def hit(i, path):
                    barrier.wait()
                    t0 = time.perf_counter()
                    svc.detect([path])
                    per[i] = time.perf_counter() - t0

                threads = [
                    threading.Thread(target=hit, args=(i, p))
                    for i, p in enumerate(batch_files)
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                lats.extend(per)
            lats.sort()
            row = {
                "concurrent_clients": n_clients,
                "coalesce": coalesce,
                "p50_ms": round(1e3 * lats[len(lats) // 2], 1),
                "p90_ms": round(1e3 * lats[int(len(lats) * 0.9)], 1),
                "vs_serial_p50": round(
                    1e3 * lats[len(lats) // 2] / serial_p50, 2
                ),
            }
            conc_rows.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({
            "metric": "serve_request_latency",
            "backend": jax.default_backend(),
            "service_startup_s": round(startup_s, 2),
            "rows": rows,
            "concurrent": conc_rows,
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
