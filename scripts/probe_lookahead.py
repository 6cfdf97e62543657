#!/usr/bin/env python
"""Same-process sweep of the async chunk-queue depth (_LOOKAHEAD) through
the compact predictor: on the tunneled chip each result fetch pays ~36 ms
RTT, so a deeper queue can hide more per-call latency once transfer
bandwidth stops being the constraint. Prints one JSON line per (depth,
pass) and a summary.

Usage: python scripts/probe_lookahead.py [--rows N] [--passes 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--depths", default="2,4,8")
    args = ap.parse_args()

    import jax
    import numpy as np

    import deepmod_tpu.engine.detect as D
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    on_tpu = jax.default_backend() == "tpu"
    rows = args.rows if on_tpu else 65536
    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), config)
    bucket = 262144 if on_tpu else 16384

    rng = np.random.RandomState(1)
    feats = np.zeros((rows, 7), np.float32)
    hot = rng.randint(0, 5, rows)
    for b in range(4):
        feats[hot == b, b] = 1.0
    feats[:, 4] = (rng.randn(rows) * 2).round(3)
    feats[:, 5] = np.abs(rng.randn(rows) * 2).round(3)
    feats[:, 6] = rng.randint(4, 40, rows)
    centers = np.arange(16, rows - 16, dtype=np.int64)

    pred = D.WindowPredictor(
        params, config, buckets=(bucket,),
        precision="bf16" if on_tpu else "fp32",
        compact_transfer=True, data_parallel=False,
    )
    pred.predict_from_features(feats, centers)  # warm compile

    depths = [int(x) for x in args.depths.split(",")]
    best = {}
    for _ in range(args.passes):
        for depth in depths:
            D._LOOKAHEAD = depth
            t0 = time.perf_counter()
            pred.predict_from_features(feats, centers)
            dt = time.perf_counter() - t0
            best[depth] = min(best.get(depth, 1e9), dt)
            print(json.dumps({
                "depth": depth, "wall_s": round(dt, 3),
                "windows_per_s": round(len(centers) / dt, 1),
            }), flush=True)
    print(json.dumps({
        "metric": "lookahead_best_walls",
        "value": {str(k): round(v, 3) for k, v in sorted(best.items())},
        "rows": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
