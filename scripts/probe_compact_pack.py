#!/usr/bin/env python
"""Same-process A/B: packed (uint8 code + bf16 numerics, 7 B/row) vs
unpacked (bf16, 14 B/row) compact transfer through the real predictor.

Alternates modes within ONE process so tunnel-bandwidth drift cancels;
prints one JSON line per pass plus a summary. The packed path must also
be prediction-identical to the unpacked one on the same block (checked).

Usage: python scripts/probe_compact_pack.py [--rows 4194304] [--passes 3]
                                             [--fnum 7|57]

--fnum 57 measures the histogram-column uint8 ride-along (57 B/row vs
114 in bf16; round-5 pack) instead of the one-hot code pack.
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
    ap.add_argument("--fnum", type=int, default=7, choices=(7, 57))
    args = ap.parse_args()

    import jax
    import numpy as np

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    on_tpu = jax.default_backend() == "tpu"
    rows = args.rows if on_tpu else 65536
    if args.fnum == 57:
        rows = min(rows, 2 * 1024 * 1024)  # 57-wide rows: bound memory
    config = BiLSTMConfig(num_input=args.fnum)
    params = init_bilstm_params(jax.random.PRNGKey(0), config)
    precision = "bf16" if on_tpu else "fp32"
    bucket = 262144 if on_tpu else 16384

    rng = np.random.RandomState(1)
    feats = np.zeros((rows, args.fnum), np.float32)
    hot = rng.randint(0, 5, rows)
    onehot0 = args.fnum - 7  # one-hot cols: 0..3 (fnum 7) / 50..53 (57)
    for b in range(4):
        feats[hot == b, onehot0 + b] = 1.0
    if args.fnum == 57:
        feats[:, :50] = rng.randint(0, 40, (rows, 50))
    feats[:, onehot0 + 4] = (rng.randn(rows) * 2).round(3)
    feats[:, onehot0 + 5] = np.abs(rng.randn(rows) * 2).round(3)
    feats[:, onehot0 + 6] = rng.randint(4, 40, rows)
    centers = np.arange(16, rows - 16, dtype=np.int64)

    if args.fnum == 57:
        os.environ["DMT_COMPACT_PACK57"] = "1"
    packed = WindowPredictor(
        params, config, buckets=(bucket,), precision=precision,
        compact_transfer=True, data_parallel=False,
    )
    os.environ["DMT_COMPACT_PACK"] = "0"
    os.environ.pop("DMT_COMPACT_PACK57", None)
    plain = WindowPredictor(
        params, config, buckets=(bucket,), precision=precision,
        compact_transfer=True, data_parallel=False,
    )
    del os.environ["DMT_COMPACT_PACK"]
    if args.fnum == 57:
        assert packed._pack_hist and not plain._pack_hist
    else:
        assert packed._pack_onehot and not plain._pack_onehot

    # warm both compiles + parity check
    a = packed.predict_from_features(feats, centers)
    b = plain.predict_from_features(feats, centers)
    assert np.array_equal(a, b), "packed/unpacked prediction mismatch"

    results = {"packed": [], "plain": []}
    for _ in range(args.passes):
        for name, pred in (("plain", plain), ("packed", packed)):
            t0 = time.perf_counter()
            pred.predict_from_features(feats, centers)
            dt = time.perf_counter() - t0
            results[name].append(dt)
            print(json.dumps({
                "mode": name, "wall_s": round(dt, 3),
                "windows_per_s": round(len(centers) / dt, 1),
            }), flush=True)
    best = {k: min(v) for k, v in results.items()}
    print(json.dumps({
        "metric": "compact_pack_speedup",
        "value": round(best["plain"] / best["packed"], 3),
        "unit": "x (plain_best / packed_best)",
        "best_plain_s": round(best["plain"], 3),
        "best_packed_s": round(best["packed"], 3),
        "rows": rows, "fnum": args.fnum, "identical": True,
    }), flush=True)


if __name__ == "__main__":
    main()
