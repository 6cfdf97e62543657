#!/usr/bin/env python
"""Same-process A/B/C of --targetOnly under the compact-transfer era.

VERDICT r3 weak #2: targetOnly's rationale ("~4x less device work/
transfer") predates compact transfer, which classifies every built row
regardless of selection. This probe measures the three modes on the 30x
cohort in ONE process (absolute rates on this VM are only comparable
same-process):

  A standard        — compact transfer, classify everything (the default)
  B targetOnly      — compact transfer; dense C selection (~25%), so the
                      predictor stays on the compact path (auto-routing
                      to window transfer needs density < 1/window)
  C targetOnly+win  — compact transfer DISABLED: materialized windows
                      for only the selected centers (the round-2 era
                      behavior the flag's docs described)

Expected on a transfer-bound link: A ~= B (same bytes move), C slower
(21x bytes per selected window at 25% density = 5.25x total). BEDs must
be byte-identical across all three.

Usage: python scripts/probe_target_only.py [--dataset /tmp/dmt_scale30x]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/tmp/dmt_scale30x")
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    import jax

    from deepmod_tpu.engine.detect import (
        DetectConfig, WindowPredictor, _host_options, detect_run,
    )
    from deepmod_tpu.engine.host_pool import HostPool
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    ds = args.dataset
    mc = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), mc)
    compact = WindowPredictor(params, mc, precision="bf16")
    windowed = WindowPredictor(
        params, mc, precision="bf16", compact_transfer=False
    )
    cfg = DetectConfig(
        wrk_base=os.path.join(ds, "fast5"),
        ref=os.path.join(ds, "ref.fa"),
        model_path="unused",
        out_folder=os.path.join(ds, "out_probe"),
        file_id="mod", base="C",
        threads=args.threads, files_per_batch=250,
    )
    pool = HostPool(args.threads, _host_options(cfg))
    modes = [
        ("A_standard_compact", compact, {}),
        ("B_targetonly_compact", compact, dict(target_only=True)),
        ("C_targetonly_window", windowed, dict(target_only=True)),
    ]
    try:
        # warm-up pass (compiles + page cache) — not recorded
        detect_run(dataclasses.replace(
            cfg, out_folder=os.path.join(ds, "out_probe_warm")
        ), compact, host_pool=pool)
        results = {}
        for tag, predictor, overrides in modes:
            run_cfg = dataclasses.replace(
                cfg, out_folder=os.path.join(ds, f"out_probe_{tag}"),
                **overrides,
            )
            t0 = time.time()
            r = detect_run(run_cfg, predictor, host_pool=pool)
            dt = time.time() - t0
            results[tag] = {
                "wall_s": round(dt, 1),
                "windows_per_s": round(r.num_windows / dt, 1),
                "stages": {k: round(v, 1)
                           for k, v in sorted(r.stage_seconds.items())},
                "beds": sorted(os.path.basename(b) for b in r.bed_files),
            }
            print(json.dumps({tag: results[tag]}), flush=True)
        # BED identity across modes
        import hashlib

        def bed_md5(tag):
            out = {}
            folder = os.path.join(ds, f"out_probe_{tag}")
            for b in results[tag]["beds"]:
                with open(os.path.join(folder, b), "rb") as fh:
                    out[b] = hashlib.md5(fh.read()).hexdigest()
            return out

        md5s = {tag: bed_md5(tag) for tag, _, _ in modes}
        identical = md5s["A_standard_compact"] == md5s[
            "B_targetonly_compact"] == md5s["C_targetonly_window"]
        print(json.dumps({"beds_identical": identical, "md5": md5s}),
              flush=True)
    finally:
        pool.close()


if __name__ == "__main__":
    main()
