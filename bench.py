#!/usr/bin/env python
"""Benchmark: BiLSTM modification-classifier inference throughput.

Prints ONE JSON line:
  {"metric": "bilstm_windows_per_s", "value": N, "unit": "windows/s",
   "vs_baseline": R}

The model is the production configuration (3x2 LSTM layers, hidden 100,
21x7 windows — myMultiBiRNN.py:21-91 semantics) and the measured path is
exactly what deepmod_tpu.engine.detect runs per window batch.

Timing method: the execution results are CHAINED (each iteration's
predictions feed an on-device accumulator) and a single device-to-host
transfer ends the run. On this environment's tunneled TPU platform,
``block_until_ready`` returns before execution finishes and a per-call
host sync pays a ~36 ms round trip, so naive timing is wrong in both
directions; chaining measures true sustained device throughput.

Baseline derivation (the reference publishes wall-times, not throughput):
docs/Reproducibility.md:26,30 reports ~41 min for the E. coli meth10_lib3
(SSS) 5mC detect on 15 CPU threads. A ~30X E. coli run covers ~4.6 Mbp x
30 = 1.4e8 aligned events == windows, giving ~5.7e4 windows/s end-to-end
on 15 threads.
"""

import json
import time

import numpy as np

BASELINE_WINDOWS_PER_S = 5.7e4  # reference, 15 CPU threads (see docstring)

ITERS = 16

# peak dense-matmul throughput by device kind (bf16, FLOP/s); used for
# the MFU fields. Sources: public TPU spec sheets.
PEAK_BF16 = {
    "v4": 275e12,
    "v5e": 197e12, "v5 lite": 197e12, "v5litepod": 197e12,
    "v5p": 459e12,
    "v6e": 918e12, "trillium": 918e12,
}


def _peak_for(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in sorted(PEAK_BF16.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return peak
    return None


def model_flops_per_window(
    fnum: int = 7, hidden: int = 100, timesteps: int = 21, layers: int = 3
) -> tuple:
    """(useful, padded) matmul FLOPs per window for the production kernel.

    Useful counts the model's actual gate GEMMs over the readout cone
    (T//2+1 steps per lane per layer — all the center logit needs);
    padded counts what the MXU executes at the kernel's LANE=128 /
    GATES=512 padding. Elementwise/transcendental work excluded.
    """
    steps = timesteps // 2 + 1
    gates = 4 * hidden
    useful = 0
    padded = 0
    for layer in range(layers):
        cur_in = fnum if layer == 0 else hidden
        useful += 2 * (cur_in + hidden) * gates * steps * 2  # 2 lanes
        padded += 2 * (128 + 128) * 512 * steps * 2
    useful += 2 * (2 * hidden) * 2  # output matmul (200, 2)
    return useful, padded


def measure(fn, params, x, batch: int) -> float:
    """Sustained windows/s via chained on-device accumulation."""
    import jax.numpy as jnp

    acc = jnp.zeros((batch,), jnp.int32)
    # warmup + compile (also warms the accumulate op)
    acc = acc + fn(params, x).astype(jnp.int32)
    np.asarray(jnp.sum(acc))
    acc = jnp.zeros((batch,), jnp.int32)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = acc + fn(params, x).astype(jnp.int32)
    np.asarray(jnp.sum(acc))  # single sync
    dt = time.perf_counter() - t0
    return batch * ITERS / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepmod_tpu.models.bilstm import (
        BiLSTMConfig,
        bilstm_predict,
        init_bilstm_params,
    )

    backend = jax.default_backend()
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = jax.device_put(init_bilstm_params(jax.random.PRNGKey(0), config))

    batch_sizes = (65536, 131072, 262144) if backend == "tpu" else (4096,)
    # (use_pallas, precision, tile_b) variants; pallas+bf16 is the
    # fastest supported production mode, pallas+fp32 is bit-compatible
    # with the XLA path. bf16 runs BOTH batch tiles because 256 vs 384
    # flip ordering with tunnel load (docs/Validation.md) — the bench
    # reports whichever wins right now.
    variants = [(False, "fp32", None)]
    if backend == "tpu":
        variants += [(True, "fp32", None), (True, "bf16", None),
                     (True, "bf16", 256)]

    best = 0.0
    best_tag = ""
    for attempt in range(2):
      for use_pallas, precision, tile_b in variants:
        fn = jax.jit(
            lambda p, x, up=use_pallas, pr=precision, tb=tile_b: (
                bilstm_predict(
                    p, x, config, use_pallas=up, precision=pr, tile_b=tb
                )
            )
        )
        for batch in batch_sizes:
            if not use_pallas and batch > 131072:
                continue  # the scan floor-reference gains nothing from
                #           the big batch; skip its slow fresh compile
            x = jax.random.normal(
                jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32
            )
            try:
                rate = measure(fn, params, x, batch)
            except Exception as exc:
                # keep stdout to the one JSON line, but never hide a
                # failing variant (a VMEM OOM hid here once)
                import sys

                print(
                    f"bench variant pallas={use_pallas} {precision} "
                    f"b{batch} tile={tile_b} failed: {type(exc).__name__}: "
                    f"{str(exc)[:200]}",
                    file=sys.stderr,
                )
                continue
            if rate > best:
                best = rate
                best_tag = (
                    f"{'pallas' if use_pallas else 'xla'}-{precision}-b{batch}"
                    + (f"-t{tile_b}" if tile_b else "")
                )
      if best > 0:
          break
      time.sleep(30)  # transient backend trouble: one retry

    useful_fpw, padded_fpw = model_flops_per_window()
    peak = _peak_for(jax.devices()[0]) if backend == "tpu" else None
    # the FLOP model (readout-cone steps, LANE/GATES padding) describes
    # the Pallas kernel; if an XLA variant won (e.g. both Pallas modes
    # failed to compile), utilization numbers would be fabricated — omit.
    if not best_tag.startswith("pallas"):
        peak = None
    mfu = round(best * useful_fpw / peak, 4) if peak else None
    mxu_util = round(best * padded_fpw / peak, 4) if peak else None

    # warm end-to-end pipeline rate (fast5 -> align -> features -> device
    # classify -> HDF5 + BED) on a small synthetic set; the kernel number
    # above is device-only. On THIS machine the tunnel RTT dominates e2e
    # (see scripts/bench_e2e.py docstring).
    e2e_windows = e2e_reads = None
    try:
        e2e_windows, e2e_reads = _measure_e2e()
    except Exception as exc:
        import sys

        print(f"bench e2e failed: {type(exc).__name__}: {str(exc)[:200]}",
              file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bilstm_windows_per_s",
                "value": round(best, 1),
                "unit": "windows/s",
                "vs_baseline": round(best / BASELINE_WINDOWS_PER_S, 2),
                "config": best_tag,
                "backend": backend,
                "device_kind": getattr(
                    jax.devices()[0], "device_kind", "unknown"
                ),
                "mfu": mfu,                 # useful model FLOPs / peak bf16
                "mxu_util": mxu_util,       # padded kernel FLOPs / peak bf16
                "model_flops_per_window": useful_fpw,
                "padded_flops_per_window": padded_fpw,
                "e2e_windows_per_s": e2e_windows,
                "e2e_reads_per_s": e2e_reads,
            }
        )
    )


def _measure_e2e(reads: int = 40):
    """Warm end-to-end detect rate on a synthetic dataset (one cold pass
    for compiles, one timed warm pass). Returns (windows/s, reads/s)."""
    import dataclasses
    import shutil
    import tempfile

    import jax

    from deepmod_tpu.engine.detect import (
        DetectConfig,
        WindowPredictor,
        detect_run,
    )
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

    work = tempfile.mkdtemp(prefix="dmt_bench_e2e_")
    try:
        generate_dataset(work, SynthConfig(num_reads=reads, seed=11))
        model_config = BiLSTMConfig(num_input=7)
        params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
        import os

        predictor = WindowPredictor(
            params, model_config,
            precision="bf16" if jax.default_backend() == "tpu" else "fp32",
        )
        config = DetectConfig(
            wrk_base=os.path.join(work, "fast5"),
            ref=os.path.join(work, "ref.fa"),
            model_path="unused",
            out_folder=os.path.join(work, "out_warm"),
            file_id="mod",
            base="C",
            threads=1,
        )
        detect_run(
            dataclasses.replace(
                config, out_folder=os.path.join(work, "out_cold")
            ),
            predictor,
        )
        t0 = time.perf_counter()
        result = detect_run(config, predictor)
        dt = time.perf_counter() - t0
        return (
            round(result.num_windows / dt, 1),
            round(result.num_reads / dt, 2),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
