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

    batch_sizes = (65536, 131072) if backend == "tpu" else (4096,)
    # (use_pallas, precision) variants; pallas+bf16 is the fastest
    # supported production mode, pallas+fp32 is bit-compatible with the
    # XLA path
    variants = [(False, "fp32")]
    if backend == "tpu":
        variants += [(True, "fp32"), (True, "bf16")]

    best = 0.0
    best_tag = ""
    for attempt in range(2):
      for use_pallas, precision in variants:
        fn = jax.jit(
            lambda p, x, up=use_pallas, pr=precision: bilstm_predict(
                p, x, config, use_pallas=up, precision=pr
            )
        )
        for batch in batch_sizes:
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
                    f"b{batch} failed: {type(exc).__name__}: "
                    f"{str(exc)[:200]}",
                    file=sys.stderr,
                )
                continue
            if rate > best:
                best = rate
                best_tag = (
                    f"{'pallas' if use_pallas else 'xla'}-{precision}-b{batch}"
                )
      if best > 0:
          break
      time.sleep(30)  # transient backend trouble: one retry

    print(
        json.dumps(
            {
                "metric": "bilstm_windows_per_s",
                "value": round(best, 1),
                "unit": "windows/s",
                "vs_baseline": round(best / BASELINE_WINDOWS_PER_S, 2),
                "config": best_tag,
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
