#!/usr/bin/env python
"""Perf probe: merged [x; h] gate GEMM vs the two-dot mono kernel.

Each LSTM cell step in the mono kernel issues TWO
(tile_b, 128) @ (128, 512) MXU dots; the merged variant assembles
[x_t; h] in VMEM scratch and issues ONE (tile_b, 256) @ (256, 512) dot —
half the MXU dispatches at identical FLOPs, paid for with two VPU stores
per step. A/B in the same process (absolute rates on this tunneled chip
drift between runs; see CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center_mono

ITERS = 16


def timed(fn, batch):
    acc = jnp.zeros((batch,), jnp.int32)
    acc = acc + fn()
    np.asarray(jnp.sum(acc))  # compile + warm
    acc = jnp.zeros((batch,), jnp.int32)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = acc + fn()
    np.asarray(jnp.sum(acc))
    dt = time.perf_counter() - t0
    return batch * ITERS / dt


def main():
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = jax.device_put(init_bilstm_params(jax.random.PRNGKey(0), config))
    batch = 131072
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32)

    def make(tile_b, precision, merged):
        return jax.jit(lambda: jnp.argmax(
            jnp.dot(
                bilstm_fused_center_mono(
                    params, x, tile_b=tile_b, precision=precision,
                    merged_gemm=merged,
                ),
                params["out_w"], preferred_element_type=jnp.float32,
            ) + params["out_b"], axis=-1).astype(jnp.int32))

    for precision in ("bf16", "fp32"):
        tiles = (256, 384, 512) if precision == "bf16" else (128, 256)
        for tile_b in tiles:
            row = [f"{precision} tile_b={tile_b}:"]
            for merged in (False, True):
                try:
                    r = timed(make(tile_b, precision, merged), batch)
                    row.append(
                        f"{'merged' if merged else 'twodot'}={r/1e6:.2f}M/s"
                    )
                except Exception as exc:
                    row.append(
                        f"{'merged' if merged else 'twodot'}="
                        f"FAIL({type(exc).__name__}:{str(exc)[:80]})"
                    )
            print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
