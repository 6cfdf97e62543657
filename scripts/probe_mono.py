#!/usr/bin/env python
"""Perf probe: mono-kernel (whole BiLSTM stack in ONE pallas_call,
inter-layer sequences VMEM-resident) vs the per-layer fused kernel.

Chained on-device timing (see bench.py docstring for why). A/B in the
same process — absolute rates on this tunneled chip drift between runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
from deepmod_tpu.ops.bilstm_fused import (
    bilstm_fused_center,
    bilstm_fused_center_mono,
)

ITERS = 16


def timed(fn, acc0, combine, n_items):
    acc = combine(acc0, fn())
    np.asarray(jnp.sum(acc))
    acc = acc0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = combine(acc, fn())
    np.asarray(jnp.sum(acc))
    dt = time.perf_counter() - t0
    return n_items * ITERS / dt


def main():
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = jax.device_put(init_bilstm_params(jax.random.PRNGKey(0), config))
    batch = 131072
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32)

    def make(center_fn, tile_b, precision):
        return jax.jit(lambda p, xb: jnp.argmax(
            jnp.dot(
                center_fn(p, xb, tile_b=tile_b, precision=precision),
                p["out_w"], preferred_element_type=jnp.float32,
            ) + p["out_b"], axis=-1))

    for precision in ("bf16", "fp32"):
        tiles = (256, 384, 512) if precision == "bf16" else (128, 256)
        for name, center_fn in (("layered", bilstm_fused_center),
                                ("mono   ", bilstm_fused_center_mono)):
            for tile_b in tiles:
                fn = make(center_fn, tile_b, precision)
                try:
                    r = timed(lambda: fn(params, x).astype(jnp.int32),
                              jnp.zeros((batch,), jnp.int32),
                              lambda a, b: a + b, batch)
                    print(f"{precision} {name} tile_b={tile_b}: "
                          f"{r/1e6:.3f}M windows/s", flush=True)
                except Exception as e:
                    print(f"{precision} {name} tile_b={tile_b}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
