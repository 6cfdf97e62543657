#!/usr/bin/env python
"""Perf probe: precomputed input projections (cuDNN-style) vs two-dot.

The pregemm mono variant projects every timestep's input per layer/lane
in ONE (out_steps*tile_b, LANE) @ (LANE, GATES) GEMM into a VMEM gate
buffer, leaving a single h-dot per recurrence step — half the per-step
MXU dispatches and a large-GEMM x-projection, paid with one store + one
load of the (tile_b, GATES) gate row per step. gate_store='bf16' halves
that scratch traffic (rounds the precomputed gates). A/B in the same
process (absolute rates on this tunneled chip drift between runs; see
CLAUDE.md).
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

    def make(tile_b, precision, pregemm, gate_store="fp32"):
        return jax.jit(lambda: jnp.argmax(
            jnp.dot(
                bilstm_fused_center_mono(
                    params, x, tile_b=tile_b, precision=precision,
                    pregemm=pregemm, gate_store=gate_store,
                ),
                params["out_w"], preferred_element_type=jnp.float32,
            ) + params["out_b"], axis=-1).astype(jnp.int32))

    cases = [
        # (precision, tile_b, [variants: (label, pregemm, gate_store)])
        ("bf16", 256, [("twodot", False, "fp32"),
                       ("pre-f32", True, "fp32"),
                       ("pre-bf16", True, "bf16")]),
        ("bf16", 384, [("twodot", False, "fp32"),
                       ("pre-bf16", True, "bf16")]),
        ("fp32", 128, [("twodot", False, "fp32"),
                       ("pre-f32", True, "fp32")]),
    ]
    for precision, tile_b, variants in cases:
        row = [f"{precision} tile_b={tile_b}:"]
        for label, pregemm, gate_store in variants:
            try:
                r = timed(make(tile_b, precision, pregemm, gate_store), batch)
                row.append(f"{label}={r/1e6:.2f}M/s")
            except Exception as exc:
                row.append(f"{label}=FAIL({type(exc).__name__}:{str(exc)[:80]})")
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
