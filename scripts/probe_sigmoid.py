#!/usr/bin/env python
"""Perf probe: sigmoid-via-tanh inside the fused kernel + bigger batch.

The fused kernel is VPU-transcendental-bound (docs/Validation.md). If
the backend lowers logistic() to exp+divide, rewriting the four gate
sigmoids as 0.5*tanh(0.5x)+0.5 trades them for tanh (one transcendental,
no divide). Numerically |delta| <= a few ulps — far below the measured
logit margins — but this probe only measures speed; adoption would gate
on a fresh argmax-flip count.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 16


def main():
    # patch BEFORE importing the kernel module so its traced body uses it
    if os.environ.get("PROBE_TANH_SIGMOID", "0") == "1":
        orig_tanh = jnp.tanh
        jax.nn.sigmoid = lambda x: 0.5 * orig_tanh(0.5 * x) + 0.5
        tag = "tanh-sigmoid"
    else:
        tag = "exp-sigmoid"

    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center

    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = jax.device_put(init_bilstm_params(jax.random.PRNGKey(0), config))

    for batch in (65536, 131072):
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32)
        fn = jax.jit(lambda p, xb: jnp.argmax(
            jnp.dot(
                bilstm_fused_center(p, xb, precision="bf16"),
                p["out_w"], preferred_element_type=jnp.float32,
            ) + p["out_b"], axis=-1))
        acc = jnp.zeros((batch,), jnp.int32)
        acc = acc + fn(params, x).astype(jnp.int32)
        np.asarray(jnp.sum(acc))
        acc = jnp.zeros((batch,), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            acc = acc + fn(params, x).astype(jnp.int32)
        np.asarray(jnp.sum(acc))
        dt = time.perf_counter() - t0
        print(f"{tag} b{batch}: {batch*ITERS/dt/1e6:.3f}M windows/s", flush=True)


if __name__ == "__main__":
    main()
