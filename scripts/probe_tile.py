#!/usr/bin/env python
"""Perf probe: fused-kernel tile_b sweep + fused-VJP train step rate.

Chained on-device timing (see bench.py docstring for why).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig, bilstm_predict, init_bilstm_params, bilstm_logits_trainable,
    CLASS_WEIGHTS,
)
from deepmod_tpu.ops.bilstm_fused import bilstm_fused_center

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
    batch = 65536
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32)

    for tile_b in (128, 256, 512):
        fn = jax.jit(lambda p, xb, tb=tile_b: jnp.argmax(
            jnp.dot(
                # mono=False: this sweep historically measures the
                # LAYERED kernel tiles (the mono default is probed in
                # probe_mono/probe_pregemm)
                bilstm_fused_center(p, xb, tile_b=tb, precision="bf16",
                                    mono=False),
                p["out_w"], preferred_element_type=jnp.float32,
            ) + p["out_b"], axis=-1))
        try:
            r = timed(lambda: fn(params, x).astype(jnp.int32),
                      jnp.zeros((batch,), jnp.int32), lambda a, b: a + b, batch)
            print(f"infer bf16 tile_b={tile_b}: {r/1e6:.3f}M windows/s", flush=True)
        except Exception as e:
            print(f"infer bf16 tile_b={tile_b}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # train step (fused VJP), batch 2048, production loss
    bt = 2048
    xt = jax.random.normal(jax.random.PRNGKey(2), (bt, 21, 7), jnp.float32)
    yt = jax.nn.one_hot(
        jax.random.bernoulli(jax.random.PRNGKey(3), 0.5, (bt,)).astype(jnp.int32), 2)

    def loss_fn(p, xb, yb):
        logits = bilstm_logits_trainable(p, xb, config, use_pallas=True)
        logits = logits * jnp.asarray(CLASS_WEIGHTS, logits.dtype)
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(yb * lp, axis=-1))

    @jax.jit
    def step(p, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        p2 = jax.tree_util.tree_map(lambda a, g: a - 1e-3 * g, p, grads)
        return p2, loss

    p = params
    p, loss = step(p, xt, yt)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(32):
        p, loss = step(p, xt, yt)
    np.asarray(loss)
    dt = time.perf_counter() - t0
    print(f"train fused-VJP: {32/dt:.1f} steps/s (batch {bt})", flush=True)


if __name__ == "__main__":
    main()
