#!/usr/bin/env python
"""Probe: true VPU tanh throughput (fp32 vs bf16) + multiply baseline.

Why v2: the first version chained 400 small kernel dispatches (64 tanh
each); at this tunnel's per-dispatch cost the measurement was dispatch
overhead, not VPU rate (it read 39 Gtanh/s while the production kernel
demonstrably sustains ~330 Gtanh/s). v2 puts a big serial K loop INSIDE
the kernel and sweeps K: if rate grows with K, smaller-K readings were
overhead-bound; the large-K plateau is the true rate.

The multiply chain calibrates tanh's cost in simple-VPU-op units, which
decides whether a polynomial/rational tanh approximation could beat the
native op in the (transcendental-heavy) fused BiLSTM kernel.
"""
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = 512, 512

    def make(dtype, K, op):
        if op == "tanh":
            body = jnp.tanh
        elif op == "mul":
            def body(v):
                return v * 1.0009765625 + 0.125  # fma-able, stays finite
        elif op == "pade":
            # tanh(x) ~ x*(27+x^2)/(27+9x^2): |err|<~3.4e-3 on |x|<2.5,
            # but WRONG beyond (grows as x/9... clamp needed in real use)
            def body(v):
                v2 = v * v
                return v * (27.0 + v2) / (27.0 + 9.0 * v2)
        else:
            raise ValueError(op)

        def kernel(x_ref, o_ref):
            def step(i, v):
                return body(v)
            o_ref[...] = jax.lax.fori_loop(0, K, step, x_ref[...])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L), dtype),
            )(x)

        return run

    for op in ("tanh", "pade", "mul"):
        for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            for K in (256, 2048):
                run = make(dtype, K, op)
                x = jnp.asarray(np.random.rand(B, L) * 0.5 + 0.1, dtype)
                acc = run(x)
                np.asarray(jnp.sum(acc.astype(jnp.float32)))  # compile+warm
                iters = 50
                acc = x
                t0 = time.perf_counter()
                for _ in range(iters):
                    acc = run(acc)
                np.asarray(jnp.sum(acc.astype(jnp.float32)))
                dt = time.perf_counter() - t0
                rate = B * L * K * iters / dt
                print(f"{op:5s} {name} K={K:5d}: {rate/1e9:8.2f} Gop/s"
                      f"  ({dt:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
