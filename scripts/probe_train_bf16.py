#!/usr/bin/env python
"""Same-process A/B: fused-VJP train step with fp32 vs bf16 sequence
storage (precision arg of make_train_step; round 5).

The fused fwd+bwd is bound by residual/gradient sequence traffic
(docs/Validation.md train sweep: mfu 0.10-0.15, ~flat in batch);
bf16 storage halves exactly that traffic at bf16-checkpointed-
activations numerics (pinned by tests/test_bilstm_train_vjp.py).

Usage: python scripts/probe_train_bf16.py [--iters 20] [--batches 2048 65536]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[2048, 65536])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.train.trainer import make_train_step

    config = BiLSTMConfig(num_input=7)
    init_params = jax.tree.map(
        np.asarray, init_bilstm_params(jax.random.PRNGKey(0), config)
    )
    optimizer = optax.adam(1e-3)
    use_pallas = jax.default_backend() == "tpu"
    steps = {
        prec: make_train_step(config, optimizer, unbalanced=False,
                              use_pallas=use_pallas, precision=prec)
        for prec in ("fp32", "bf16")
    }

    for batch in args.batches:
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, 21, 7),
                              jnp.float32)
        y = jax.nn.one_hot(
            jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (batch,))
            .astype(jnp.int32), 2)
        mask = jnp.ones((batch,), jnp.float32)
        rates = {}
        losses = {}
        for prec in ("fp32", "bf16"):
            params = jax.device_put(init_params)
            opt_state = jax.device_put(optimizer.init(init_params))
            step = steps[prec]
            print(f"probe: compiling {prec} b{batch}", file=sys.stderr,
                  flush=True)
            params, opt_state, loss = step(params, opt_state, x, y, mask)
            np.asarray(loss)
            iters = max(4, args.iters * 2048 // batch)
            t0 = time.perf_counter()
            for _ in range(iters):
                params, opt_state, loss = step(params, opt_state, x, y, mask)
            losses[prec] = float(np.asarray(loss))
            dt = time.perf_counter() - t0
            rates[prec] = iters / dt
            print(json.dumps({
                "precision": prec, "batch": batch,
                "steps_per_s": round(rates[prec], 1),
                "windows_per_s": round(rates[prec] * batch, 1),
                "loss_after": round(losses[prec], 5),
            }), flush=True)
        print(json.dumps({
            "metric": "train_bf16_speedup", "batch": batch,
            "value": round(rates["bf16"] / rates["fp32"], 3),
            "loss_delta": round(abs(losses["bf16"] - losses["fp32"]), 5),
        }), flush=True)


if __name__ == "__main__":
    main()
