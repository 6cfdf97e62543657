#!/usr/bin/env python
"""Argmax-flip study: bf16 fused kernel (tanh-form sigmoid) vs fp32.

Replicates the docs/Validation.md methodology on real feature windows
from the synthetic e2e dataset plus random windows: count argmax
disagreements between the fp32 XLA scan path and the bf16 Pallas path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deepmod_tpu.models.bilstm import (
    BiLSTMConfig, bilstm_logits, init_bilstm_params,
)


def windows_from_dataset(path: str, n_max: int) -> np.ndarray:
    """Real feature windows via the host pipeline."""
    import glob
    from deepmod_tpu.engine.host_worker import (
        HostOptions, init_worker, host_process_files,
    )
    from deepmod_tpu.features.builder import extract_windows

    files = sorted(glob.glob(os.path.join(path, "fast5", "*.fast5")))
    opts = HostOptions(
        ref=os.path.join(path, "ref.fa"), align_str="builtin", fnum=7,
        window_size=21, base="C", con_unk=False, regions=(("", "", ""),),
        basecall_1d="Basecall_1D_000", basecall_2strand="BaseCalled_template",
        signal_group="simple", move=False,
    )
    init_worker(opts)
    res, _ = host_process_files(files)
    outs = []
    total = 0
    for r in res:
        full = np.zeros((len(r.features), r.features.shape[1] + 3), np.float64)
        full[:, 3:] = r.features
        w = extract_windows(full, r.n_aligned)
        outs.append(w)
        total += len(w)
        if total >= n_max:
            break
    return np.concatenate(outs)[:n_max]


def main():
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    params = jax.device_put(init_bilstm_params(jax.random.PRNGKey(0), config))

    real = windows_from_dataset("/tmp/dmt_e2e", 65536)
    rand = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (65536, 21, 7), jnp.float32)
    )
    fp32_fn = jax.jit(lambda p, x: bilstm_logits(p, x, config))
    bf16_fn = jax.jit(
        lambda p, x: bilstm_logits(p, x, config, use_pallas=True, precision="bf16")
    )
    for name, wins in (("real", real), ("random", rand)):
        n = (len(wins) // 512) * 512
        x = jnp.asarray(wins[:n], jnp.float32)
        lf = np.asarray(fp32_fn(params, x))
        lb = np.asarray(bf16_fn(params, x))
        flips = int(np.sum(lf.argmax(1) != lb.argmax(1)))
        margin = np.abs(lf[:, 1] - lf[:, 0])
        dmax = float(np.abs(lf - lb).max())
        print(
            f"{name}: {flips}/{n} argmax flips; max|dlogit|={dmax:.2e}; "
            f"min margin={margin.min():.2e} p1={np.percentile(margin,1):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
