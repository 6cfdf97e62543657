"""End-to-end detect pipeline test on synthetic fast5 data.

fast5 -> ingestion -> built-in alignment -> features -> jitted BiLSTM ->
predetail HDF5 + index files + mod_pos BED, verified against the
simulation's ground truth coverage.
"""

import glob
import os

import h5py
import numpy as np
import pytest

import jax

from deepmod_tpu.engine.detect import DetectConfig, detect_run
from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
from deepmod_tpu.models.tf_import import save_bilstm_npz
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset
from deepmod_tpu.aggregate.summarize import read_bed


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e"))
    config = SynthConfig(
        genome_sizes={"chrS": 20000},
        num_reads=6,
        read_length=(700, 1200),
        seed=9,
    )
    genome, reads = generate_dataset(out, config)
    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    model_path = os.path.join(out, "model.npz")
    save_bilstm_npz(model_path, params, model_config)
    det = DetectConfig(
        wrk_base=os.path.join(out, "fast5"),
        ref=os.path.join(out, "ref.fa"),
        model_path=model_path,
        out_folder=os.path.join(out, "out"),
        file_id="mod",
        base="C",
        align_str="builtin",
    )
    result = detect_run(det)
    return out, genome, reads, det, result


def test_all_reads_processed(e2e):
    _, _, reads, _, result = e2e
    assert result.num_reads == len(reads)
    assert result.num_windows > 0
    assert result.errors == {}


def test_bed_outputs(e2e):
    out, genome, reads, det, result = e2e
    assert result.bed_files
    total_cov = 0
    for bed in result.bed_files:
        name = os.path.basename(bed)
        assert name.startswith("mod_pos.chrS") and name.endswith(".C.bed")
        with open(bed) as fh:
            for line in fh:
                assert line.endswith(" \n")  # reference's trailing-space format
                parts = line.split()
                assert len(parts) == 12
                chrom, p1, p2, base = parts[0], int(parts[1]), int(parts[2]), parts[3]
                assert chrom == "chrS" and p2 == p1 + 1 and base == "C"
                cov, pct, mod = int(parts[9]), int(parts[10]), int(parts[11])
                assert 0 <= mod <= cov
                assert pct == int(100 * mod / (cov if cov else 1))
                total_cov += cov
    assert total_cov > 0


def test_coverage_matches_simulation(e2e):
    out, genome, reads, det, result = e2e
    # expected per-position C coverage on + strand from simulated intervals
    ref = genome["chrS"]
    expected = np.zeros(len(ref), np.int64)
    for read in reads:
        if read.strand == "+":
            expected[read.start + 50 : read.start + len(read.ref_segment) - 50] += 1
    plus_bed = [b for b in result.bed_files if "chrS+" in b]
    assert plus_bed
    got = read_bed(plus_bed[0])
    is_c = np.frombuffer(ref.encode(), np.uint8) == ord("C")
    # interior positions covered by exactly one read must appear with cov>=1
    check = np.flatnonzero(is_c & (expected >= 1))
    covered = sum((("chrS", "+", int(p)) in got) for p in check)
    assert covered / len(check) > 0.98


def test_per_read_outputs(e2e):
    out, _, reads, det, result = e2e
    pred_files = glob.glob(
        os.path.join(det.out_folder, det.file_id, "*", "rnn.pred.detail.fast5.*")
    )
    assert pred_files
    with h5py.File(pred_files[0], "r") as fh:
        keys = list(fh["pred"].keys())
        assert keys
        g = fh["pred"][keys[0]]
        assert g.attrs["mapped_chr"] == "chrS"
        detail = g["predetail"][()]
        assert set(detail.dtype.names) == {
            "refbase", "readbase", "refbasei", "readbasei", "mod_pred",
        }
        assert g.attrs["pred_mod_num"] == int((detail["mod_pred"] == 1).sum())
    # index files with reference headers
    idx = glob.glob(os.path.join(det.out_folder, det.file_id, "rnn.pred.ind.*"))
    assert idx
    with open(idx[0]) as fh:
        lines = fh.readlines()
    assert lines[0].startswith("#base_folder_fast5 ")
    assert lines[1].startswith("#base_folder_output ")
    assert len(lines) - 2 == result.num_reads
    # completion sentinel (myDetect.py:1263)
    assert os.path.exists(det.out_folder.rstrip("/") + ".done")


def test_deterministic_rerun(e2e, tmp_path):
    out, genome, reads, det, result = e2e
    import dataclasses

    det2 = dataclasses.replace(det, out_folder=str(tmp_path / "out2"))
    result2 = detect_run(det2)
    assert result2.num_windows == result.num_windows
    for b1, b2 in zip(sorted(result.bed_files), sorted(result2.bed_files)):
        assert open(b1).read() == open(b2).read()


def test_summarize_only_matches_full_run(e2e, tmp_path):
    """--predDet 0 rebuilds byte-identical BEDs from predetail files."""
    import dataclasses

    out, genome, reads, det, result = e2e
    det0 = dataclasses.replace(
        det,
        pred_det=False,
        pred_path=os.path.join(det.out_folder, det.file_id),
        out_folder=str(tmp_path / "resum"),
    )
    result0 = detect_run(det0)
    assert len(result0.bed_files) == len(result.bed_files)
    for b1, b0 in zip(sorted(result.bed_files), sorted(result0.bed_files)):
        assert os.path.basename(b1) == os.path.basename(b0)
        assert open(b1).read() == open(b0).read()


def test_mod_cluster_rescue_unit():
    from deepmod_tpu.engine.summarize import apply_mod_cluster_rescue

    dtype = [("refbase", "U1"), ("readbase", "U1"),
             ("refbasei", np.uint64), ("readbasei", np.uint64),
             ("mod_pred", np.int64)]
    # CGCGCG with middle C unmethylated, neighbors methylated
    seq = "CGCGCG"
    arr = np.zeros(len(seq), dtype)
    arr["refbase"] = list(seq)
    arr["readbase"] = list(seq)
    arr["refbasei"] = np.arange(len(seq))
    arr["mod_pred"] = [1, 0, 0, 0, 1, 0]  # C at 2 unmethylated
    out = apply_mod_cluster_rescue(arr)
    # neighborhood CpGs (positions 0 and 4) are methylated -> rescue C@2
    assert out["mod_pred"][2] == 1
    # a lone unmethylated C with no methylated CpG neighbors stays 0
    arr2 = np.zeros(3, dtype)
    arr2["refbase"] = list("ACT")
    arr2["readbase"] = list("ACT")
    arr2["mod_pred"] = 0
    assert apply_mod_cluster_rescue(arr2)["mod_pred"][1] == 0


def test_multiprocess_host_ingestion(e2e, tmp_path):
    """threads>1 (spawn workers for host stages) matches single-process."""
    import dataclasses

    out, genome, reads, det, result = e2e
    det_mp = dataclasses.replace(
        det, out_folder=str(tmp_path / "out_mp"), threads=2,
        files_per_batch=3,  # force multiple batches across workers
    )
    result_mp = detect_run(det_mp)
    assert result_mp.num_reads == result.num_reads
    assert result_mp.num_windows == result.num_windows
    for b1, b2 in zip(sorted(result.bed_files), sorted(result_mp.bed_files)):
        assert open(b1).read() == open(b2).read()


@pytest.mark.parametrize("style,move_flag", [("v1", False), ("move", True)])
def test_detect_other_fast5_flavors(tmp_path, style, move_flag):
    """Full detect over albacore-v1 and guppy move-table fast5 files."""
    import dataclasses

    from deepmod_tpu.testing.synthetic import generate_dataset as gen

    out = str(tmp_path / style)
    genome, reads = gen(
        out,
        SynthConfig(
            genome_sizes={"chrF": 15000}, num_reads=3,
            read_length=(600, 1000), seed=17, fast5_style=style,
        ),
    )
    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    model_path = os.path.join(out, "model.npz")
    save_bilstm_npz(model_path, params, model_config)
    res = detect_run(
        DetectConfig(
            wrk_base=os.path.join(out, "fast5"),
            ref=os.path.join(out, "ref.fa"),
            model_path=model_path,
            out_folder=os.path.join(out, "out"),
            align_str="builtin",
            move=move_flag,
        )
    )
    assert res.num_reads == 3, res.errors
    assert res.bed_files


def test_batch_failure_recorded_not_fatal(e2e, tmp_path, monkeypatch):
    """A crashing batch lands in the error census; the run completes."""
    import dataclasses

    from deepmod_tpu.engine import detect as det_mod
    from deepmod_tpu.engine import host_worker

    out, genome, reads, det, result = e2e
    real = host_worker.host_process_files
    calls = {"n": 0}

    def flaky(paths):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected batch crash")
        return real(paths)

    monkeypatch.setattr(host_worker, "host_process_files", flaky)
    monkeypatch.setattr(det_mod, "host_process_files", flaky, raising=False)
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "flaky"), files_per_batch=3,
    )
    res = detect_run(cfg)
    crashed = [k for k in res.errors if k.startswith("Batch worker failed")]
    assert crashed, res.errors
    # remaining batches still processed
    assert res.num_reads > 0


def test_device_aggregation_matches_host(e2e, tmp_path):
    """On-device psum aggregation (8-device mesh) reproduces host BEDs."""
    import dataclasses

    out, genome, reads, det, result = e2e
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "devagg"), device_aggregation=True,
    )
    res = detect_run(cfg)
    assert res.num_reads == result.num_reads
    for b1, b2 in zip(sorted(result.bed_files), sorted(res.bed_files)):
        assert open(b1).read() == open(b2).read()


def test_bf16_host_cast_matches_device_cast():
    """The bf16 transfer path casts windows on the HOST before device_put
    (halving transfer bytes); numpy/ml_dtypes rounds nearest-even exactly
    like XLA's convert, so the device sees identical bits."""
    import ml_dtypes
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    w = rng.standard_normal((257, 21, 7)).astype(np.float32)
    host = w.astype(ml_dtypes.bfloat16)
    dev = np.asarray(jnp.asarray(w).astype(jnp.bfloat16))
    assert host.tobytes() == dev.tobytes()


def test_predictor_bf16_transfer_path(e2e):
    """WindowPredictor in bf16 mode (host-cast transfer + fused kernel,
    interpret on CPU) agrees with the fp32 scan path on real pipeline
    windows."""
    from deepmod_tpu.engine.detect import WindowPredictor

    out, genome, reads, det, result = e2e
    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    rng = np.random.default_rng(7)
    windows = rng.standard_normal((40, 21, 7)).astype(np.float32)
    p32 = WindowPredictor(
        params, model_config, buckets=(64,), use_pallas=False,
        data_parallel=False,
    ).predict(windows)
    p16 = WindowPredictor(
        params, model_config, buckets=(64,), use_pallas=True,
        data_parallel=False, precision="bf16",
    ).predict(windows)
    assert p16.shape == p32.shape
    np.testing.assert_array_equal(p16, p32)


def test_target_only_beds_identical(e2e, tmp_path):
    """--targetOnly classifies only refbase==Base windows; BEDs must be
    byte-identical (summaries count only target rows) and per-read
    mod_pred must agree on every target row."""
    import dataclasses

    out, genome, reads, det, result = e2e
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "tonly"), target_only=True,
    )
    res = detect_run(cfg)
    assert res.num_reads == result.num_reads
    for b1, b2 in zip(sorted(result.bed_files), sorted(res.bed_files)):
        assert open(b1).read() == open(b2).read()
    # per-read parity on target rows
    full = sorted(glob.glob(os.path.join(
        det.out_folder, det.file_id, "*", "rnn.pred.detail.fast5.*")))
    tonly = sorted(glob.glob(os.path.join(
        cfg.out_folder, cfg.file_id, "*", "rnn.pred.detail.fast5.*")))
    assert full and len(full) == len(tonly)
    n_checked = 0
    for f1, f2 in zip(full, tonly):
        with h5py.File(f1) as a, h5py.File(f2) as b:
            for key in a["pred"]:
                d1 = a["pred"][key]["predetail"][()]
                d2 = b["pred"][key]["predetail"][()]
                target = d1["refbase"] == det.base.encode()
                np.testing.assert_array_equal(
                    d1["mod_pred"][target], d2["mod_pred"][target]
                )
                n_checked += int(target.sum())
    assert n_checked > 100


def test_predictor_greedy_bucket_remainder():
    """predict() consumes DESCENDING buckets greedily; the composed
    result must match a single-shot classification for sizes that
    straddle several bucket boundaries (incl. the padded tail)."""
    import jax
    import numpy as np

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import (
        BiLSTMConfig,
        bilstm_predict,
        init_bilstm_params,
    )

    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(5), config)
    pred = WindowPredictor(
        params, config, buckets=(8, 64, 256), use_pallas=False,
        data_parallel=False,
    )
    for n in (1, 7, 8, 9, 255, 256, 300, 583):
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(n), (n, 21, 7)),
            np.float32,
        )
        want = np.asarray(bilstm_predict(params, x, config)).astype(np.int8)
        got = pred.predict(x)
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_predictor_compact_transfer_equality():
    """Compact transfer (ship feature rows, build windows on device via
    shifted slices, discard unrequested centers) must match the
    window-transfer path exactly — contiguous AND scattered (targetOnly
    -style) centers, sizes straddling bucket boundaries."""
    import jax
    import numpy as np

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(5), config)
    kw = dict(buckets=(64, 256), data_parallel=False)
    for use_pallas in (False, True):
        ref = WindowPredictor(
            params, config, use_pallas=use_pallas,
            compact_transfer=False, **kw,
        )
        cmp = WindowPredictor(
            params, config, use_pallas=use_pallas,
            compact_transfer=True, **kw,
        )
        assert cmp.compact_transfer
        rng = np.random.default_rng(3)
        for n_rows, mode in ((80, "all"), (300, "all"), (700, "scatter"),
                             (1200, "sparse")):
            feats = rng.standard_normal((n_rows, 7)).astype(np.float32)
            lo, hi = 10, n_rows - 11
            if mode == "all":
                centers = np.arange(lo, hi, dtype=np.int64)
            elif mode == "scatter":
                centers = np.arange(lo, hi, 4, dtype=np.int64)
            else:  # sparse with large gaps (stresses chunk advance)
                centers = np.unique(
                    rng.integers(lo, hi, size=37).astype(np.int64)
                )
            want = ref.predict_from_features(feats, centers)
            got = cmp.predict_from_features(feats, centers)
            np.testing.assert_array_equal(
                got, want, err_msg=f"pallas={use_pallas} {n_rows} {mode}"
            )

    # regression: a bucket list smaller than the window (here (8,)) once
    # made the compact chunk loop advance by zero centers and spin
    # forever — the min-rows floor must cover a full window
    tiny = WindowPredictor(
        params, config, buckets=(8,), use_pallas=False,
        data_parallel=False, compact_transfer=True,
    )
    ref8 = WindowPredictor(
        params, config, buckets=(8,), use_pallas=False,
        data_parallel=False, compact_transfer=False,
    )
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((60, 7)).astype(np.float32)
    centers = np.arange(10, 50, dtype=np.int64)
    np.testing.assert_array_equal(
        tiny.predict_from_features(feats, centers),
        ref8.predict_from_features(feats, centers),
    )


def test_predictor_packed_compact_equality():
    """Packed compact transfer (one-hot columns as a uint8 code + a 5x4
    device LUT, 7 bytes/row in bf16) must match the unpacked compact and
    window-transfer paths exactly on engine-shaped features; non-one-hot
    library inputs must fall back to the unpacked fn (not mis-pack)."""
    import jax
    import numpy as np

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(7), config)
    rng = np.random.default_rng(11)
    rows = 900
    feats = np.zeros((rows, 7), np.float32)
    hot = rng.integers(0, 5, rows)  # 4 = no base ('-'/'N'/pad rows)
    for b in range(4):
        feats[hot == b, b] = 1.0
    feats[:, 4] = (rng.standard_normal(rows) * 2).round(3)
    feats[:, 5] = np.abs(rng.standard_normal(rows) * 2).round(3)
    feats[:, 6] = rng.integers(1, 40, rows)
    centers = np.arange(12, rows - 12, dtype=np.int64)
    kw = dict(buckets=(64, 256), data_parallel=False)
    for use_pallas in (False, True):
        packed = WindowPredictor(
            params, config, use_pallas=use_pallas,
            compact_transfer=True, **kw,
        )
        assert packed._pack_onehot
        win = WindowPredictor(
            params, config, use_pallas=use_pallas,
            compact_transfer=False, **kw,
        )
        got = packed.predict_from_features(feats, centers)
        assert "onehot" in packed._compact_fns  # the packed fn really ran
        want = win.predict_from_features(feats, centers)
        np.testing.assert_array_equal(
            got, want, err_msg=f"pallas={use_pallas}"
        )
        # non-one-hot inputs: falls back, never mis-packs
        rand = rng.standard_normal((rows, 7)).astype(np.float32)
        got_r = packed.predict_from_features(rand, centers)
        assert False in packed._compact_fns
        np.testing.assert_array_equal(
            got_r, win.predict_from_features(rand, centers),
            err_msg=f"fallback pallas={use_pallas}",
        )

    # sharded build on the virtual mesh: packed SPMD windows + LUT gather
    if jax.device_count() > 1:
        packed_dp = WindowPredictor(
            params, config, use_pallas=False, buckets=(64, 256),
            data_parallel=True, compact_transfer=True,
        )
        win_dp = WindowPredictor(
            params, config, use_pallas=False, buckets=(64, 256),
            data_parallel=True, compact_transfer=False,
        )
        np.testing.assert_array_equal(
            packed_dp.predict_from_features(feats, centers),
            win_dp.predict_from_features(feats, centers),
            err_msg="data-parallel packed build",
        )


def test_predictor_bounded_waste_schedule():
    """The bucket descent stops once the remainder's covering bucket pads
    with bounded waste, instead of descending through every level (each
    device call's result fetch pays the host-sync RTT)."""
    import jax.numpy as jnp

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(5), config)
    pred = WindowPredictor(
        params, config, buckets=(8, 64, 256), use_pallas=False,
        data_parallel=False,
    )
    calls = []

    def fake_fn(p, x):
        calls.append(int(x.shape[0]))
        return jnp.zeros((x.shape[0],), jnp.int8)

    pred._fn = fake_fn
    # n=4436, max_waste = max(8, 4436>>6) = 69: 17x256 -> rem 84 (waste
    # 172 > 69, keep descending) -> 1x64 -> rem 20 (covering 64 wastes
    # 44 <= 69: STOP, pad to 64). The fully-greedy schedule would run
    # 2x8 + a padded 8 instead (two extra calls).
    out = pred.predict(np.zeros((4436, 21, 7), np.float32))
    assert len(out) == 4436
    assert calls == [256] * 17 + [64, 64]
    # exact bucket fit never pads (and the tail path copies nothing)
    calls.clear()
    pred.predict(np.zeros((256, 21, 7), np.float32))
    assert calls == [256]


def test_host_pool_persistent_across_runs(e2e, tmp_path):
    """A HostPool passed into detect_run survives and is reused across
    runs (the warm-predictor pattern for the host side): two runs through
    ONE pool produce byte-identical BEDs, and the pool's workers are the
    same processes both times."""
    import dataclasses

    from deepmod_tpu.engine.detect import _host_options
    from deepmod_tpu.engine.host_pool import HostPool

    out, genome, reads, det, result = e2e
    cfg1 = dataclasses.replace(
        det, out_folder=str(tmp_path / "pool1"), threads=2,
        files_per_batch=3,
    )
    pool = HostPool(2, _host_options(cfg1))
    try:
        r1 = detect_run(cfg1, host_pool=pool)
        pids = [p.pid for p in pool._procs]
        cfg2 = dataclasses.replace(cfg1, out_folder=str(tmp_path / "pool2"))
        r2 = detect_run(cfg2, host_pool=pool)
        assert [p.pid for p in pool._procs] == pids
        assert all(p.is_alive() for p in pool._procs)
    finally:
        pool.close()
    assert r1.num_reads == r2.num_reads == result.num_reads
    assert r1.num_windows == r2.num_windows == result.num_windows
    for b0, b1, b2 in zip(sorted(result.bed_files), sorted(r1.bed_files),
                          sorted(r2.bed_files)):
        assert open(b0).read() == open(b1).read() == open(b2).read()


def test_host_pool_rejects_mismatched_options(e2e, tmp_path):
    import dataclasses

    from deepmod_tpu.engine.detect import _host_options
    from deepmod_tpu.engine.host_pool import HostPool

    out, genome, reads, det, result = e2e
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "mism"), threads=2, files_per_batch=3,
    )
    other = dataclasses.replace(cfg, fnum=57)
    pool = HostPool(1, _host_options(other))
    try:
        with pytest.raises(ValueError, match="different HostOptions"):
            detect_run(cfg, host_pool=pool)
    finally:
        pool.close()


def test_pooled_target_only_and_device_agg_match(e2e, tmp_path):
    """threads>1 (worker-side outputs + COO merge) under targetOnly and
    under device aggregation both reproduce the baseline BEDs."""
    import dataclasses

    out, genome, reads, det, result = e2e
    for tag, overrides in (
        ("t_only", dict(target_only=True)),
        ("dev_agg", dict(device_aggregation=True)),
        ("cluster", dict(mod_cluster=True)),
    ):
        cfg = dataclasses.replace(
            det, out_folder=str(tmp_path / tag), threads=2,
            files_per_batch=3, **overrides,
        )
        res = detect_run(cfg)
        assert res.num_reads == result.num_reads, (tag, res.errors)
        if tag == "cluster":
            # rescue can only flip counts upward; BED row sets must match
            assert len(res.bed_files) == len(result.bed_files)
            continue
        for b1, b2 in zip(sorted(result.bed_files), sorted(res.bed_files)):
            assert open(b1).read() == open(b2).read(), tag


def test_host_pool_worker_death_is_survivable(e2e, tmp_path):
    """A worker dying mid-run surfaces as a batch error; surviving
    workers complete the rest of the run."""
    import dataclasses
    import os as _os
    import signal as _signal
    import time as _time

    from deepmod_tpu.engine.detect import _host_options
    from deepmod_tpu.engine.host_pool import HostPool

    out, genome, reads, det, result = e2e
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "death"), threads=2,
        files_per_batch=2,
    )
    pool = HostPool(2, _host_options(cfg))
    try:
        # kill one worker before the run: its queued batches fail over
        _os.kill(pool._procs[0].pid, _signal.SIGKILL)
        _time.sleep(0.2)
        res = detect_run(cfg, host_pool=pool)
    finally:
        pool.close()
    # every read still processed (dead worker never got a batch) OR the
    # lost batches are recorded in the census — either way the run ends
    total_failed = sum(
        len(v) for k, v in res.errors.items()
        if k.startswith("Batch worker failed")
    )
    assert res.num_reads + 10 * total_failed >= result.num_reads
    assert res.num_reads > 0


def test_engine_compact_packed_bed_identity(e2e, tmp_path):
    """The full engine through a compact_transfer predictor — the TPU
    default, which takes the PACKED path with assume_packable=True from
    the engine call sites — must emit byte-identical BEDs to the
    window-transfer run."""
    import dataclasses

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.tf_import import load_model

    out, _, _, det, result = e2e
    params, model_config = load_model(det.model_path)
    pred = WindowPredictor(
        params, model_config, buckets=(512, 4096), use_pallas=False,
        data_parallel=False, compact_transfer=True, precision="fp32",
    )
    assert pred._pack_onehot
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "compact_out")
    )
    res = detect_run(cfg, pred)
    assert "onehot" in pred._compact_fns  # the packed fn is what ran
    assert sorted(os.path.basename(b) for b in res.bed_files) == sorted(
        os.path.basename(b) for b in result.bed_files
    )
    for a, b in zip(sorted(result.bed_files), sorted(res.bed_files)):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), os.path.basename(a)


def test_compact_transfer_bounds_guard():
    """Centers without a full window inside the feature block must raise,
    not classify zero-padded garbage (or wrap negative rows)."""
    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(5), config)
    pred = WindowPredictor(
        params, config, buckets=(64,), use_pallas=False,
        data_parallel=False, compact_transfer=True,
    )
    feats = np.zeros((50, 7), np.float32)
    with pytest.raises(ValueError, match="full window"):
        pred.predict_from_features(
            feats, np.arange(5, 45, dtype=np.int64)  # center 5 < half 10
        )
    with pytest.raises(ValueError, match="full window"):
        pred.predict_from_features(
            feats, np.arange(10, 45, dtype=np.int64)  # 44 + 10 >= 50
        )


def test_sparse_selection_routes_to_window_transfer():
    """Below 1/window density the predictor must take the materialized-
    window path (fewer bytes AND fewer windows than compact chunks)."""
    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(5), config)
    pred = WindowPredictor(
        params, config, buckets=(64, 256), use_pallas=False,
        data_parallel=False, compact_transfer=True,
    )
    calls = {"compact": 0, "window": 0}
    real_compact, real_window = pred._predict_compact, pred.predict

    def spy_compact(*a, **kw):
        calls["compact"] += 1
        return real_compact(*a, **kw)

    def spy_window(*a, **kw):
        calls["window"] += 1
        return real_window(*a, **kw)

    pred._predict_compact = spy_compact
    pred.predict = spy_window
    feats = np.random.default_rng(0).standard_normal((2100, 7)).astype(
        np.float32
    )
    # sparse: 40 centers over 2100 rows (40*21 = 840 < 2100)
    pred.predict_from_features(
        feats, np.linspace(20, 2000, 40).astype(np.int64)
    )
    assert calls == {"compact": 0, "window": 1}
    # dense: every row (n*21 >> rows)
    pred.predict_from_features(
        feats, np.arange(10, 2090, dtype=np.int64)
    )
    assert calls == {"compact": 1, "window": 1}


def test_host_pool_survives_crashed_run(e2e, tmp_path):
    """A run whose device stage raises mid-flight must leave a SHARED
    pool reusable: the next run through the same pool completes with
    correct outputs (stale messages/state from the dead run dropped)."""
    import dataclasses

    from deepmod_tpu.engine.detect import _host_options
    from deepmod_tpu.engine.host_pool import HostPool

    out, genome, reads, det, result = e2e

    class ExplodingPredictor:
        config = type(det)  # placeholder; replaced below
        calls = 0

        def __init__(self, inner):
            self.inner = inner
            self.config = inner.config

        def predict_from_features(self, feats, centers, window=21,
                                  **kwargs):
            ExplodingPredictor.calls += 1
            if ExplodingPredictor.calls == 1:
                raise RuntimeError("injected device failure")
            return self.inner.predict_from_features(
                feats, centers, window, **kwargs
            )

    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    from deepmod_tpu.engine.detect import WindowPredictor

    inner = WindowPredictor(params, model_config, use_pallas=False)
    cfg = dataclasses.replace(
        det, out_folder=str(tmp_path / "crash1"), threads=2,
        files_per_batch=2,
    )
    pool = HostPool(2, _host_options(cfg))
    try:
        with pytest.raises(RuntimeError, match="injected device failure"):
            detect_run(cfg, ExplodingPredictor(inner), host_pool=pool)
        assert pool._inflight == {}  # abandoned cleanly
        cfg2 = dataclasses.replace(cfg, out_folder=str(tmp_path / "crash2"))
        res = detect_run(cfg2, inner, host_pool=pool)
    finally:
        pool.close()
    assert res.num_reads == result.num_reads, res.errors
    # the reference predictor here is the same weights as the fixture's
    for b1, b2 in zip(sorted(result.bed_files), sorted(res.bed_files)):
        assert open(b1).read() == open(b2).read()


def test_predictor_packed_hist_equality():
    """fnum=57 packed compact transfer: the 50 histogram count columns
    ride as uint8 (exact in bf16 for ints < 256) plus the one-hot code —
    57 B/row instead of 114 in bf16. Must match the unpacked compact and
    window-transfer paths exactly; a count >= 256 or fractional/negative
    histogram values must fall back to the unpacked transfer."""
    import jax
    import numpy as np

    from deepmod_tpu.engine.detect import WindowPredictor
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params

    import os

    os.environ["DMT_COMPACT_PACK57"] = "1"  # opt-in (chip A/B: 0.73x on
    #                                         the tunnel; see detect.py)
    config = BiLSTMConfig(num_input=57)
    params = init_bilstm_params(jax.random.PRNGKey(9), config)
    rng = np.random.default_rng(13)
    rows = 700
    feats = np.zeros((rows, 57), np.float32)
    feats[:, :50] = rng.integers(0, 40, (rows, 50))
    hot = rng.integers(0, 5, rows)
    for b in range(4):
        feats[hot == b, 50 + b] = 1.0
    feats[:, 54] = (rng.standard_normal(rows) * 2).round(3)
    feats[:, 55] = np.abs(rng.standard_normal(rows) * 2).round(3)
    feats[:, 56] = rng.integers(1, 40, rows)
    centers = np.arange(12, rows - 12, dtype=np.int64)
    kw = dict(buckets=(64, 256), data_parallel=False)
    for use_pallas in (False, True):
        packed = WindowPredictor(
            params, config, use_pallas=use_pallas,
            compact_transfer=True, **kw,
        )
        assert packed._pack_hist
        win = WindowPredictor(
            params, config, use_pallas=use_pallas,
            compact_transfer=False, **kw,
        )
        got = packed.predict_from_features(feats, centers)
        assert "hist" in packed._compact_fns  # the packed fn really ran
        want = win.predict_from_features(feats, centers)
        np.testing.assert_array_equal(
            got, want, err_msg=f"pallas={use_pallas}"
        )
        # engine path (assume_packable skips the integrality scan but
        # NOT the <256 gate)
        got_a = packed.predict_from_features(
            feats, centers, assume_packable=True
        )
        np.testing.assert_array_equal(got_a, want)

        # a single count >= 256 must fall back (and stay correct)
        big = feats.copy()
        big[5, 3] = 300.0
        got_b = packed.predict_from_features(
            big, centers, assume_packable=True
        )
        assert False in packed._compact_fns
        np.testing.assert_array_equal(
            got_b, win.predict_from_features(big, centers),
            err_msg=f"fallback>=256 pallas={use_pallas}",
        )
        # fractional histogram values: verification path falls back
        frac = feats.copy()
        frac[7, 2] = 1.5
        got_f = packed.predict_from_features(frac, centers)
        np.testing.assert_array_equal(
            got_f, win.predict_from_features(frac, centers),
            err_msg=f"fallback-frac pallas={use_pallas}",
        )
    del os.environ["DMT_COMPACT_PACK57"]
