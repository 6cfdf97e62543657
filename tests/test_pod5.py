"""POD5 container slice: flatbuffer/Arrow framing, vbz signal rows, and
the modern-stack ingestion path (pod5 + dorado-style basecall BAM).

Validation stance mirrors io/vbz.py: spec-derived framing + round-trip
self-consistency (no vendor pod5 obtainable in this environment); the
e2e test pins that a pod5+BAM detect run reproduces the equivalent
move-style fast5 run's BEDs byte-for-byte.
"""

import os
import uuid

import numpy as np
import pytest

from deepmod_tpu.io.pod5 import (
    ARROW_MAGIC,
    POD5_SIGNATURE,
    Column,
    FBTable,
    is_pod5,
    read_arrow_file,
    read_pod5,
    write_arrow_file,
    write_pod5,
)


def test_arrow_file_roundtrip_all_column_kinds():
    cols = [
        Column("read_id", "fsb16", [uuid.uuid4().bytes for _ in range(3)]),
        Column("signal", "large_list_u64", [[0, 1], [2], [3, 4, 5]]),
        Column("samples", "uint32", [7, 8, 9]),
        Column("n64", "uint64", [1, 2, 3]),
        Column("median_before", "float32", [0.5, 1.5, 2.5]),
        Column("run_info", "int16", [0, -1, 2]),
        Column("acq", "utf8", ["abc", "", "f"]),
        Column("blob", "large_binary", [b"xx", b"", b"yzw"]),
        Column("chunks", "large_list_i16",
               [np.array([1, -2], np.int16), np.array([], np.int16),
                np.array([7], np.int16)]),
    ]
    blob = write_arrow_file(cols)
    assert blob[:6] == ARROW_MAGIC and blob[-6:] == ARROW_MAGIC
    out = read_arrow_file(blob)
    assert list(out["samples"]) == [7, 8, 9]
    assert list(out["n64"]) == [1, 2, 3]
    assert np.allclose(out["median_before"], [0.5, 1.5, 2.5])
    assert list(out["run_info"]) == [0, -1, 2]
    assert out["acq"] == ["abc", "", "f"]
    assert out["blob"] == [b"xx", b"", b"yzw"]
    assert [list(x) for x in out["signal"]] == [[0, 1], [2], [3, 4, 5]]
    assert [list(x) for x in out["chunks"]] == [[1, -2], [], [7]]
    assert [c == cols[0].values[i] for i, c in enumerate(out["read_id"])]


def test_flatbuffer_absent_fields_default():
    from deepmod_tpu.io.pod5 import FBBuilder

    b = FBBuilder()
    t = b.table({0: ("i", 42)})
    buf = b.finish(t)
    root = FBTable.root(buf)
    assert root.scalar(0, "i") == 42
    assert root.scalar(5, "i", default=-7) == -7  # beyond vtable
    assert root.table(3) is None
    assert root.string(2) is None


def test_pod5_roundtrip_vbz_and_uncompressed(tmp_path):
    rng = np.random.RandomState(0)
    reads = [
        (uuid.uuid4().bytes, rng.randint(-500, 2000, n).astype(np.int16))
        for n in (5, 0, 250_000, 1234)
    ]
    p1 = str(tmp_path / "a.pod5")
    write_pod5(p1, reads, sample_rate=5000, calibration=(12.0, 0.25))
    assert is_pod5(p1)
    got = read_pod5(p1)
    assert len(got) == len(reads)
    for (rid, sig), r in zip(reads, got):
        assert r.read_id == rid
        assert np.array_equal(r.signal, sig)
        assert r.sample_rate == 5000
        assert r.calibration == (12.0, 0.25)
    p2 = str(tmp_path / "b.pod5")
    write_pod5(p2, reads, compress=False)
    got2 = read_pod5(p2)
    for a, b in zip(got, got2):
        assert np.array_equal(a.signal, b.signal)
    # the 250k read spans >2 signal-table rows (chunk_samples 102400)
    with open(p1, "rb") as fh:
        data = fh.read()
    assert data[:8] == POD5_SIGNATURE and data[-8:] == POD5_SIGNATURE


def test_pod5_signature_reject(tmp_path):
    p = str(tmp_path / "x.pod5")
    with open(p, "wb") as fh:
        fh.write(b"not a pod5 at all")
    assert not is_pod5(p)
    with pytest.raises(ValueError):
        read_pod5(p)


def test_basecall_bam_roundtrip(tmp_path):
    from deepmod_tpu.align.alignfile import read_basecalls, write_basecall_bam

    mv = np.zeros(30, np.int8)
    mv[::3] = 1
    path = str(tmp_path / "bc.bam")
    write_basecall_bam(
        path,
        [("r1", "ACGTACGTAC", 5, mv[:20], 10), ("r2", "GGCCTT", 2, mv[:12], 0)],
    )
    got = read_basecalls(path)
    assert set(got) == {"r1", "r2"}
    r = got["r1"]
    assert (r.seq, r.stride, r.trim) == ("ACGTACGTAC", 5, 10)
    assert np.array_equal(r.moves, mv[:20])


def test_basecall_sam_text(tmp_path):
    from deepmod_tpu.align.alignfile import read_basecalls

    path = str(tmp_path / "bc.sam")
    with open(path, "w") as fh:
        fh.write("@HD\tVN:1.6\n")
        fh.write(
            "r9\t4\t*\t0\t255\t*\t*\t0\t0\tACGT\t####\t"
            "mv:B:c,2,1,0,1,0\tts:i:7\n"
        )
    got = read_basecalls(path)
    assert got["r9"].seq == "ACGT" and got["r9"].stride == 2
    assert got["r9"].trim == 7 and list(got["r9"].moves) == [1, 0, 1, 0]


def test_pod5_ingestion_matches_fast5(tmp_path):
    """The modern-stack pair (pod5 + basecall BAM) must ingest into the
    very same events the move-style fast5 produces, and a full detect
    run over each must emit byte-identical BEDs."""
    import dataclasses
    import glob

    import jax

    from deepmod_tpu.engine.detect import DetectConfig, WindowPredictor, detect_run
    from deepmod_tpu.io.fast5 import (
        Fast5ReadOptions,
        read_fast5_batch,
        read_fast5_file,
    )
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.testing.synthetic import (
        SynthConfig,
        convert_move_dataset_to_pod5,
        generate_dataset,
    )

    out = str(tmp_path / "ds")
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrP": 15000}, num_reads=5,
                    read_length=(700, 1100), seed=23, fast5_style="move"),
    )
    pod5_path = str(tmp_path / "reads.pod5")
    bam_path = str(tmp_path / "calls.bam")
    id_map = convert_move_dataset_to_pod5(
        os.path.join(out, "fast5"), pod5_path, bam_path
    )
    assert len(id_map) == len(reads)

    # ingestion-level equality (events byte-identical per read)
    f5_opts = Fast5ReadOptions(move=True)
    pod_opts = Fast5ReadOptions(move=True, basecalls=bam_path)
    pod_reads = read_fast5_batch([pod5_path], pod_opts)
    assert len(pod_reads) == len(reads)
    for sim in reads:
        a = read_fast5_file(sim.path, f5_opts)
        b = pod_reads[id_map[sim.read_id]]
        assert a.basecall == b.basecall
        np.testing.assert_array_equal(a.raw_signals, b.raw_signals)
        for field in ("mean", "stdv", "start", "length", "model_state"):
            np.testing.assert_array_equal(a.m_event[field], b.m_event[field])

    # full detect over each input flavor: byte-identical BEDs
    config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(3), config)
    predictor = WindowPredictor(
        params, config, buckets=(512, 4096), data_parallel=False,
        precision="fp32",
    )
    base_cfg = DetectConfig(
        wrk_base=os.path.join(out, "fast5"),
        ref=os.path.join(out, "ref.fa"),
        model_path="unused", base="C", file_id="mod",
        out_folder=str(tmp_path / "out_f5"),
        move=True, precision="fp32",
    )
    res_f5 = detect_run(base_cfg, predictor)
    pod_dir = str(tmp_path / "pod_in")
    os.makedirs(pod_dir)
    os.rename(pod5_path, os.path.join(pod_dir, "reads.pod5"))
    res_pod = detect_run(
        dataclasses.replace(
            base_cfg, wrk_base=pod_dir, basecalls=bam_path,
            out_folder=str(tmp_path / "out_pod"),
        ),
        predictor,
    )
    assert res_pod.num_reads == res_f5.num_reads
    assert res_pod.num_windows == res_f5.num_windows
    beds_f5 = sorted(glob.glob(str(tmp_path / "out_f5" / "mod_pos.*.bed")))
    beds_pod = sorted(glob.glob(str(tmp_path / "out_pod" / "mod_pos.*.bed")))
    assert beds_f5 and len(beds_f5) == len(beds_pod)
    for a, b in zip(beds_f5, beds_pod):
        assert os.path.basename(a) == os.path.basename(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()


def test_pod5_without_basecalls_errors(tmp_path):
    from deepmod_tpu.io.fast5 import read_fast5_batch
    from deepmod_tpu.utils import ErrorCensus

    p = str(tmp_path / "x.pod5")
    write_pod5(p, [(uuid.uuid4().bytes, np.zeros(10, np.int16))])
    errors = ErrorCensus()
    out = read_fast5_batch([p], errors=errors)
    assert out == {}
    assert "No move data" in errors.errors


def test_getfeatures_from_pod5_matches_fast5(tmp_path):
    """getfeatures over pod5+BAM writes feature files identical to the
    move-fast5 run (training from the modern stack)."""
    import gzip
    import glob

    from deepmod_tpu.engine.getfeatures import (
        GetFeaturesConfig,
        getfeatures_run,
    )
    from deepmod_tpu.testing.synthetic import (
        SynthConfig,
        convert_move_dataset_to_pod5,
        generate_dataset,
    )

    out = str(tmp_path / "ds")
    generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrP": 12000}, num_reads=4,
                    read_length=(600, 900), seed=31, fast5_style="move"),
    )
    pod_dir = str(tmp_path / "pod_in")
    os.makedirs(pod_dir)
    bam_path = str(tmp_path / "calls.bam")
    convert_move_dataset_to_pod5(
        os.path.join(out, "fast5"),
        os.path.join(pod_dir, "reads.pod5"), bam_path,
    )

    def rows_of(folder):
        rows = []
        for path in sorted(glob.glob(os.path.join(folder, "**", "*.xy.gz"),
                                     recursive=True)):
            with gzip.open(path, "rt") as fh:
                rows.extend(fh.read().splitlines())
        return sorted(rows)

    base = dict(
        ref=os.path.join(out, "ref.fa"), posneg=1, motif="CG",
        move=True, align_str="builtin",
    )
    r1 = getfeatures_run(GetFeaturesConfig(
        wrk_base=os.path.join(out, "fast5"),
        out_folder=str(tmp_path / "feat_f5"), **base,
    ))
    r2 = getfeatures_run(GetFeaturesConfig(
        wrk_base=pod_dir, basecalls=bam_path,
        out_folder=str(tmp_path / "feat_pod"), **base,
    ))
    assert r1.num_reads == r2.num_reads > 0
    assert r1.num_rows == r2.num_rows
    # identical feature ROWS (file grouping may differ; read ids do)
    assert rows_of(str(tmp_path / "feat_f5")) == rows_of(
        str(tmp_path / "feat_pod")
    )


def test_cli_detect_pod5_with_basecalls(tmp_path):
    """The --basecalls flag reaches the engine through the CLI layer."""
    import subprocess
    import sys

    from deepmod_tpu.testing.synthetic import (
        SynthConfig,
        convert_move_dataset_to_pod5,
        generate_dataset,
    )

    out = str(tmp_path / "ds")
    generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrP": 9000}, num_reads=3,
                    read_length=(500, 800), seed=37, fast5_style="move"),
    )
    pod_dir = str(tmp_path / "pod_in")
    os.makedirs(pod_dir)
    bam = str(tmp_path / "calls.bam")
    convert_move_dataset_to_pod5(
        os.path.join(out, "fast5"), os.path.join(pod_dir, "r.pod5"), bam
    )
    import jax

    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import save_bilstm_npz

    cfg = BiLSTMConfig(num_input=7)
    model = str(tmp_path / "m.npz")
    save_bilstm_npz(model, init_bilstm_params(jax.random.PRNGKey(0), cfg), cfg)
    env = dict(os.environ, DMT_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "deepmod_tpu", "detect",
         "--wrkBase", pod_dir, "--basecalls", bam,
         "--Ref", os.path.join(out, "ref.fa"), "--modfile", model,
         "--outFolder", str(tmp_path / "o"), "--FileID", "mod",
         "--Base", "C", "--precision", "fp32"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "detect done: 3 reads" in proc.stdout
    import glob as globmod

    assert globmod.glob(str(tmp_path / "o" / "mod_pos.*.bed"))


def test_arrow_property_random_tables():
    """Property test: random column collections of every supported kind
    round-trip through write_arrow_file/read_arrow_file exactly (the
    flatbuffer builder's alignment/vtable logic must hold for arbitrary
    field counts, row counts — incl. 0 — and value ranges)."""
    rng = np.random.default_rng(17)
    kinds = ["fsb16", "large_list_u64", "uint32", "uint64", "float32",
             "int16", "uint16", "utf8", "large_binary", "large_list_i16"]
    for trial in range(25):
        n_rows = int(rng.integers(0, 40))
        n_cols = int(rng.integers(1, 7))
        cols = []
        for ci in range(n_cols):
            kind = kinds[int(rng.integers(0, len(kinds)))]
            name = f"c{ci}_{kind}"
            if kind == "fsb16":
                vals = [bytes(rng.integers(0, 256, 16, dtype=np.uint8))
                        for _ in range(n_rows)]
            elif kind == "large_list_u64":
                vals = [list(rng.integers(0, 2**63, rng.integers(0, 5)))
                        for _ in range(n_rows)]
            elif kind == "large_list_i16":
                vals = [rng.integers(-32768, 32767, rng.integers(0, 9))
                        .astype(np.int16) for _ in range(n_rows)]
            elif kind == "utf8":
                vals = ["x" * int(rng.integers(0, 23)) for _ in range(n_rows)]
            elif kind == "large_binary":
                vals = [bytes(rng.integers(0, 256, rng.integers(0, 31),
                                           dtype=np.uint8))
                        for _ in range(n_rows)]
            elif kind == "float32":
                vals = rng.standard_normal(n_rows).astype(np.float32)
            else:
                info = np.iinfo({"uint32": np.uint32, "uint64": np.uint64,
                                 "int16": np.int16, "uint16": np.uint16}[kind])
                vals = rng.integers(info.min, int(info.max) + 1, n_rows,
                                    dtype=np.int64 if info.min < 0
                                    else np.uint64)
            cols.append(Column(name, kind, list(vals)))
        blob = write_arrow_file(cols)
        out = read_arrow_file(blob)
        assert len(out) == n_cols, (trial, sorted(out))
        for col in cols:
            got = out[col.name]
            want = col.values
            assert len(got) == n_rows, (trial, col.name)
            for g, w in zip(got, want):
                if isinstance(w, (bytes, str)):
                    assert g == w, (trial, col.name)
                elif np.ndim(w) > 0 or isinstance(w, list):
                    np.testing.assert_array_equal(
                        np.asarray(g, np.int64), np.asarray(w, np.int64),
                        err_msg=f"{trial} {col.name}")
                elif col.kind == "float32":
                    assert g == np.float32(w), (trial, col.name)
                else:
                    assert int(g) == int(w), (trial, col.name, g, w)


def test_pod5_truncated_file_fails_cleanly(tmp_path):
    """Mid-file truncation must surface as an exception (not garbage
    reads) and the batch reader must census it, not crash."""
    from deepmod_tpu.io.fast5 import read_fast5_batch, Fast5ReadOptions
    from deepmod_tpu.utils import ErrorCensus

    rng = np.random.RandomState(1)
    p = str(tmp_path / "t.pod5")
    write_pod5(p, [(uuid.uuid4().bytes,
                    rng.randint(-100, 100, 5000).astype(np.int16))])
    data = open(p, "rb").read()
    cut = str(tmp_path / "cut.pod5")
    with open(cut, "wb") as fh:
        fh.write(data[: len(data) // 2])
    with pytest.raises(Exception):
        read_pod5(cut)
    errors = ErrorCensus()
    out = read_fast5_batch(
        [cut], Fast5ReadOptions(basecalls="/nonexistent.bam"), errors
    )
    assert out == {} and errors.errors
