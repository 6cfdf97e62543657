"""Coverage tests for less-traveled paths: fnum=57 features, region
filters, training resume, and the external-aligner subprocess contract."""

import os
import stat

import numpy as np
import pytest

import jax

from deepmod_tpu.align.cigar import expand_alignment
from deepmod_tpu.features.builder import build_feature_matrix, extract_windows
from deepmod_tpu.io.fast5 import read_fast5_file
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset


@pytest.fixture(scope="module")
def small_ds(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cov"))
    genome, reads = generate_dataset(
        out,
        SynthConfig(
            genome_sizes={"chrC": 12000}, num_reads=3,
            read_length=(600, 900), seed=31,
        ),
    )
    return out, genome, reads


# ------------------------------------------------------------- fnum = 57


def test_fnum57_features(small_ds):
    out, genome, reads = small_ds
    read = read_fast5_file(reads[0].path)
    sim = reads[0]
    # perfect alignment of the simulated interval for simplicity
    from deepmod_tpu.align.aligner import MinimizerAligner

    aligner = MinimizerAligner(genome)
    rec = aligner.align({read.read_id: read.basecall})[0]
    bmr = expand_alignment(
        genome[rec.rname], rec.seq, rec.pos - 1, rec.cigar, rec.strand,
        rec.rname, len(read.m_event),
    )
    mfeat, start_clip, end_clip = build_feature_matrix(
        read.m_event, read.raw_signals, read.basecall, bmr, fnum=57
    )
    assert mfeat.shape[1] == 60
    n_aligned = len(read.m_event) - start_clip - end_clip
    # histogram columns: per aligned event, bin counts sum to the number
    # of samples inside [-5, 5) clamping (== event length here)
    rows = mfeat[100 : 100 + 5]
    hist = rows[:, 3:53]
    lens = rows[:, 59]
    np.testing.assert_array_equal(hist.sum(axis=1), lens)
    windows = extract_windows(mfeat, n_aligned, window=21)
    assert windows.shape == (n_aligned, 21, 57)


# --------------------------------------------------------------- regions


def test_detect_region_filter(small_ds, tmp_path):
    from deepmod_tpu.engine.detect import DetectConfig, detect_run
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import save_bilstm_npz

    out, genome, reads = small_ds
    config = BiLSTMConfig()
    model = str(tmp_path / "m.npz")
    save_bilstm_npz(model, init_bilstm_params(jax.random.PRNGKey(0), config), config)
    base_cfg = dict(
        wrk_base=os.path.join(out, "fast5"),
        ref=os.path.join(out, "ref.fa"),
        model_path=model,
        align_str="builtin",
    )
    # region excluding everything -> no reads pass
    res_none = detect_run(
        DetectConfig(out_folder=str(tmp_path / "o1"),
                     regions=[("chrC", 11000, 11500)], **base_cfg)
    )
    assert res_none.num_reads == 0
    # wrong chromosome name -> no reads
    res_wrong = detect_run(
        DetectConfig(out_folder=str(tmp_path / "o2"),
                     regions=[("chrZZ", None, None)], **base_cfg)
    )
    assert res_wrong.num_reads == 0
    # whole-chromosome region -> all reads
    res_all = detect_run(
        DetectConfig(out_folder=str(tmp_path / "o3"),
                     regions=[("chrC", None, None)], **base_cfg)
    )
    assert res_all.num_reads == len(reads)


# --------------------------------------------------------- train resume


def test_train_resume_from_checkpoint(tmp_path):
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import load_bilstm_npz, save_bilstm_npz
    from deepmod_tpu.train.trainer import TrainConfig, train_run

    # tiny synthetic feature file
    rng = np.random.RandomState(0)
    rows = 300
    mat = np.zeros((rows, 10), np.float32)
    mat[:, 0] = np.arange(rows)
    labeled = rng.choice(np.arange(15, rows - 15), 60, replace=False)
    mat[labeled[:30], 1] = 1
    mat[labeled[30:], 2] = 1
    mat[:, 3:] = rng.rand(rows, 7)
    feat_dir = tmp_path / "feat"
    feat_dir.mkdir()
    np.savetxt(str(feat_dir / "0.xy.gz"), mat, fmt="%.3f")

    cfg = BiLSTMConfig(num_hidden=8)
    init = init_bilstm_params(jax.random.PRNGKey(5), cfg)
    start = str(tmp_path / "start.npz")
    save_bilstm_npz(start, init, cfg)
    loaded, _ = load_bilstm_npz(start)
    params, model_config, _ = train_run(
        [[str(feat_dir / "0.xy.gz")]],
        TrainConfig(out_folder=str(tmp_path / "tr"), fnum=7, hidden=8,
                    epochs=1, batch_size=64),
        init_params=loaded,
    )
    # parameters moved away from the resume point
    assert not np.allclose(
        np.asarray(params["out_w"]), np.asarray(init["out_w"])
    )
    assert os.path.isfile(str(tmp_path / "tr" / "1" / "mod.npz"))


# -------------------------------------------- external aligner contract


def test_external_aligner_subprocess(tmp_path, monkeypatch, small_ds):
    """A fake 'minimap2' on PATH exercises the subprocess contract
    (temp FASTA in, SAM out) without the real binary."""
    out, genome, reads = small_ds
    from deepmod_tpu.align.aligner import ExternalAligner, MinimizerAligner

    builtin = MinimizerAligner(genome)
    expected = builtin.align({"r0": reads[0].seq})

    # fake minimap2: reads the FASTA arg, emits SAM computed via the
    # builtin aligner (runs deepmod_tpu in a child python)
    import deepmod_tpu

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(deepmod_tpu.__file__)))
    ref_path = os.path.join(out, "ref.fa")
    shim = tmp_path / "minimap2"
    shim.write_text(f"""#!/usr/bin/env python
import sys
sys.path.insert(0, {pkg_root!r})
from deepmod_tpu.io.fasta import read_fasta
from deepmod_tpu.align.aligner import MinimizerAligner
args = sys.argv[1:]
ref, fasta = args[-2], args[-1]
reads = read_fasta(fasta)
aligner = MinimizerAligner(read_fasta(ref))
print("@HD\\tVN:1.6")
for rec in aligner.align(reads):
    print("\\t".join([rec.qname, str(rec.flag), rec.rname, str(rec.pos),
                      str(rec.mapq), rec.cigar, "*", "0", "0", rec.seq, "*"]))
""")
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    ext = ExternalAligner(ref_path, "minimap2")
    got = ext.align({"r0": reads[0].seq})
    assert len(got) == len(expected) == 1
    assert got[0].pos == expected[0].pos
    assert got[0].cigar == expected[0].cigar
    assert got[0].strand == expected[0].strand


def test_feature_matrix_column_layout_matches_reference():
    """Pin the reference's column arithmetic (myDetect.py:894-900):
    one-hot at ABSOLUTE cols fnum-4..fnum-1, mean/stdv/length at
    fnum..fnum+2 — a +3 shift here once clobbered the C/G/T flags with
    the signal columns and went unnoticed because train and detect used
    the same (broken) layout."""
    import numpy as np

    from deepmod_tpu.align.cigar import expand_alignment
    from deepmod_tpu.features.builder import build_feature_matrix
    from deepmod_tpu.io.events import EVENT_DTYPE

    read = "ACGT" * 25
    for fnum in (7, 57):
        bmr = expand_alignment(
            read, read, 0, "100M", "+", "chrT", 100, min_events=0
        )
        m_event = np.zeros(100, EVENT_DTYPE)
        m_event["model_state"] = ["NN" + b + "NN" for b in read]
        m_event["mean"] = 5.25
        m_event["stdv"] = 0.5
        m_event["length"] = 7
        m_event["start"] = np.arange(100, dtype=np.uint64)
        mfeat, sc, ec = build_feature_matrix(
            m_event, np.full(200, 0.125), read, bmr, fnum=fnum
        )
        assert mfeat.shape[1] == fnum + 3
        pad = 100
        for i, base_idx in enumerate([0, 1, 2, 3]):  # A, C, G, T rows
            row = mfeat[pad + i]
            onehot = row[fnum - 4 : fnum]
            assert list(onehot) == [
                1.0 if j == base_idx else 0.0 for j in range(4)
            ], (fnum, i)
            assert row[fnum] == 5.25       # mean
            assert row[fnum + 1] == 0.5    # stdv
            assert row[fnum + 2] == 7.0    # length
        if fnum == 57:
            # histogram occupies cols 3..52: events cover signal 0.125
            # -> bin int((0.125+5)/0.2)=25 -> col 28
            assert mfeat[pad, 28] == 7.0
            assert mfeat[pad, 3:53].sum() == 7.0
