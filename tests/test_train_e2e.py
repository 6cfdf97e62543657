"""getfeatures + training end-to-end on synthetic modified/control data.

The positive dataset carries a real signal-level shift at CG motif sites,
so a model trained on the extracted features must separate the classes
(held-out AUC well above chance) — validating labels, windows, loss, and
the pjit data-parallel train step in one pass.
"""

import glob
import os

import numpy as np
import pytest

import jax

from deepmod_tpu.engine.getfeatures import GetFeaturesConfig, getfeatures_run
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset
from deepmod_tpu.train.loader import (
    TestSplit,
    find_feature_files,
    load_feature_file,
    read_ind_sidecar,
)
from deepmod_tpu.train.trainer import (
    TrainConfig,
    batch_metrics,
    predict_feature_files,
    train_run,
)


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("train_e2e"))
    genome_sizes = {"chrS": 15000}
    common = dict(
        genome_sizes=genome_sizes, num_reads=6, read_length=(700, 1100),
        sub_rate=0.002, ins_rate=0.001, del_rate=0.001,
    )
    mod_dir = os.path.join(base, "mod")
    ctl_dir = os.path.join(base, "ctl")
    # same genome (same seed ordering) but only 'mod' shifts CG signal
    generate_dataset(
        mod_dir,
        SynthConfig(seed=100, mod_motif="CG", mod_offset=0,
                    mod_level_shift=1.5, **common),
    )
    generate_dataset(ctl_dir, SynthConfig(seed=100, **common))
    return base, mod_dir, ctl_dir


@pytest.fixture(scope="module")
def features(datasets):
    base, mod_dir, ctl_dir = datasets
    results = {}
    for name, d, posneg in (("mod", mod_dir, 1), ("ctl", ctl_dir, 0)):
        config = GetFeaturesConfig(
            wrk_base=os.path.join(d, "fast5"),
            ref=os.path.join(d, "ref.fa"),
            out_folder=os.path.join(base, f"feat_{name}"),
            posneg=posneg,
            motif="CG",
            align_str="builtin",
            save_format="both",
        )
        results[name] = getfeatures_run(config)
    return base, results


def test_getfeatures_outputs(features):
    base, results = features
    for name in ("mod", "ctl"):
        res = results[name]
        assert res.num_reads > 0, res.errors
        assert res.num_rows > 0
        assert res.feature_files
        # sidecar exists and starts at row 0
        ind = read_ind_sidecar(res.feature_files[0])
        assert ind and ind[0][0] == 0
        # text format: %.3f columns, fnum+3 wide
        mat = np.loadtxt(res.feature_files[0], ndmin=2)
        assert mat.shape[1] == 10
        # labels present: mod sample has positives, ctl has negatives only
        if name == "mod":
            assert (mat[:, 2] == 1).sum() > 0
        else:
            assert (mat[:, 1] == 1).sum() > 0
            assert (mat[:, 2] == 1).sum() == 0


def test_text_and_binary_formats_agree(features):
    base, results = features
    gz = results["mod"].feature_files[0]
    npz = gz.replace(".xy.gz", ".xy.npz")
    a = np.loadtxt(gz, ndmin=2)
    b = np.load(npz)["xy"]
    np.testing.assert_allclose(a, b, atol=5e-4)  # %.3f text rounding


def test_gz_prefers_npz_sibling_and_agrees(features, tmp_path):
    """A .xy.gz with a binary twin loads the twin; (X, Y) identical to
    the text parse (the text is %.3f so float32 holds its exact values)."""
    import shutil

    base, results = features
    gz = results["mod"].feature_files[0]
    x_fast, y_fast = load_feature_file(gz, window_size=21)
    # a sibling-free copy forces the text path
    lone = tmp_path / "lone.xy.gz"
    shutil.copy(gz, lone)
    x_text, y_text = load_feature_file(str(lone), window_size=21)
    np.testing.assert_array_equal(x_fast, x_text)
    np.testing.assert_array_equal(y_fast, y_text)


def test_npz_pos_exact_past_float32(tmp_path):
    """Positions beyond 2^24 survive the binary format exactly (float32
    alone would corrupt them and break the E-mode split)."""
    from deepmod_tpu.train.loader import TestSplit

    rows = 60
    feat = np.zeros((rows, 10))
    feat[:, 0] = 2**25 + np.arange(rows)  # ~33.5 Mb positions
    feat[:, 1] = 1.0  # labeled
    feat[:, 3:] = 0.125
    np.savez_compressed(
        tmp_path / "big.xy.npz",
        xy=feat.astype(np.float32),
        pos=feat[:, 0].astype(np.int64),
    )
    split = TestSplit(mode="E", start=2**25 + 20, end=2**25 + 40)
    x, y = load_feature_file(
        str(tmp_path / "big.xy.npz"), window_size=21, split=split,
        for_test=True,
    )
    # exactly the 19 labeled rows strictly inside (start, end)
    assert len(x) == 19


def test_load_feature_file_windows(features):
    base, results = features
    x, y = load_feature_file(results["mod"].feature_files[0], window_size=21)
    assert x.shape[1:] == (21, 7)
    assert len(x) == len(y)
    assert set(np.unique(y)).issubset({0, 1})
    # one-hot labels
    assert (y.sum(axis=1) == 1).all()


def test_region_split(features):
    base, results = features
    path = results["mod"].feature_files[0]
    split = TestSplit.parse("E,0,1")  # exclude [0, 1Mb) -> everything
    x_train, y_train = load_feature_file(path, 21, split)
    x_test, y_test = load_feature_file(path, 21, split, for_test=True)
    x_all, y_all = load_feature_file(path, 21)
    assert len(y_train) == 0  # whole 15kb genome is inside the holdout
    assert len(y_test) == len(y_all)


def test_iterator_terminates_when_wrap_group_is_empty(features, tmp_path):
    """A wrap-enabled secondary group whose every file yields ZERO rows
    must not spin forever re-reading the same files
    (full-pass-without-progress guard)."""
    from deepmod_tpu.train.loader import iterate_training_batches

    base, results = features
    files = list(results["mod"].feature_files)
    # group 1's only file is an empty matrix: every wrap pass yields
    # zero rows, so without the guard load_until loops forever
    import gzip

    empty = str(tmp_path / "empty.xy.gz")
    with gzip.open(empty, "wb") as fh:
        fh.write(b"")
    steps = 0
    for batch in iterate_training_batches(
        [files, [empty]], batch_size=64, window_size=21
    ):
        steps += 1
        assert steps < 10_000
    assert steps > 0


def test_iterator_progress_reports_files(features):
    from deepmod_tpu.train.loader import iterate_training_batches

    base, results = features
    files = list(results["mod"].feature_files)
    progress = {}
    for _ in iterate_training_batches(
        [files], batch_size=64, window_size=21, progress=progress
    ):
        pass
    assert progress["files_consumed"] == len(files)


def test_p_split_test_files_are_complement(features, tmp_path):
    """P-mode: for_test=True returns exactly the files the train slice
    excludes (the reference never wired this side up)."""
    d = tmp_path / "pfiles"
    d.mkdir()
    names = []
    for i in range(10):
        p = d / f"f{i:02d}.xy.gz"
        p.write_bytes(b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03\x03\x00\x00\x00\x00\x00\x00\x00\x00\x00")
        names.append(str(p))
    split = TestSplit.parse("P,90")
    train = find_feature_files(str(d), False, split)
    test = find_feature_files(str(d), False, split, for_test=True)
    assert len(train) == 9 and len(test) == 1
    assert sorted(train + test) == sorted(names)
    assert not set(train) & set(test)


def test_training_learns_signal(features, tmp_path):
    base, results = features
    mod_files = find_feature_files(results["mod"].out_folder)
    ctl_files = find_feature_files(results["ctl"].out_folder)
    assert mod_files and ctl_files
    config = TrainConfig(
        out_folder=str(tmp_path / "train_out"),
        fnum=7,
        hidden=32,
        epochs=6,
        batch_size=128,
        learning_rate=3e-3,
        log_every=10,
        seed=1,
    )
    params, model_config, history = train_run([mod_files, ctl_files], config)
    assert history, "no training steps ran"
    # evaluate on a balanced held-out batch assembled from both classes
    xs, ys = [], []
    for f in mod_files + ctl_files:
        x, y = load_feature_file(f, 21)
        xs.append(x)
        ys.append(y)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    m = batch_metrics(params, model_config, x, y)
    assert m["auc"] > 0.8, m
    # checkpoints written per epoch
    assert os.path.isfile(str(tmp_path / "train_out" / "6" / "mod.npz"))
    # standalone prediction tool
    out_txt = str(tmp_path / "pred.txt")
    res = predict_feature_files(
        params, model_config, mod_files, out_txt, batch_size=256
    )
    assert res and os.path.isfile(out_txt)
    line = open(out_txt).readline()
    assert line.startswith("tp=")


def test_getfeatures_position_files(datasets, tmp_path):
    """motifORPos=2: labels from fulmod/anymod/nomod position files."""
    base, mod_dir, ctl_dir = datasets
    from deepmod_tpu.features.labels import scan_motif
    from deepmod_tpu.io.fasta import read_fasta

    genome = read_fasta(os.path.join(mod_dir, "ref.fa"))
    fulmod, _ = scan_motif(genome, "CG", 0)
    # write position files from the motif scan (simulating bisulfite truth)
    fulmod_path = str(tmp_path / "fulmod.txt")
    nomod_path = str(tmp_path / "nomod.txt")
    with open(fulmod_path, "w") as fm, open(nomod_path, "w") as nm:
        for chrom, keys in fulmod.items():
            for strand, pos in sorted(keys):
                if pos % 3 == 0:
                    fm.write(f"{chrom} {strand} {pos}\n")
                else:
                    nm.write(f"{chrom} {strand} {pos}\n")
    config = GetFeaturesConfig(
        wrk_base=os.path.join(mod_dir, "fast5"),
        ref=os.path.join(mod_dir, "ref.fa"),
        out_folder=str(tmp_path / "feat_pos"),
        posneg=1,
        motif_or_pos=2,
        fulmod_pattern=fulmod_path,
        nomod_pattern=nomod_path,
        anymod_pattern=None,
        motif="CG",
        align_str="builtin",
        save_format="npz",
    )
    res = getfeatures_run(config)
    assert res.num_reads > 0, res.errors
    x, y = load_feature_file(res.feature_files[0], 21)
    assert len(y) > 0
    # with a nomod list, negatives are restricted to listed positions:
    # both classes should be present but fewer rows than motif-mode
    assert (y[:, 1] == 1).sum() > 0
    assert (y[:, 0] == 1).sum() > 0


def test_resume_continues_adam_state_bitwise(features, tmp_path):
    """Checkpoint -> resume must reproduce the uninterrupted run exactly:
    the .npz now carries the Adam moments + step count (the reference's
    Saver stores the <var>/Adam slots, myMultiBiRNN.py:89; its --modfile
    resume never worked at all)."""
    import jax

    from deepmod_tpu.models.tf_import import load_adam_state, load_bilstm_npz

    base, results = features
    mod_files = find_feature_files(results["mod"].out_folder)
    ctl_files = find_feature_files(results["ctl"].out_folder)
    common = dict(
        fnum=7, hidden=16, batch_size=128, learning_rate=3e-3,
        log_every=1, seed=3,
    )

    # uninterrupted: 2 epochs
    full_cfg = TrainConfig(
        out_folder=str(tmp_path / "full"), epochs=2, **common
    )
    full_params, _, _ = train_run([mod_files, ctl_files], full_cfg)

    # interrupted: 1 epoch, then resume from the epoch checkpoint
    part_cfg = TrainConfig(
        out_folder=str(tmp_path / "part"), epochs=1, **common
    )
    train_run([mod_files, ctl_files], part_cfg)
    ckpt = str(tmp_path / "part" / "1" / "mod.npz")
    assert os.path.isfile(ckpt)
    ck_params, _ = load_bilstm_npz(ckpt)

    # the checkpoint carries restorable Adam slots
    import optax

    opt = optax.adam(3e-3, b1=0.9, b2=0.999, eps=1e-8)
    st = load_adam_state(ckpt, opt, ck_params)
    assert st is not None
    assert int(st[0].count) > 0

    resume_cfg = TrainConfig(
        out_folder=str(tmp_path / "resume"), epochs=1, **common
    )
    res_params, _, _ = train_run(
        [mod_files, ctl_files], resume_cfg,
        init_params=ck_params, resume_opt_from=ckpt,
    )

    flat_full = jax.tree_util.tree_leaves(full_params)
    flat_res = jax.tree_util.tree_leaves(res_params)
    assert len(flat_full) == len(flat_res)
    for a, b in zip(flat_full, flat_res):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # params-only checkpoints (pre-slot format) degrade gracefully
    from deepmod_tpu.models.bilstm import BiLSTMConfig as BC
    from deepmod_tpu.models.tf_import import save_bilstm_npz

    legacy = str(tmp_path / "legacy.npz")
    save_bilstm_npz(
        legacy, ck_params,
        BC(num_input=7, num_hidden=16, timesteps=21),
    )
    assert load_adam_state(legacy, opt, ck_params) is None
