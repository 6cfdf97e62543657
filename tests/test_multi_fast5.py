"""Multi-read fast5 ingestion (modern ONT container format).

Beyond the reference (its README.md:24 scopes it to single-read
Albacore outputs): one fast5 holding many read_<id> groups, each with
its own channel_id / Raw / Analyses subtree. Reads extracted from a
multi-read container must be identical to the same reads written as
single-read files.
"""

import glob
import os

import numpy as np
import pytest

from deepmod_tpu.io.fast5 import (
    ErrorCensus,
    Fast5ReadOptions,
    is_multi_read_fast5,
    read_fast5_batch,
    read_fast5_file,
    read_multi_fast5_file,
)
from deepmod_tpu.testing.synthetic import (
    SynthConfig,
    generate_dataset,
    simulate_read,
    write_multi_fast5,
    write_read_fast5,
)


def _write_pair(tmp_path, config, n=3):
    """Same reads as n single-read files AND one multi-read container."""
    rng = np.random.RandomState(7)
    genome = {"chrS": "".join(np.random.RandomState(1).choice(
        list("ACGT"), 20000))}
    reads = []
    for i in range(n):
        _, _, _, _, seq = simulate_read(rng, genome, config)
        reads.append((f"mread_{i}", seq))
    singles = []
    # identical rng streams so the signals match between the two layouts
    rng_a = np.random.RandomState(42)
    rng_b = np.random.RandomState(42)
    for rid, seq in reads:
        p = str(tmp_path / f"{rid}.fast5")
        write_read_fast5(p, rid, seq, rng_a, config)
        singles.append(p)
    multi = str(tmp_path / "container.fast5")
    write_multi_fast5(multi, reads, rng_b, config)
    return singles, multi, [r[0] for r in reads]


@pytest.mark.parametrize("style", ["v2", "v1", "move"])
def test_multi_matches_single(tmp_path, style):
    config = SynthConfig(fast5_style=style, read_length=(400, 600))
    singles, multi, ids = _write_pair(tmp_path, config)
    assert is_multi_read_fast5(multi)
    assert not is_multi_read_fast5(singles[0])

    opts = Fast5ReadOptions(move=(style == "move"))
    got = read_multi_fast5_file(multi, opts)
    assert sorted(got) == sorted(ids)
    for path, rid in zip(singles, ids):
        want = read_fast5_file(path, opts)
        have = got[rid]
        assert have.read_id == want.read_id
        assert have.basecall == want.basecall
        assert have.albacore_version == want.albacore_version
        np.testing.assert_array_equal(have.raw_signals, want.raw_signals)
        for field in want.m_event.dtype.names:
            np.testing.assert_array_equal(
                have.m_event[field], want.m_event[field]
            )


def test_batch_mixes_single_and_multi(tmp_path):
    config = SynthConfig(read_length=(400, 600))
    singles, multi, ids = _write_pair(tmp_path, config)
    extra_rng = np.random.RandomState(5)
    genome = {"chrS": "".join(np.random.RandomState(2).choice(
        list("ACGT"), 20000))}
    _, _, _, _, seq = simulate_read(extra_rng, genome, config)
    solo = str(tmp_path / "solo.fast5")
    write_read_fast5(solo, "solo_read", seq, extra_rng, config)

    errors = ErrorCensus()
    out = read_fast5_batch([multi, solo], Fast5ReadOptions(), errors)
    assert sorted(out) == sorted(ids + ["solo_read"])
    assert errors.total() == 0


def test_generate_dataset_multi(tmp_path):
    config = SynthConfig(
        num_reads=5, reads_per_file=2, read_length=(400, 600)
    )
    genome, reads = generate_dataset(str(tmp_path), config)
    files = sorted(glob.glob(os.path.join(str(tmp_path), "fast5", "*.fast5")))
    assert len(files) == 3  # 2 + 2 + 1
    assert all(os.path.basename(f).startswith("batch_") for f in files)
    out = read_fast5_batch(files, Fast5ReadOptions(), ErrorCensus())
    assert sorted(out) == sorted(r.read_id for r in reads)


def test_corrupt_read_group_censused(tmp_path):
    import h5py

    config = SynthConfig(read_length=(400, 600))
    _, multi, ids = _write_pair(tmp_path, config)
    with h5py.File(multi, "a") as fh:
        del fh[f"read_{ids[0]}/Analyses/Basecall_1D_000/"
               "BaseCalled_template/Fastq"]
    errors = ErrorCensus()
    got = read_multi_fast5_file(multi, Fast5ReadOptions(), errors)
    assert sorted(got) == sorted(ids[1:])
    assert errors.total() == 1


def test_detect_over_multi_read_containers(tmp_path):
    """Full detect over multi-read containers equals the same reads as
    single-read files (BED parity)."""
    import jax

    from deepmod_tpu.engine.detect import DetectConfig, detect_run
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import save_bilstm_npz

    from deepmod_tpu.testing.synthetic import repack_to_multi

    single = str(tmp_path / "single")
    genome, reads = generate_dataset(single, SynthConfig(
        genome_sizes={"chrM": 15000}, num_reads=4,
        read_length=(600, 1000), seed=23,
    ))
    # repack THE SAME reads into multi-read containers
    multi = str(tmp_path / "multi")
    os.makedirs(os.path.join(multi, "fast5"))
    import shutil
    shutil.copy(os.path.join(single, "ref.fa"),
                os.path.join(multi, "ref.fa"))
    pairs = [(r.read_id, r.path) for r in reads]
    repack_to_multi(pairs[:2], os.path.join(multi, "fast5", "a.fast5"))
    repack_to_multi(pairs[2:], os.path.join(multi, "fast5", "b.fast5"))

    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    model_path = str(tmp_path / "model.npz")
    save_bilstm_npz(model_path, params, model_config)

    beds = {}
    for name, src in (("single", single), ("multi", multi)):
        res = detect_run(DetectConfig(
            wrk_base=os.path.join(src, "fast5"),
            ref=os.path.join(src, "ref.fa"),
            model_path=model_path,
            out_folder=os.path.join(src, "out"),
            align_str="builtin",
        ))
        lines = []
        for bed in sorted(res.bed_files):
            with open(bed) as fh:
                lines.extend(sorted(fh))
        beds[name] = (res.num_reads, lines)

    assert beds["single"][0] == beds["multi"][0]
    assert beds["single"][1] == beds["multi"][1]
