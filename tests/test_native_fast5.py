"""Native (dlopen-libhdf5) fast5 reader parity with the h5py path."""

import numpy as np
import pytest

from deepmod_tpu.native.fast5_native import (
    native_fast5_available,
    read_fast5_native,
)

pytestmark = pytest.mark.skipif(
    not native_fast5_available(), reason="native fast5 reader unavailable"
)

from deepmod_tpu.io.fast5 import Fast5ReadOptions, read_fast5_file
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset


@pytest.mark.parametrize("style,move_opt", [("v2", False), ("v1", False),
                                            ("move", True)])
def test_native_reader_identical(tmp_path, style, move_opt):
    out = str(tmp_path / style)
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrN": 8000}, num_reads=2,
                    read_length=(500, 800), seed=29, fast5_style=style),
    )
    opts = Fast5ReadOptions(move=move_opt)
    for sim in reads:
        a = read_fast5_file(sim.path, opts)
        b = read_fast5_native(sim.path, opts)
        assert a.read_id == b.read_id
        assert a.basecall == b.basecall
        assert a.albacore_version == b.albacore_version
        np.testing.assert_array_equal(a.m_event["start"], b.m_event["start"])
        np.testing.assert_array_equal(a.m_event["length"], b.m_event["length"])
        np.testing.assert_array_equal(a.m_event["mean"], b.m_event["mean"])
        np.testing.assert_array_equal(a.m_event["stdv"], b.m_event["stdv"])
        if "model_state" in a.m_event.dtype.names:
            np.testing.assert_array_equal(
                a.m_event["model_state"], b.m_event["model_state"]
            )
        np.testing.assert_array_equal(a.raw_signals, b.raw_signals)


def test_native_batch_env_flag(tmp_path, monkeypatch):
    from deepmod_tpu.io.fast5 import read_fast5_batch

    out = str(tmp_path / "env")
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrN": 6000}, num_reads=2,
                    read_length=(400, 600), seed=31),
    )
    plain = read_fast5_batch([r.path for r in reads])
    monkeypatch.setenv("DMT_NATIVE_FAST5", "1")
    native = read_fast5_batch([r.path for r in reads])
    assert set(plain) == set(native)
    for rid in plain:
        assert plain[rid].basecall == native[rid].basecall
        np.testing.assert_array_equal(
            plain[rid].m_event["mean"], native[rid].m_event["mean"]
        )


def test_native_collapse_crafted_moves(tmp_path):
    """The C v2 collapse (dmt_f5_events_collapsed_v2) against the numpy
    collapse on move patterns the synthetic generator never emits:
    leading stays (move[0]==0), long stay runs, move values > 1."""
    import h5py

    out = str(tmp_path / "crafted")
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrN": 8000}, num_reads=3,
                    read_length=(500, 800), seed=41, fast5_style="v2"),
    )
    rng = np.random.RandomState(7)
    patterns = ["leading_stays", "long_runs", "multi_moves"]
    for sim, pattern in zip(reads, patterns):
        with h5py.File(sim.path, "r+") as fh:
            ev = fh["Analyses/Basecall_1D_000/BaseCalled_template/Events"][()]
            move = ev["move"].copy()
            if pattern == "leading_stays":
                move[:5] = 0
            elif pattern == "long_runs":
                # a 30-event stay run in the middle
                mid = len(move) // 2
                move[mid : mid + 30] = 0
            else:
                hits = rng.rand(len(move)) < 0.2
                move[hits] = rng.randint(2, 5, hits.sum())
                move[0] = 0  # combined: leading stay AND multi-moves
            ev["move"] = move
            del fh["Analyses/Basecall_1D_000/BaseCalled_template/Events"]
            fh.create_dataset(
                "Analyses/Basecall_1D_000/BaseCalled_template/Events",
                data=ev,
            )
        opts = Fast5ReadOptions()
        a = read_fast5_file(sim.path, opts)
        b = read_fast5_native(sim.path, opts)
        assert len(a.m_event) == len(b.m_event)
        for field in ("mean", "stdv", "start", "length", "model_state"):
            np.testing.assert_array_equal(
                a.m_event[field], b.m_event[field], err_msg=pattern
            )
        assert a.basecall == b.basecall
        assert a.left_right_skip == b.left_right_skip


def test_native_collapse_v1_crafted_gaps(tmp_path):
    """The C v1 collapse against the numpy collapse on gap patterns the
    synthetic generator never emits: >2-sample gaps (filler pseudo-event),
    1-2 sample gaps (length-merged), negative gaps (overlap), stay runs."""
    import h5py

    out = str(tmp_path / "v1crafted")
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrN": 8000}, num_reads=2,
                    read_length=(500, 800), seed=43, fast5_style="v1"),
    )
    rng = np.random.RandomState(9)
    for sim in reads:
        with h5py.File(sim.path, "r+") as fh:
            key = "Analyses/Basecall_1D_000/BaseCalled_template/Events"
            ev = fh[key][()]
            rate = fh["UniqueGlobalKey/channel_id"].attrs["sampling_rate"]
            start = ev["start"].copy()
            # bump a few event starts: +8 samples (gap>2 filler), +1.5
            # (merge branch), and leave the follower where it was (the
            # negative-gap branch fires on the next leader)
            n = len(start)
            bumped = [(n // 4, 8.0), (n // 2, 1.5), (3 * n // 4, 2.4)]
            for idx, bump in bumped:
                start[idx] = start[idx] + bump / float(rate)
            ev["start"] = start
            mv = ev["move"].copy()
            stays = rng.rand(n) < 0.3
            stays[0] = stays[-1] = False
            mv[stays] = 0
            for idx, _ in bumped:
                mv[idx] = 1  # bumped events must be leaders
            ev["move"] = mv
            del fh[key]
            fh.create_dataset(key, data=ev)
        opts = Fast5ReadOptions()
        a = read_fast5_file(sim.path, opts)
        b = read_fast5_native(sim.path, opts)
        assert len(a.m_event) == len(b.m_event)
        for field in ("mean", "stdv", "start", "length", "model_state"):
            np.testing.assert_array_equal(a.m_event[field], b.m_event[field])
        assert a.basecall == b.basecall
        assert a.left_right_skip == b.left_right_skip
        np.testing.assert_array_equal(a.raw_signals, b.raw_signals)
