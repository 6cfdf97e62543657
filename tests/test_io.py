"""IO layer tests: fasta, event collapse, signal norm, fast5 round trip."""

import numpy as np
import pytest

from deepmod_tpu.io.events import (
    EVENT_DTYPE,
    EventError,
    collapse_events_v1,
    collapse_events_v2,
    move_table_events,
)
from deepmod_tpu.io.fasta import FastaReference, read_fasta, write_fasta
from deepmod_tpu.io.signal_norm import event_mean_std, normalize_signal
from deepmod_tpu.io.fast5 import Fast5ReadOptions, read_fast5_batch, read_fast5_file
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset
from deepmod_tpu.utils import ErrorCensus


# ------------------------------------------------------------------ fasta


def test_fasta_round_trip(tmp_path):
    seqs = {"chr1": "ACGT" * 100, "chr2": "GGCC" * 55}
    path = str(tmp_path / "ref.fa")
    write_fasta(path, seqs, width=37)
    assert read_fasta(path) == seqs
    ref = FastaReference(path)
    assert ref.names() == ["chr1", "chr2"]
    assert ref.length("chr2") == 220
    assert ref.fetch("chr1") == seqs["chr1"]
    assert ref.fetch_region("chr2", 5, 15) == seqs["chr2"][5:15]
    # .fai written and reusable
    ref2 = FastaReference(path)
    assert ref2.fetch("chr2") == seqs["chr2"]


def test_fasta_lowercase_uppercased(tmp_path):
    path = str(tmp_path / "lc.fa")
    with open(path, "w") as fh:
        fh.write(">c\nacgtACGT\n")
    assert read_fasta(path)["c"] == "ACGTACGT"
    assert FastaReference(path).fetch("c") == "ACGTACGT"


# ----------------------------------------------------------------- events


def _v2_events(states, moves, lengths, start0=10):
    starts = start0 + np.concatenate([[0], np.cumsum(lengths[:-1])])
    ev = np.zeros(
        len(states),
        dtype=[("mean", "<f8"), ("stdv", "<f8"), ("start", "<u8"),
               ("length", "<u8"), ("model_state", "S5"), ("move", "<i8")],
    )
    ev["model_state"] = [s.encode() for s in states]
    ev["move"] = moves
    ev["start"] = starts
    ev["length"] = lengths
    ev["mean"] = np.arange(len(states), dtype=float)
    return ev


def test_collapse_v2_stays_merge():
    states = ["NNACG", "NACGT", "NACGT", "ACGTA"]
    moves = [1, 1, 0, 1]
    lengths = np.array([4, 6, 5, 7], np.int64)
    ev = _v2_events(states, moves, lengths)
    m_event, skip = collapse_events_v2(ev)
    assert skip == (0, 0)
    assert len(m_event) == 3
    # stay's 5 samples merged into the second event
    np.testing.assert_array_equal(m_event["length"], [4, 11, 7])
    np.testing.assert_array_equal(m_event["start"], [10, 14, 25])
    assert m_event["model_state"][1] == "NACGT"


def test_collapse_v1_seconds_to_samples():
    # v1: starts in seconds, sampling_rate converts; no gaps here
    rate = 1000.0
    lengths_sec = np.full(30, 0.005)
    starts_sec = 0.1 + np.concatenate([[0], np.cumsum(lengths_sec[:-1])])
    ev = np.zeros(
        30,
        dtype=[("mean", "<f8"), ("stdv", "<f8"), ("start", "<f8"),
               ("length", "<f8"), ("model_state", "S5"), ("move", "<i8")],
    )
    ev["start"] = starts_sec
    ev["length"] = lengths_sec
    ev["move"] = 1
    ev["model_state"] = b"AACGT"
    ev["mean"] = 1.5
    m_event, skip = collapse_events_v1(ev, rate, raw_start_time=100)
    assert skip == (0, 0)
    assert len(m_event) == 30
    assert m_event["start"][0] == 0  # 0.1*1000 - 100
    np.testing.assert_array_equal(m_event["length"], np.full(30, 5))
    # consecutive: each start = prev start + prev length
    np.testing.assert_array_equal(
        m_event["start"][1:], m_event["start"][:-1] + m_event["length"][:-1]
    )


def test_collapse_v1_rejects_all_stays():
    ev = np.zeros(
        30,
        dtype=[("mean", "<f8"), ("stdv", "<f8"), ("start", "<f8"),
               ("length", "<f8"), ("model_state", "S5"), ("move", "<i8")],
    )
    ev["move"] = 0
    with pytest.raises(EventError):
        collapse_events_v1(ev, 1000.0, 0)


def test_move_table_events():
    fq = "ACGTACGTAC"
    # moves at stride 2: move[i]==1 ends a base at sample 2*i+first
    move = np.zeros(40, np.int64)
    boundaries = [3, 7, 11, 15, 19, 23, 27, 31, 35]
    for b in boundaries:
        move[b] = 1
    rng = np.random.RandomState(0)
    sig = rng.normal(0, 1, 100).astype(np.float32)
    m_event, _ = move_table_events(move, sig, fq, first_sample_template=4)
    assert len(m_event) == len(boundaries) + 1
    assert m_event["start"][0] == 4
    assert m_event["model_state"][0] == "NNACG"
    assert m_event["model_state"][1] == "NACGT"
    # middle kmers are plain 5-mers
    assert m_event["model_state"][4] == fq[2:7]


# ------------------------------------------------------------ signal norm


def test_normalize_signal_properties():
    rng = np.random.RandomState(1)
    raw = rng.normal(500, 40, 5000)
    out = normalize_signal(raw, 100, 4900)
    span = out[100:4900]
    assert abs(np.median(span)) < 0.05
    # winsorized at 5 MAD
    med = np.median(span)
    mad = np.median(np.abs(span - med))
    assert span.max() <= med + 5 * mad + 1e-9 + 0.001
    # rounded to 3 decimals
    assert np.allclose(out, np.round(out, 3))


def test_event_mean_std_matches_naive():
    rng = np.random.RandomState(2)
    raw = np.round(rng.normal(0, 1, 1000), 3)
    m_event = np.zeros(50, EVENT_DTYPE)
    starts = np.sort(rng.choice(900, 50, replace=False))
    m_event["start"] = starts
    m_event["length"] = rng.randint(3, 12, 50)
    out, n = event_mean_std(m_event.copy(), raw)
    assert n == 50
    for i in range(50):
        s, ln = int(starts[i]), int(m_event["length"][i])
        seg = raw[s : s + ln]
        # the LITERAL reference arithmetic (myDetect.py:342-343):
        # round(np.float64, 3) is numpy's scale-rint-unscale __round__,
        # and np.mean's pairwise summation decides exact .0005 ties —
        # both must match bit-for-bit
        assert out["mean"][i] == np.float32(round(np.mean(seg), 3))
        assert out["stdv"][i] == np.float32(round(np.std(seg), 3))


def test_event_mean_std_out_of_range_truncates():
    raw = np.zeros(1002)
    m_event = np.zeros(600, EVENT_DTYPE)
    m_event["start"] = np.arange(600) * 2  # first empty slice at i=501
    m_event["length"] = 1
    out, n = event_mean_std(m_event, raw)
    assert n == 500  # truncated to i-1 events at first empty slice i=501
    # (the i>500 rule, myDetect.py:337-339)


def test_event_mean_std_out_of_range_early_rejects():
    from deepmod_tpu.io.signal_norm import SignalRangeError

    raw = np.zeros(100)
    m_event = np.zeros(600, EVENT_DTYPE)
    m_event["start"] = np.arange(600)
    m_event["length"] = 1
    with pytest.raises(SignalRangeError):
        event_mean_std(m_event, raw)


# ------------------------------------------------------------------ fast5


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    config = SynthConfig(
        genome_sizes={"chrS": 20000}, num_reads=4, read_length=(800, 1200),
        seed=5,
    )
    genome, reads = generate_dataset(out, config)
    return out, genome, reads


def test_fast5_round_trip(synth_dataset):
    out, genome, reads = synth_dataset
    r0 = reads[0]
    read = read_fast5_file(r0.path)
    assert read.read_id == r0.read_id
    # stays collapse back to the original basecall
    assert read.basecall == r0.seq
    assert len(read.m_event) == len(r0.seq)
    # events tile the signal contiguously
    ev = read.m_event
    np.testing.assert_array_equal(
        ev["start"][1:], ev["start"][:-1] + ev["length"][:-1]
    )
    # normalized signal stats present
    assert np.isfinite(ev["mean"]).all()


def test_fast5_batch_error_census(synth_dataset, tmp_path):
    out, genome, reads = synth_dataset
    bogus = str(tmp_path / "missing.fast5")
    open(bogus, "wb").write(b"not hdf5")
    errors = ErrorCensus()
    result = read_fast5_batch([reads[0].path, bogus], errors=errors)
    assert reads[0].read_id in result
    assert errors.counts() == {"Cannot open fast5 or other errors": 1}


@pytest.mark.parametrize("style,move_opt", [("v1", False), ("move", True)])
def test_fast5_styles_round_trip(tmp_path, style, move_opt):
    """Albacore-v1 (second-based starts) and guppy move-table ingestion."""
    from deepmod_tpu.testing.synthetic import generate_dataset as gen

    out = str(tmp_path / style)
    genome, reads = gen(
        out,
        SynthConfig(
            genome_sizes={"chrX": 6000}, num_reads=2,
            read_length=(400, 600), seed=13, fast5_style=style,
        ),
    )
    opts = Fast5ReadOptions(move=move_opt)
    read = read_fast5_file(reads[0].path, opts)
    assert read.basecall == reads[0].seq
    assert len(read.m_event) == len(reads[0].seq)
    assert np.isfinite(read.m_event["mean"]).all()


def test_resegment_events_rundif():
    """'rundif' re-segmentation: every base keeps >=4 samples and events
    tile the signal contiguously (EventTable.py:21-108 semantics)."""
    from deepmod_tpu.io.events import resegment_events

    rng = np.random.RandomState(4)
    n_bases = 40
    # events with moves, some multi-base moves
    lengths = rng.randint(8, 20, n_bases)
    starts = 50 + np.concatenate([[0], np.cumsum(lengths[:-1])])
    moves = np.ones(n_bases, np.int64)
    moves[5] = 2   # a double move
    fq = "".join(rng.choice(list("ACGT"), n_bases + 3))
    sig = rng.normal(500, 30, int(starts[-1] + lengths[-1] + 50)).astype(np.float64)
    ev = np.zeros(
        n_bases,
        dtype=[("mean", "<f8"), ("stdv", "<f8"), ("start", "<u8"),
               ("length", "<u8"), ("model_state", "S5"), ("move", "<i8")],
    )
    ev["start"] = starts
    ev["length"] = lengths
    ev["move"] = moves
    m_event, skip = resegment_events(ev, sig, fq)
    assert skip == (0, 0)
    # contiguous tiling
    np.testing.assert_array_equal(
        m_event["start"][1:], m_event["start"][:-1] + m_event["length"][:-1]
    )
    # min signal per base respected
    assert int(m_event["length"].min()) >= 2  # after halving repair
    assert m_event["start"][0] == starts[0]


def test_fast5_rundif_signal_group(tmp_path):
    """--SignalGroup rundif re-segments v2 events at ingestion."""
    out = str(tmp_path / "rd")
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrX": 6000}, num_reads=1,
                    read_length=(400, 600), seed=19, stay_rate=0.0),
    )
    opts = Fast5ReadOptions(signal_group="rundif")
    read = read_fast5_file(reads[0].path, opts)
    assert len(read.basecall) > 0
    ev = read.m_event
    np.testing.assert_array_equal(
        ev["start"][1:], ev["start"][:-1] + ev["length"][:-1]
    )
