"""Native C++ core vs numpy reference parity.

The library is built on demand here; if the toolchain is unavailable the
tests skip (every native path has a numpy twin that the rest of the suite
exercises).
"""

import numpy as np
import pytest

from deepmod_tpu.native.lib import (
    build_native,
    event_stats_native,
    global_align_ops_native,
    minimizers_native,
    native_available,
    normalize_signal_native,
)

pytestmark = pytest.mark.skipif(
    not (native_available() or build_native()),
    reason="native toolchain unavailable",
)


def test_event_stats_matches_numpy():
    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.io.signal_norm import event_mean_std

    rng = np.random.RandomState(0)
    raw = np.round(rng.normal(0, 1.2, 5000), 3)
    m_event = np.zeros(200, EVENT_DTYPE)
    starts = np.sort(rng.choice(4900, 200, replace=False))
    m_event["start"] = starts
    m_event["length"] = rng.randint(3, 15, 200)
    want, n_want = event_mean_std(m_event.copy(), raw)
    means, stds, n = event_stats_native(
        raw, m_event["start"], m_event["length"]
    )
    assert n == n_want
    np.testing.assert_array_equal(means, want["mean"])
    np.testing.assert_array_equal(stds, want["stdv"])


def test_event_stats_stdv_half_milli_tie():
    """Exact half-milli stdv tie: two samples 0.005 apart give
    var = 6.25e-6, sqrt = 2.5 milli — the C++ twin must apply numpy's
    np.round(x, 3) operation sequence (rint half-even after the
    /1000*1000 round trip), not std::round's half-away."""
    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.io.signal_norm import event_mean_std

    raw = np.asarray([0.100, 0.105] * 8, np.float64)
    m_event = np.zeros(8, EVENT_DTYPE)
    m_event["start"] = np.arange(8) * 2
    m_event["length"] = 2
    want, n_want = event_mean_std(m_event.copy(), raw)
    means, stds, n = event_stats_native(
        raw, m_event["start"], m_event["length"]
    )
    assert n == n_want
    np.testing.assert_array_equal(means, want["mean"])
    np.testing.assert_array_equal(stds, want["stdv"])


@pytest.mark.parametrize("span", [(50, 7900), (50, 7901)])  # even, odd
def test_normalize_matches_numpy(span):
    from deepmod_tpu.io.signal_norm import normalize_signal

    rng = np.random.RandomState(1)
    raw = rng.normal(480, 35, 8000)
    lo, hi = span
    want = normalize_signal(raw, lo, hi)
    got = normalize_signal_native(raw, lo, hi)
    np.testing.assert_array_equal(got, want)


def test_fused_normalize_event_stats_matches_two_step():
    """The fused native pass == normalize_signal then event_mean_std,
    bit-for-bit on both the signal and the event moments."""
    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.io.signal_norm import (
        event_mean_std,
        normalize_and_event_stats,
        normalize_signal,
    )
    from deepmod_tpu.native.lib import normalize_event_stats_native

    rng = np.random.RandomState(7)
    raw = rng.normal(480, 35, 9000)
    m_event = np.zeros(300, EVENT_DTYPE)
    starts = np.sort(rng.choice(np.arange(40, 8800), 300, replace=False))
    m_event["start"] = starts
    m_event["length"] = rng.randint(3, 15, 300)
    span_start = int(starts[0])
    span_end = int(starts[-1] + m_event["length"][-1])

    want_sig = normalize_signal(raw, span_start, span_end)
    want_ev, n_want = event_mean_std(m_event.copy(), want_sig)

    got = normalize_event_stats_native(
        raw, span_start, span_end, m_event["start"], m_event["length"]
    )
    assert got is not None
    sig, means, stds, n = got
    assert n == n_want
    np.testing.assert_array_equal(sig, want_sig)
    np.testing.assert_array_equal(means[:n], want_ev["mean"])
    np.testing.assert_array_equal(stds[:n], want_ev["stdv"])

    # the dispatcher returns the same triple
    sig2, ev2, n2 = normalize_and_event_stats(
        m_event.copy(), raw, span_start, span_end
    )
    assert n2 == n_want
    np.testing.assert_array_equal(sig2, want_sig)
    np.testing.assert_array_equal(ev2["mean"], want_ev["mean"])
    np.testing.assert_array_equal(ev2["stdv"], want_ev["stdv"])


@pytest.mark.parametrize("span", [(50, 8551), (50, 8550)])  # odd, even
def test_normalize_integer_fast_path_matches_numpy(span):
    """Integer DAC-valued signals take the native histogram/analytic
    statistics path; it must be bit-identical to the numpy algorithm
    (which materializes all four medians) for odd AND even span sizes."""
    from deepmod_tpu.io.signal_norm import normalize_signal

    rng = np.random.RandomState(9)
    raw = rng.randint(120, 900, 9000).astype(np.float64)
    lo, hi = span
    want = normalize_signal(raw, lo, hi)
    got = normalize_signal_native(raw, lo, hi)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_span", [701, 700])  # odd, even
def test_fused_integer_fast_path_matches_two_step(n_span):
    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.io.signal_norm import event_mean_std, normalize_signal
    from deepmod_tpu.native.lib import normalize_event_stats_native

    rng = np.random.RandomState(10)
    raw = rng.randint(-200, 1200, 4000).astype(np.float64)
    m_event = np.zeros(100, EVENT_DTYPE)
    starts = np.sort(rng.choice(np.arange(100, 100 + n_span - 20), 100,
                                replace=False))
    m_event["start"] = starts
    m_event["length"] = rng.randint(2, 12, 100)
    span_start, span_end = 100, 100 + n_span
    want_sig = normalize_signal(raw, span_start, span_end)
    want_ev, n_want = event_mean_std(m_event.copy(), want_sig)
    got = normalize_event_stats_native(
        raw, span_start, span_end, m_event["start"], m_event["length"]
    )
    sig, means, stds, n = got
    assert n == n_want
    np.testing.assert_array_equal(sig, want_sig)
    np.testing.assert_array_equal(means[:n], want_ev["mean"])
    np.testing.assert_array_equal(stds[:n], want_ev["stdv"])


def test_normalize_native_adversarial_edges():
    """Degenerate and hostile spans: every fast-path guard (histogram
    reject, TwoSum inexactness, zero scale) must land on a path that
    still bit-matches numpy (NaNs compared positionally)."""
    from deepmod_tpu.io.signal_norm import normalize_signal

    rng = np.random.RandomState(3)
    cases = [
        np.full(1000, 7.0),                       # scale 0 -> NaN path
        np.where(rng.rand(1001) < 0.5, 3.0, 4.0),  # two-valued
        rng.randint(10**7, 10**7 + 30, 999).astype(np.float64),
        np.concatenate(                           # histogram-width reject
            [[0.0], [3e6], rng.randint(100, 200, 998).astype(np.float64)]
        ),
        rng.normal(0, 1e-300, 1000),              # denormal-ish floats
        np.concatenate(                           # TwoSum-inexact midpoints
            [rng.normal(1e9, 1, 500), rng.normal(1e-9, 1e-12, 500)]
        ),
        rng.randint(-500, -100, 777).astype(np.float64),
        np.asarray([5.0, 6.0, 7.0]),              # tiny span
    ]
    for raw in cases:
        raw = np.asarray(raw, np.float64)
        for span in [(0, len(raw)), (0, len(raw) - 1), (1, len(raw))]:
            want = normalize_signal(raw.copy(), *span)
            got = normalize_signal_native(raw.copy(), *span)
            both_nan = np.isnan(want) & np.isnan(got)
            np.testing.assert_array_equal(got[~both_nan], want[~both_nan])


def test_fused_normalize_event_stats_truncation_and_reject():
    """Empty slice at index > 500 truncates to i-1; at <= 500 rejects."""
    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.io.signal_norm import (
        SignalRangeError,
        normalize_and_event_stats,
    )

    rng = np.random.RandomState(8)
    raw = rng.normal(480, 35, 4000)
    m_event = np.zeros(600, EVENT_DTYPE)
    m_event["start"] = np.arange(600) * 6
    m_event["length"] = 6
    m_event["length"][550] = 0  # empty slice past index 500 -> truncate
    _, ev, n = normalize_and_event_stats(m_event.copy(), raw.copy(), 0, 3600)
    assert n == 549 and len(ev) == 549

    m_event["length"][550] = 6
    m_event["length"][10] = 0  # empty slice at index <= 500 -> reject
    with pytest.raises(SignalRangeError):
        normalize_and_event_stats(m_event.copy(), raw.copy(), 0, 3600)


def test_global_align_matches_numpy():
    from deepmod_tpu.align import dp

    rng = np.random.RandomState(2)
    bases = np.array(list("ACGT"))
    for _ in range(30):
        a = "".join(rng.choice(bases, rng.randint(0, 40)))
        b = "".join(rng.choice(bases, rng.randint(0, 40)))
        native = global_align_ops_native(a, b)
        # force the numpy path by bypassing the dispatcher
        saved = dp._native_align
        dp._native_align = None
        try:
            ref = dp.global_align_ops(a, b)
        finally:
            dp._native_align = saved
        assert native == ref, (a, b)


def test_minimizers_match_numpy():
    from deepmod_tpu.align import minimizer as mz

    rng = np.random.RandomState(3)
    seq = "".join(rng.choice(list("ACGT"), 5000))
    seq = seq[:1000] + "N" * 7 + seq[1000:]  # N handling
    native_pos, native_hash = minimizers_native(seq, 15, 10)
    saved = mz._native_minimizers
    mz._native_minimizers = None
    try:
        ref_pos, ref_hash = mz._minimizers(seq, 15, 10)
    finally:
        mz._native_minimizers = saved
    np.testing.assert_array_equal(native_pos, ref_pos)
    np.testing.assert_array_equal(native_hash, ref_hash)


def test_format_matrix_f3_matches_savetxt():
    """Native %.3f formatting == np.savetxt byte-for-byte, including
    negative zeros, ties, huge ints, and non-milli values."""
    import gzip as gz
    import io as iomod

    from deepmod_tpu.native.lib import format_matrix_f3_native

    rng = np.random.RandomState(6)
    adversarial = np.asarray([
        0.0, -0.0, -0.0004, 0.0004, 0.0005, -0.0005, 0.0015, -0.0015,
        1.0005, 2.0005, -1.0005, 123456789.0, -123456789.0,
        1e15, -1e15, 1.23e16, 0.123, -0.123, 999.9995, -999.9995,
    ])
    mats = [
        np.round(rng.normal(0, 3, (40, 5)), 3),
        rng.normal(0, 3, (40, 5)),                     # non-milli values
        np.concatenate([adversarial, rng.normal(0, 1, 20)]).reshape(8, 5),
        np.arange(30, dtype=np.float64).reshape(6, 5) * 2**22,
    ]
    for m in mats:
        got = format_matrix_f3_native(m)
        assert got is not None
        sio = iomod.StringIO()
        np.savetxt(sio, m, fmt="%.3f")
        assert bytes(got).decode() == sio.getvalue()


def test_write_xy_gz_matches_savetxt(tmp_path):
    """The flusher's gzip writer decodes to exactly what savetxt wrote."""
    import gzip as gz

    from deepmod_tpu.engine.getfeatures import _FeatureFlusher

    rng = np.random.RandomState(7)
    feat = np.round(rng.normal(0, 2, (500, 10)), 3)
    feat[:, 0] = np.arange(500) + 2**25
    _FeatureFlusher._write_xy_gz(str(tmp_path / "a.xy.gz"), feat)
    np.savetxt(str(tmp_path / "b.xy.gz"), feat, fmt="%.3f")
    with gz.open(tmp_path / "a.xy.gz") as fa, gz.open(tmp_path / "b.xy.gz") as fb:
        assert fa.read() == fb.read()


def test_hash_index_matches_searchsorted():
    """Native open-addressing lookup == the two-searchsorted ragged
    expansion, including the first-max_hits cap and hit order."""
    from deepmod_tpu.align.minimizer import MinimizerIndex

    rng = np.random.RandomState(5)
    genome = {
        "a": "".join(rng.choice(list("ACGT"), 30000)),
        "b": "".join(rng.choice(list("ACGT"), 12000)),
    }
    idx = MinimizerIndex(genome, max_hits=3)
    assert idx._table is not None
    queries = np.concatenate([
        idx._hashes[rng.randint(0, len(idx._hashes), 500)],  # present
        rng.randint(0, 2**63, 200).astype(np.uint64),        # mostly absent
    ])
    got = idx.lookup(queries)
    idx._table = None  # force the searchsorted path
    want = idx.lookup(queries)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_native_aligner_end_to_end():
    """Aligner produces working chains with the native minimizer/DP core."""
    from deepmod_tpu.align.aligner import MinimizerAligner

    rng = np.random.RandomState(4)
    genome = {"chrN": "".join(rng.choice(list("ACGT"), 20000))}
    aligner = MinimizerAligner(genome)
    read = genome["chrN"][7000:8500]
    recs = aligner.align({"r": read})
    assert len(recs) == 1 and abs(recs[0].pos - 1 - 7000) <= 64


def test_native_chain_band_matches_python():
    """dmt_chain_band == the Python _best_chain per-rid logic, including
    negative diagonals, floor-division binning, and second-score groups."""
    import deepmod_tpu.align.minimizer as mz
    from deepmod_tpu.native.lib import chain_band_native

    if not pytest.importorskip("deepmod_tpu.native.lib").native_available():
        pytest.skip("native lib not built")
    rng = np.random.RandomState(11)
    for trial in range(40):
        n = rng.randint(1, 60)
        qpos = rng.randint(0, 3000, n).astype(np.int64)
        rpos = rng.randint(0, 3000, n).astype(np.int64)
        rid = np.zeros(n, np.int64)
        native = chain_band_native(qpos, rpos, 500)
        assert native is not None
        saved = mz._native_chain
        mz._native_chain = None
        try:
            chain = mz._best_chain(qpos, rid, rpos, "+")
        finally:
            mz._native_chain = saved
        keep_q, keep_r, second = native
        if chain is None:
            assert len(keep_q) == 0
            continue
        np.testing.assert_array_equal(keep_q, chain.anchors_q)
        np.testing.assert_array_equal(keep_r, chain.anchors_r)
        assert second == chain.second_score, trial


def test_native_align_multi_matches_per_segment():
    """One batched native call == per-segment global_align_ops."""
    from deepmod_tpu.align.dp import global_align_ops
    from deepmod_tpu.native.lib import global_align_multi_native, native_available

    if not native_available():
        pytest.skip("native lib not built")
    rng = np.random.RandomState(3)
    q = "".join(rng.choice(list("ACGT"), 800))
    r = "".join(rng.choice(list("ACGT"), 1200))
    segs = []
    for _ in range(25):
        qs = rng.randint(0, 700)
        qe = qs + rng.randint(0, 90)
        rs = rng.randint(0, 1100)
        re = rs + rng.randint(0, 90)
        segs.append((qs, qe, rs, re))
    got = global_align_multi_native(q.encode(), r.encode(), np.asarray(segs, np.int64))
    assert got is not None
    for (qs, qe, rs, re), ops in zip(segs, got):
        assert ops == global_align_ops(q[qs:qe], r[rs:re])
