"""Built-in aligner + CIGAR expansion tests on simulated mutated reads."""

import numpy as np
import pytest

from deepmod_tpu.align.aligner import MinimizerAligner
from deepmod_tpu.align.cigar import (
    AlignmentRejected,
    expand_alignment,
    parse_cigar,
)
from deepmod_tpu.align.dp import global_align_ops, merge_ops, ops_to_cigar
from deepmod_tpu.align.sam import SamRecord, filter_best_alignments, parse_sam_line
from deepmod_tpu.utils.common import reverse_complement

BASES = np.array(list("ACGT"))


def random_seq(rng, n):
    return "".join(rng.choice(BASES, n))


def mutate(rng, seq, sub=0.02, ins=0.01, dele=0.01):
    out = []
    for ch in seq:
        r = rng.rand()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(ch)
            out.append(str(rng.choice(BASES)))
            continue
        if r < dele + ins + sub:
            out.append(str(rng.choice([b for b in "ACGT" if b != ch])))
        else:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------- dp core


def test_global_align_exact():
    assert ops_to_cigar(merge_ops(global_align_ops("ACGT", "ACGT"))) == "4M"


def test_global_align_indels():
    ops = merge_ops(global_align_ops("ACGT", "ACGGT"))
    assert sum(n for op, n in ops if op in ("M", "I")) == 4   # read consumed
    assert sum(n for op, n in ops if op in ("M", "D")) == 5   # ref consumed
    assert any(op == "D" for op, _ in ops)


def test_global_align_empty_sides():
    assert global_align_ops("", "AAA") == [("D", 3)]
    assert global_align_ops("AAA", "") == [("I", 3)]


# ------------------------------------------------------------- sam filter


def test_filter_best_alignments():
    recs = [
        SamRecord("r1", 0, "chr1", 10, 30, "5M", "ACGTA"),
        SamRecord("r1", 0, "chr1", 99, 50, "5M", "ACGTA"),
        SamRecord("r2", 0, "*", 10, 50, "5M", "ACGTA"),      # rname *
        SamRecord("r3", 0, "chr1", 0, 50, "5M", "ACGTA"),    # pos 0
        SamRecord("r4", 0, "chr1", 10, 255, "5M", "ACGTA"),  # mapq 255
        SamRecord("r5", 0, "chr1", 10, 50, "*", "ACGTA"),    # cigar *
    ]
    best = filter_best_alignments(recs)
    assert set(best) == {"r1"}
    assert best["r1"].pos == 99


def test_parse_sam_line():
    line = "read1\t16\tchr2\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\t*"
    rec = parse_sam_line(line)
    assert rec.qname == "read1" and rec.strand == "-" and rec.pos == 100
    assert parse_sam_line("@SQ\tSN:chr1\tLN:1000") is None


# ---------------------------------------------------------------- aligner


@pytest.fixture(scope="module")
def genome():
    rng = np.random.RandomState(42)
    return {"chrT": random_seq(rng, 20000)}


@pytest.fixture(scope="module")
def aligner(genome):
    return MinimizerAligner(genome)


def test_align_exact_forward(genome, aligner):
    read = genome["chrT"][5000:6000]
    recs = aligner.align({"readA": read})
    assert len(recs) == 1
    rec = recs[0]
    assert rec.rname == "chrT" and rec.strand == "+"
    assert abs((rec.pos - 1) - 5000) <= 64
    nums, ops = parse_cigar(rec.cigar)
    consumed = nums[np.isin(ops, [0, 7, 8, 1, 4])].sum()  # M,=,X,I,S
    assert consumed == len(read)
    # attached pre-parsed runs must equal the string parse
    assert rec.cigar_arrays is not None
    np.testing.assert_array_equal(rec.cigar_arrays[0], nums)
    np.testing.assert_array_equal(rec.cigar_arrays[1], ops)


def test_align_reverse_strand(genome, aligner):
    read = reverse_complement(genome["chrT"][8000:9000])
    recs = aligner.align({"readR": read})
    assert len(recs) == 1
    assert recs[0].strand == "-"
    assert abs((recs[0].pos - 1) - 8000) <= 64
    # SAM seq column holds the reference-forward orientation
    assert recs[0].seq == reverse_complement(read)


def test_align_mutated_reads(genome, aligner):
    rng = np.random.RandomState(7)
    for start in (1000, 4000, 12000):
        read = mutate(rng, genome["chrT"][start : start + 1500])
        recs = aligner.align({"m": read})
        assert len(recs) == 1
        assert abs((recs[0].pos - 1) - start) <= 80


def test_align_random_read_unmapped(aligner):
    rng = np.random.RandomState(3)
    junk = random_seq(rng, 500)
    assert aligner.align({"junk": junk}) == []


# --------------------------------------------------------- cigar expansion


def test_expand_exact_match(genome):
    ref = genome["chrT"]
    read = ref[100:300]
    res = expand_alignment(ref, read, 100, "200M", "+", "chrT", 200, min_events=50)
    assert len(res.base_map) == 200
    assert res.num_mismatch == 0 and res.num_insert == 0 and res.num_del == 0
    np.testing.assert_array_equal(
        res.base_map["refbasei"], np.arange(100, 300, dtype=np.uint64)
    )
    assert (res.base_map["refbase"] == res.base_map["readbase"]).all()
    assert res.event_slice == (0, 200)


def test_expand_with_indels_and_clips(genome):
    ref = genome["chrT"]
    # read: 5S clip, 50M, 2I, 48M, 3D, 100M
    seg1 = ref[500:550]
    ins = "AA"
    seg2 = ref[550:598]
    seg3 = ref[601:701]
    read = "GGGGG" + seg1 + ins + seg2 + seg3
    cigar = "5S50M2I48M3D100M"
    num_events = len(read)
    res = expand_alignment(ref, read, 500, cigar, "+", "chrT", num_events)
    assert res.num_insert == 2 and res.num_del == 3
    # deletion rows have '-' readbase
    dele = res.base_map[res.base_map["readbase"] == "-"]
    assert len(dele) == 3
    np.testing.assert_array_equal(
        dele["refbasei"], np.arange(598, 601, dtype=np.uint64)
    )
    # left soft clip counted into left_clip
    assert res.left_clip == 5


def test_expand_minus_strand_complement(genome):
    ref = genome["chrT"]
    read = ref[1000:1200]
    res = expand_alignment(ref, read, 1000, "200M", "-", "chrT", 200)
    # flipped: first row corresponds to the LAST reference base, complemented
    from deepmod_tpu.utils.common import complement_base

    assert res.base_map["refbasei"][0] == 1199
    assert res.base_map["refbase"][0] == complement_base(ref[1199])
    assert res.base_map["refbasei"][-1] == 1000


def test_expand_rejects_short_events(genome):
    ref = genome["chrT"]
    read = ref[100:130]
    with pytest.raises(AlignmentRejected, match="Less Event"):
        expand_alignment(ref, read, 100, "30M", "+", "chrT", 30, min_events=50)


def test_expand_cpg_swap():
    #   ref:  A C C G T        read: A C - G T   (CCG / C-G pattern)
    ref = "ACCGT"
    read = "ACGT"
    res = expand_alignment(ref, read, 0, "2M1D2M", "+", "chrT", 100, min_events=1)
    # rows: (A,A)(C,C)(C,-)(G,G)(T,T). The reference's backward G/G pass
    # (myDetect.py:691-700) fires at the (G,G) row: the preceding (C,-) row
    # and the (C,C) row two back swap their read bases so the read C sits on
    # the CpG C adjacent to G -> read column becomes A - C G T.
    assert "".join(res.base_map["readbase"]) == "A-CGT"


def test_expand_cpg_swap_fires():
    # ref C G G, read C - G  with following G matching: swap moves the gap
    ref = "ACGGT"
    read = "ACGT"
    res = expand_alignment(ref, read, 0, "2M1D2M", "+", "chrT", 100, min_events=1)
    # rows before swap: (A,A)(C,C)(G,-)(G,G)(T,T); refbase C readbase C at 1,
    # next row read '-', ref G, then (G,G) -> swap readbase rows 2 and 3
    assert "".join(res.base_map["readbase"]) == "ACG-T"


def test_end_to_end_align_then_expand(genome, aligner):
    rng = np.random.RandomState(11)
    start = 3000
    read = mutate(rng, genome["chrT"][start : start + 2000])
    rec = aligner.align({"e2e": read})[0]
    res = expand_alignment(
        genome["chrT"], rec.seq, rec.pos - 1, rec.cigar, rec.strand,
        rec.rname, len(read),
    )
    # base map covers most of the read with high identity
    matches = (res.base_map["refbase"] == res.base_map["readbase"]).sum()
    assert matches / len(res.base_map) > 0.9
    assert res.num_match == len(res.base_map) - res.num_mismatch - res.num_insert - res.num_del


def test_align_high_error_reads(genome, aligner):
    """Mapping holds at realistic nanopore error rates (up to 15%)."""
    rng = np.random.RandomState(99)
    for err in (0.05, 0.10, 0.15):
        ok = 0
        for i in range(10):
            start = rng.randint(0, 18000)
            read = mutate(
                rng, genome["chrT"][start : start + 1800],
                sub=err * 0.5, ins=err * 0.25, dele=err * 0.25,
            )
            recs = aligner.align({"e": read})
            if recs and abs((recs[0].pos - 1) - start) <= 150:
                ok += 1
            if recs and recs[0].cigar_arrays is not None:
                # pre-parsed runs == string parse, even on messy CIGARs
                nums, ops = parse_cigar(recs[0].cigar)
                np.testing.assert_array_equal(recs[0].cigar_arrays[0], nums)
                np.testing.assert_array_equal(recs[0].cigar_arrays[1], ops)
        assert ok >= 9, f"err={err}: only {ok}/10 mapped"


def test_ambiguous_repeat_lowers_mapq():
    """A read matching two identical repeats gets mapq 3 (ambiguity flag)."""
    rng = np.random.RandomState(123)
    unit = random_seq(rng, 1200)
    genome = {"chrRep": random_seq(rng, 3000) + unit + random_seq(rng, 3000)
              + unit + random_seq(rng, 3000)}
    rep_aligner = MinimizerAligner(genome)
    read = unit[100:1100]
    recs = rep_aligner.align({"rep": read})
    assert len(recs) == 1
    assert recs[0].mapq == 3  # second chain >= 0.9 * best
    # unique read still gets 60
    uniq = genome["chrRep"][1000:2000]
    assert rep_aligner.align({"u": uniq})[0].mapq == 60


def test_unmappable_tail_is_soft_clipped_not_dp_aligned():
    """A long tail with no anchors must be soft-clipped past the DP cap
    (max_dp), not fed to the full-matrix DP — a 300 kb unanchored tail
    would otherwise allocate a ~360 GB matrix."""
    rng = np.random.RandomState(77)
    genome = {"chrT": random_seq(rng, 10000)}
    al = MinimizerAligner(genome)
    read = genome["chrT"][2000:3000] + random_seq(rng, 5000)
    recs = al.align({"tailed": read})
    assert len(recs) == 1
    rec = recs[0]
    assert rec.cigar.endswith("S")
    # the mapped body must still anchor at the true locus
    assert abs(rec.pos - 2001) < 50
    # soft clip absorbs at least the tail beyond the DP cap
    import re
    trail_s = int(re.findall(r"(\d+)S$", rec.cigar)[0])
    assert trail_s >= 3000


def test_oversized_gap_splits_chain():
    """Two anchored blocks separated by a >max_dp deletion-like gap must
    not be bridged by one giant DP; the densest block maps, the rest is
    clipped or dropped."""
    rng = np.random.RandomState(78)
    genome = {"chrG": random_seq(rng, 20000)}
    al = MinimizerAligner(genome)
    read = genome["chrG"][1000:2000] + genome["chrG"][9000:12000]
    recs = al.align({"gapped": read})
    assert len(recs) == 1
    rec = recs[0]
    # densest run is the 3 kb block at 9000
    assert abs(rec.pos - 9001) < 1200
    # and no D run longer than the DP cap survives in the CIGAR
    import re
    assert all(int(n) <= 2000 for n in re.findall(r"(\d+)D", rec.cigar))


def test_cross_chromosome_duplicate_lowers_mapq():
    """A read from a region duplicated on TWO reference sequences (same
    strand) must be flagged ambiguous — the runner-up chain lives on a
    different rid, which same-rid diagonal-band logic alone misses."""
    rng = np.random.RandomState(321)
    unit = random_seq(rng, 1200)
    genome = {
        "chrA": random_seq(rng, 2500) + unit + random_seq(rng, 2500),
        "chrB": random_seq(rng, 1500) + unit + random_seq(rng, 3500),
    }
    aligner2 = MinimizerAligner(genome)
    recs = aligner2.align({"dup": unit[100:1100]})
    assert len(recs) == 1
    assert recs[0].mapq == 3
