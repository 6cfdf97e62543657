"""Property test: vectorized CIGAR expansion vs a literal reference walk.

``_reference_walk`` below is a deliberately naive per-base transcription
of the reference's handle_record algorithm (myDetect.py:488-711): clip
stripping, the M/I/D/N/S/H/P/=/X walk, first/last-match trimming, event
slicing, minus-strand flip + complement, and the CpG swap. Random
alignments (including pathological CIGARs) must produce identical base
maps, clips, event slices and statistics through both implementations.
"""

import numpy as np
import pytest

from deepmod_tpu.align.cigar import AlignmentRejected, expand_alignment
from deepmod_tpu.utils.common import COMPLEMENT

BASES = "ACGT"


def _reference_walk(refseq, readseq, pos, cigar, strand, num_events):
    """Literal per-base transcription of myDetect.py:488-711."""
    import re

    nums = [int(x) for x in re.findall(r"\d+", cigar)]
    ops = re.findall(r"[MIDNSHPX=]", cigar)

    leftclip = rightclip = 0
    while ops and ops[0] in "IDNSHPX":
        if ops[0] in "ISX":
            leftclip += nums[0]
            readseq = readseq[nums[0]:]
        if ops[0] == "H":
            leftclip += nums[0]
        if ops[0] in "DNX":
            pos += nums[0]
        nums, ops = nums[1:], ops[1:]
    while ops and ops[-1] in "IDNSHPX":
        if ops[-1] in "ISX":
            rightclip += nums[-1]
            readseq = readseq[: -nums[-1]]
        if ops[-1] == "H":
            rightclip += nums[-1]
        nums, ops = nums[:-1], ops[:-1]
    if not ops:
        return None

    if strand == "+":
        m_event_len = num_events - leftclip - rightclip
        ev_lo, ev_hi = leftclip, num_events - rightclip
    else:
        m_event_len = num_events - leftclip - rightclip
        ev_lo, ev_hi = rightclip, num_events - leftclip

    firstmatch = lastmatch = None
    first_al = last_al = None
    first_match_pos = None
    rows = []
    nummis = numins = numdel = 0
    read_ind = 0
    for n, op in zip(nums, ops):
        for _ in range(n):
            if op == "M":
                rows.append((refseq[pos], readseq[read_ind], pos, read_ind))
                if refseq[pos] == readseq[read_ind]:
                    if firstmatch is None:
                        firstmatch = read_ind
                        first_al = len(rows) - 1
                        first_match_pos = pos
                    lastmatch = read_ind
                    last_al = len(rows) - 1
                else:
                    nummis += 1
                pos += 1
                read_ind += 1
            elif op == "I":
                rows.append(("-", readseq[read_ind], pos, read_ind))
                read_ind += 1
                numins += 1
            elif op in "DN":
                rows.append((refseq[pos], "-", pos, read_ind))
                pos += 1
                if op == "D":
                    numdel += 1
            elif op == "S":
                read_ind += 1
            elif op == "=":
                rows.append((refseq[pos], readseq[read_ind], pos, read_ind))
                if firstmatch is None:
                    firstmatch = read_ind
                    first_al = len(rows) - 1
                    first_match_pos = pos
                lastmatch = read_ind
                last_al = len(rows) - 1
                pos += 1
                read_ind += 1
            elif op == "X":
                rows.append((refseq[pos], readseq[read_ind], pos, read_ind))
                pos += 1
                read_ind += 1
                nummis += 1
    if firstmatch is None:
        return None

    if strand == "+":
        leftclip += firstmatch
        if m_event_len - lastmatch > 1:
            rightclip += m_event_len - lastmatch - 1
            ev_lo2 = ev_lo + firstmatch
            ev_hi2 = ev_hi + (lastmatch + 1 - m_event_len)
        elif firstmatch > 0:
            ev_lo2, ev_hi2 = ev_lo + firstmatch, ev_hi
        else:
            ev_lo2, ev_hi2 = ev_lo, ev_hi
    else:
        # SEQ-left trims remove READ-RIGHT events (SEQ is the revcomp'd
        # read), so firstmatch grows the SEQ-left clip variable — after
        # the strand swap below it lands on the read-right clip, matching
        # ev_hi2 = ev_hi - firstmatch
        leftclip += firstmatch
        if m_event_len - lastmatch > 1:
            rightclip += m_event_len - lastmatch - 1
        if firstmatch > 0:
            ev_lo2 = ev_lo + (m_event_len - 1 - lastmatch)
            ev_hi2 = ev_hi - firstmatch
        elif m_event_len - lastmatch > 1:
            ev_lo2, ev_hi2 = ev_lo + (m_event_len - 1 - lastmatch), ev_hi
        else:
            ev_lo2, ev_hi2 = ev_lo, ev_hi

    nrows = len(rows)
    if nrows - last_al > 1:
        rows = rows[first_al : last_al + 1 - nrows]
    elif first_al > 0:
        rows = rows[first_al:]

    if strand == "-":
        rows = [
            (COMPLEMENT.get(r, r), COMPLEMENT.get(q, q), pi, qi)
            for (r, q, pi, qi) in rows[::-1]
        ]
        leftclip, rightclip = rightclip, leftclip

    # CpG swap (myDetect.py:680-700), sequential over all rows
    refb = [r[0] for r in rows]
    readb = [r[1] for r in rows]
    n = len(rows)
    for ali in range(n):
        if refb[ali] == "C" and readb[ali] == "C":
            if ali + 1 < n and readb[ali + 1] == "-" and refb[ali + 1] == "G":
                addali = 2
                while ali + addali < n and readb[ali + addali] == "-" and refb[ali + addali] == "G":
                    addali += 1
                if ali + addali < n and readb[ali + addali] == "G" and refb[ali + addali] == "G":
                    readb[ali + 1], readb[ali + addali] = readb[ali + addali], readb[ali + 1]
        if refb[ali] == "G" and readb[ali] == "G":
            if ali - 1 > -1 and readb[ali - 1] == "-" and refb[ali - 1] == "C":
                addali = 2
                while ali - addali > -1 and readb[ali - addali] == "-" and refb[ali - addali] == "C":
                    addali += 1
                if ali - addali > -1 and readb[ali - addali] == "C" and refb[ali - addali] == "C":
                    readb[ali - 1], readb[ali - addali] = readb[ali - addali], readb[ali - 1]

    return {
        "firstmatch": firstmatch,
        "tail_trim": (m_event_len - lastmatch - 1
                      if m_event_len - lastmatch > 1 else 0),
        "refbase": refb,
        "readbase": readb,
        "refbasei": [r[2] for r in rows],
        "readbasei": [r[3] for r in rows],
        "left_clip": leftclip,
        "right_clip": rightclip,
        "event_slice": (ev_lo2, ev_hi2),
        "first_match_pos": first_match_pos,
        "num_mismatch": nummis,
        "num_insert": numins,
        "num_del": numdel,
    }


def _random_alignment(rng):
    """Random ref + CIGAR + consistent read sequence."""
    ref_len = rng.randint(300, 800)
    refseq = "".join(rng.choice(list(BASES), ref_len))
    pos = rng.randint(0, 100)
    ops = []
    # optional leading soft clip
    if rng.rand() < 0.5:
        ops.append((rng.randint(1, 10), "S"))
    n_chunks = rng.randint(3, 12)
    for _ in range(n_chunks):
        op = rng.choice(["M", "M", "M", "M", "I", "D", "=", "X", "N"])
        ops.append((rng.randint(1, 30), op))
    # make sure there's a decent match block
    ops.append((rng.randint(20, 60), "M"))
    if rng.rand() < 0.5:
        ops.append((rng.randint(1, 10), "S"))

    # build read consistent with CIGAR against ref
    read = []
    p = pos
    ok = True
    for n, op in ops:
        for _ in range(n):
            if op in "M=X":
                if p >= ref_len:
                    ok = False
                    break
                base = refseq[p]
                if op == "X" or (op == "M" and rng.rand() < 0.15):
                    base = BASES[(BASES.index(base) + rng.randint(1, 4)) % 4]
                if op == "=":
                    base = refseq[p]
                read.append(base)
                p += 1
            elif op == "I" or op == "S":
                read.append(str(rng.choice(list(BASES))))
            elif op in "DN":
                p += 1
        if not ok:
            break
    if not ok or p >= ref_len:
        return None
    cigar = "".join(f"{n}{op}" for n, op in ops)
    readseq = "".join(read)
    num_events = len(readseq) + rng.randint(0, 5)
    strand = "+" if rng.rand() < 0.5 else "-"
    return refseq, readseq, pos, cigar, strand, num_events


def test_expand_alignment_matches_reference_walk():
    rng = np.random.RandomState(2026)
    tested = 0
    for _ in range(200):
        case = _random_alignment(rng)
        if case is None:
            continue
        refseq, readseq, pos, cigar, strand, num_events = case
        want = _reference_walk(refseq, readseq, pos, cigar, strand, num_events)
        # strict mode (the detect default) must reject EXACTLY the reads
        # the reference's swapped minus-strand accounting event-shifts
        # and drops: '-' strand with firstmatch != tail trim
        strict_drop = (
            want is not None
            and strand == "-"
            and want["firstmatch"] != want["tail_trim"]
        )
        try:
            expand_alignment(
                refseq, readseq, pos, cigar, strand, "chrT", num_events,
                min_events=0, strict_ref_clips=True,
            )
            assert not strict_drop, (cigar, strand)
        except AlignmentRejected as exc:
            if want is not None:
                assert str(exc) == "Error Does not match", (cigar, strand)
                assert strict_drop, (cigar, strand)
        try:
            got = expand_alignment(
                refseq, readseq, pos, cigar, strand, "chrT", num_events,
                min_events=0, strict_ref_clips=False,
            )
        except AlignmentRejected:
            assert want is None, (cigar, strand)
            continue
        assert want is not None, (cigar, strand)
        bm = got.base_map
        assert list(bm["refbase"]) == want["refbase"], (cigar, strand)
        assert list(bm["readbase"]) == want["readbase"], (cigar, strand)
        assert [int(v) for v in bm["refbasei"]] == want["refbasei"]
        assert [int(v) for v in bm["readbasei"]] == want["readbasei"]
        assert got.left_clip == want["left_clip"], (cigar, strand)
        assert got.right_clip == want["right_clip"], (cigar, strand)
        assert got.event_slice == want["event_slice"], (cigar, strand)
        # clips are READ-oriented and must agree with the event slice —
        # the feature builder indexes events [left_clip, n - right_clip)
        assert got.event_slice == (
            got.left_clip, num_events - got.right_clip
        ), (cigar, strand)
        assert got.first_match_pos == want["first_match_pos"]
        assert got.num_mismatch == want["num_mismatch"]
        assert got.num_insert == want["num_insert"]
        assert got.num_del == want["num_del"]
        tested += 1
    assert tested > 100  # most random cases must be valid


def test_minus_strand_leading_mismatch_feature_build():
    """Regression: a minus-strand alignment whose FIRST SEQ base is a
    mismatch (firstmatch=1) gets a self-consistent window in keep mode
    (strict_ref_clips=False; the reference's getfeatures accounting),
    while strict mode replicates the reference detect path, which
    event-shifts and drops such reads — 2.5% of a 4000-read run."""
    import numpy as np

    from deepmod_tpu.features.builder import build_feature_matrix
    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.utils.common import reverse_complement

    rng = np.random.RandomState(0)
    read = "".join(rng.choice(list("ACGT"), 200))
    seq = reverse_complement(read)
    ref = "A" + seq[1:] if seq[0] != "A" else "C" + seq[1:]  # SEQ[0] mismatch
    with pytest.raises(AlignmentRejected, match="Error Does not match"):
        expand_alignment(
            ref, seq, 0, f"{len(seq)}M", "-", "chrT", 200, min_events=0,
            strict_ref_clips=True,
        )
    bmr = expand_alignment(
        ref, seq, 0, f"{len(seq)}M", "-", "chrT", 200, min_events=0,
        strict_ref_clips=False,
    )
    # read-right clip must carry the trimmed leading SEQ mismatch
    assert (bmr.left_clip, bmr.right_clip) == (0, 1)
    m_event = np.zeros(200, EVENT_DTYPE)
    m_event["model_state"] = [
        ("NN" + read[i] + "NN") for i in range(200)
    ]
    m_event["start"] = np.arange(200, dtype=np.uint64)
    m_event["length"] = np.ones(200, np.uint64)
    mfeat, sc, ec = build_feature_matrix(
        m_event, np.zeros(220), read, bmr, fnum=7
    )
    assert (sc, ec) == (0, 1)
    assert len(mfeat) == 200 - 1 + 200  # n_aligned + 2*pad
