"""Training-time labeled feature construction.

Reproduces the labeled get_Feature variant
(myGetFeatureBasedPos.py:355-528) on top of the shared detect-time
feature matrix (deepmod_tpu.features.builder):

- alignment-quality gating of methylated sites: a fulmod site only
  becomes a positive label when its +-3/+-6 neighborhood has at most 2/3
  gap columns (checkratios, :372-374); rejected sites and their
  neighborhoods join the not-used set;
- motif-mismatch masking: read positions matching the motif where the
  reference does NOT carry the motif poison their neighborhood (:380-383);
- label columns: col 1 = negative, col 2 = positive, with the
  posneg==0 / posneg==1 rules of :469-488;
- window truncation: keep only rows within +-25 of a labeled row unless
  that keeps >90% of the matrix (:513-526).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Set, Tuple

import numpy as np

from deepmod_tpu.align.cigar import BaseMapResult
from .builder import build_feature_matrix
from .labels import LabelSet


@dataclasses.dataclass
class LabelOptions:
    posneg: int = 0
    fulmod: Optional[LabelSet] = None
    anymod: Optional[LabelSet] = None
    nomod: Optional[LabelSet] = None
    motif: Optional[str] = None       # e.g. 'CG'
    mod_offset: int = 0
    affect_neighbor: int = 1          # :376
    truncate_margin: int = 25         # :516


# gap-count thresholds per check window (myGetFeatureBasedPos.py:373-374;
# the second assignment in the reference wins)
_CHECK_WINDOWS = (3, 6)
_MAX_GAPS = {3: 2, 6: 3}


def _quality_gate(
    bmr: BaseMapResult, opts: LabelOptions
) -> Tuple[Set[int], Set[int]]:
    """Row-index sets (methylated, not-used) — the cgpos pair (:377-444).

    Returned as BASE-MAP ROW indices; the caller converts to (strand,
    refpos) space for label assignment, matching the reference which
    stores (strand, refbasei) tuples.
    """
    bm = bmr.base_map
    refbase = bm["refbase"]
    readbase = bm["readbase"]
    n = len(bm)
    strand = bmr.strand
    fulmod = (opts.fulmod or {}).get(bmr.rname, set())
    aff = opts.affect_neighbor

    meth_rows: Set[int] = set()
    unused_rows: Set[int] = set()

    # motif-mismatch poisoning (:380-383), vectorized: a hit poisons its
    # neighborhood when the READ window equals the motif but the REF
    # window does not (shifted elementwise compares replace the per-hit
    # string building)
    if opts.motif:
        motif = opts.motif
        mpos = opts.mod_offset
        hits = np.flatnonzero(readbase == motif[mpos])
        hits = hits[(hits - mpos > -1) & (hits + len(motif) - mpos <= n)]
        if len(hits):
            read_eq = np.ones(len(hits), bool)
            ref_eq = np.ones(len(hits), bool)
            for k in range(len(motif)):
                idx = hits - mpos + k
                read_eq &= readbase[idx] == motif[k]
                ref_eq &= refbase[idx] == motif[k]
            for aligni in hits[read_eq & ~ref_eq]:
                lo = max(int(aligni) - aff, 0)
                hi = min(int(aligni) + aff + 1, n)
                unused_rows.update(range(lo, hi))

    if not fulmod:
        return meth_rows, unused_rows

    # membership of each non-gap row's (strand, refpos) in fulmod,
    # vectorized against a per-(rname,strand) sorted position array
    # (cached on opts — a python set probe per row dominated this gate)
    cache = getattr(opts, "_fulmod_pos_cache", None)
    if cache is None:
        cache = {}
        opts._fulmod_pos_cache = cache
    key = (bmr.rname, strand)
    pos_arr = cache.get(key)
    if pos_arr is None:
        pos_arr = np.sort(np.fromiter(
            (p for s, p in fulmod if s == strand), np.int64,
        ))
        cache[key] = pos_arr
    is_fulmod = np.zeros(n, bool)
    ref_not_gap = refbase != "-"
    ng_idx = np.flatnonzero(ref_not_gap)
    if len(ng_idx) and len(pos_arr):
        refpos = bm["refbasei"][ng_idx].astype(np.int64)
        loc = np.searchsorted(pos_arr, refpos)
        found = (loc < len(pos_arr)) & (pos_arr[np.minimum(loc, len(pos_arr) - 1)] == refpos)
        is_fulmod[ng_idx[found]] = True

    is_gap_col = (refbase == "-") | (readbase == "-")
    is_match_col = refbase == readbase

    for aligni in np.flatnonzero(is_fulmod):
        aligni = int(aligni)
        if readbase[aligni] != "-":
            nextnogap = aligni + 1
            while nextnogap < n and refbase[nextnogap] == "-":
                nextnogap += 1
            iscg = False
            for w in _CHECK_WINDOWS:
                if not nextnogap < n:
                    continue
                lo = max(aligni - w, 0)
                hi = min(aligni + w + 1, n)
                gapnum = int(is_gap_col[lo:hi].sum())
                if gapnum <= _MAX_GAPS[w]:
                    lo2 = max(aligni - aff, 0)
                    hi2 = min(nextnogap + aff, n)
                    for addi in range(lo2, hi2):
                        if addi == aligni:
                            meth_rows.add(addi)
                        else:
                            unused_rows.add(addi)
                    iscg = True
                    break
            if iscg:
                continue
            # rejected site: poison an expanded neighborhood (:411-444)
            nextng = aligni
            for _ in range(aff):
                nextng += 1
                while nextng < n and refbase[nextng] == "-":
                    nextng += 1
            preng = aligni
            for _ in range(aff):
                preng -= 1
                while preng > -1 and refbase[preng] == "-":
                    preng -= 1
            read0 = aligni
            read1 = aligni
            for _ in range(aff):
                read0 -= 1
                while read0 > -1 and readbase[read0] == "-":
                    read0 -= 1
                read1 += 1
                while read1 < n and readbase[read1] == "-":
                    read1 += 1
            if read0 < preng:
                preng = read0 if read0 > -1 else 0
            if read1 > nextng:
                nextng = read1 if read1 < n else n - 1
            preng = max(preng, 0)
            nextng = min(nextng, n - 1)
            preng = min(preng, n - 1)
            unused_rows.update(range(preng, nextng + 1))
    return meth_rows, unused_rows


def build_labeled_features(
    m_event: np.ndarray,
    raw_signals: np.ndarray,
    basecall: str,
    bmr: BaseMapResult,
    opts: LabelOptions,
    fnum: int = 7,
    pad: int = 100,
) -> Optional[np.ndarray]:
    """Labeled per-event feature matrix, truncated to labeled windows.

    Returns None when no rows survive (the reference returns []).
    """
    mfeat, start_clip, end_clip = build_feature_matrix(
        m_event, raw_signals, basecall, bmr, fnum=fnum, pad=pad
    )
    n_aligned = len(m_event) - start_clip - end_clip
    bm = bmr.base_map
    strand = bmr.strand
    rname = bmr.rname

    meth_rows, unused_rows = _quality_gate(bmr, opts)
    # convert row sets to (strand, refpos) key sets like cgpos (:404-409)
    meth_keys = {(strand, int(bm["refbasei"][i])) for i in meth_rows}
    unused_keys = {(strand, int(bm["refbasei"][i])) for i in unused_rows}

    fulmod = (opts.fulmod or {}).get(rname, set())
    anymod = None if opts.anymod is None else opts.anymod.get(rname, set())
    nomod = None if opts.nomod is None else opts.nomod.get(rname, set())

    nongap = np.flatnonzero(bm["readbase"] != "-")
    assert len(nongap) == n_aligned
    arows = pad + np.arange(n_aligned)  # feature-matrix rows of aligned events

    for k, row in enumerate(nongap):
        key = (strand, int(bm["refbasei"][row]))
        frow = arows[k]
        if opts.posneg == 0:
            # control sample: trusted negatives (:469-476)
            if (
                (anymod is not None and nomod is not None and key in nomod)
                or key in fulmod
                or (anymod is not None and key in anymod)
            ):
                mfeat[frow, 1] = 1.0
        else:
            if key in meth_keys and bm["refbase"][row] != "-":
                mfeat[frow, 2] = 1.0
            elif key not in unused_keys:
                if anymod is None:
                    if nomod is None or key in nomod:
                        mfeat[frow, 1] = 1.0
                elif key in anymod:
                    pass
                else:
                    if nomod is None or key in nomod:
                        mfeat[frow, 1] = 1.0

    # truncation to +-25 rows around labeled rows (:513-526)
    labeled = np.flatnonzero(mfeat[:, 1] + mfeat[:, 2] > 0.9)
    if len(labeled) == 0:
        return None
    margin = opts.truncate_margin
    keep = np.zeros(len(mfeat), bool)
    for row in labeled:
        keep[max(row - margin, 0) : min(row + margin + 1, len(mfeat))] = True
    keep_idx = np.flatnonzero(keep)
    if len(keep_idx) > len(mfeat) * 0.9:
        return mfeat
    return mfeat[keep_idx]
