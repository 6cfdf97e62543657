"""Property test: training-label assignment vs a literal reference walk.

``_reference_labels`` transcribes the labeled get_Feature logic
(myGetFeatureBasedPos.py:355-488) per-row: motif-mismatch poisoning, the
+-3/+-6 gap-count gating of methylated sites, the rejected-site
neighborhood expansion, and the posneg label rules. Labels produced by
deepmod_tpu.features.labeled.build_labeled_features must match on
pipeline-realistic inputs (simulated reads with indels, both strands).
"""

import numpy as np

from deepmod_tpu.align.aligner import MinimizerAligner
from deepmod_tpu.align.cigar import expand_alignment
from deepmod_tpu.align.sam import filter_best_alignments
from deepmod_tpu.features.builder import FeatureBuildError
from deepmod_tpu.features.labeled import LabelOptions, build_labeled_features
from deepmod_tpu.features.labels import scan_motif
from deepmod_tpu.io.fast5 import read_fast5_file
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

CHECK_WINDOWS = (3, 6)
MAX_GAPS = {3: 2, 6: 3}


def _reference_labels(bm, strand, fulmod, motif, mod_offset, posneg, affect=1):
    """Literal transcription of the cgpos gating + label rules."""
    n = len(bm)
    refbase = bm["refbase"]
    readbase = bm["readbase"]
    refbasei = bm["refbasei"].astype(np.int64)

    cg_meth = set()
    cg_unused = set()
    for aligni in range(n):
        if motif and readbase[aligni] == motif[mod_offset]:
            st = aligni - mod_offset
            en = aligni + len(motif) - mod_offset
            if st > -1 and en <= n:
                if ("".join(readbase[st:en]) == motif
                        and "".join(refbase[st:en]) != motif):
                    lo = aligni - affect if aligni - affect > -1 else 0
                    hi = aligni + affect + 1 if aligni + affect + 1 < n else n
                    for addi in range(lo, hi):
                        cg_unused.add((strand, int(refbasei[addi])))
        if refbase[aligni] != "-" and (strand, int(refbasei[aligni])) in fulmod:
            if readbase[aligni] != "-":
                nextnogap = aligni + 1
                while nextnogap < n and refbase[nextnogap] == "-":
                    nextnogap += 1
                iscg = False
                for w in CHECK_WINDOWS:
                    if not nextnogap < n:
                        continue
                    gapnum = 0
                    for checki in range(aligni - w, aligni + w + 1):
                        if -1 < checki < n:
                            if refbase[checki] == "-" or readbase[checki] == "-":
                                gapnum += 1
                    if gapnum <= MAX_GAPS[w]:
                        lo = aligni - affect if aligni - affect > -1 else 0
                        hi = nextnogap + affect if nextnogap + affect < n else n
                        for addi in range(lo, hi):
                            if addi == aligni:
                                cg_meth.add((strand, int(refbasei[addi])))
                            else:
                                cg_unused.add((strand, int(refbasei[addi])))
                        iscg = True
                        break
                if iscg:
                    continue
            if readbase[aligni] != "-":
                nextnogap = aligni
                for _ in range(affect):
                    nextnogap += 1
                    while nextnogap < n and refbase[nextnogap] == "-":
                        nextnogap += 1
                prenogap = aligni
                for _ in range(affect):
                    prenogap -= 1
                    while prenogap > -1 and refbase[prenogap] == "-":
                        prenogap -= 1
                read0 = aligni
                read1 = aligni
                for _ in range(affect):
                    read0 -= 1
                    while read0 > -1 and readbase[read0] == "-":
                        read0 -= 1
                    read1 += 1
                    while read1 < n and readbase[read1] == "-":
                        read1 += 1
                if read0 < prenogap:
                    prenogap = read0 if read0 > -1 else 0
                if read1 > nextnogap:
                    nextnogap = read1 if read1 < n else n - 1
                if prenogap < 0:
                    prenogap = 0
                if not nextnogap < n:
                    nextnogap = n - 1
                if not prenogap < n:
                    prenogap = n - 1
                for excldi in range(prenogap, nextnogap + 1):
                    cg_unused.add((strand, int(refbasei[excldi])))

    labels = []
    for aligni in range(n):
        if readbase[aligni] == "-":
            continue
        key = (strand, int(refbasei[aligni]))
        neg = pos = 0
        if posneg == 0:
            if key in fulmod:
                neg = 1
        else:
            if key in cg_meth and refbase[aligni] != "-":
                pos = 1
            elif key not in cg_unused:
                neg = 1
        labels.append((neg, pos))
    return labels


def test_labels_match_reference_walk(tmp_path):
    out = str(tmp_path / "lbl")
    genome, reads = generate_dataset(
        out,
        SynthConfig(
            genome_sizes={"chrL": 20000}, num_reads=6,
            read_length=(800, 1500), seed=23,
            sub_rate=0.03, ins_rate=0.015, del_rate=0.015,
        ),
    )
    fulmod, _ = scan_motif(genome, "CG", 0)
    aligner = MinimizerAligner(genome)

    checked = 0
    for sim in reads:
        read = read_fast5_file(sim.path)
        recs = aligner.align({read.read_id: read.basecall})
        best = filter_best_alignments(recs)
        if read.read_id not in best:
            continue
        rec = best[read.read_id]
        bmr = expand_alignment(
            genome[rec.rname], rec.seq, rec.pos - 1, rec.cigar, rec.strand,
            rec.rname, len(read.m_event), min_events=500,
            cpg_canonicalize=True,
            # the getfeatures path keeps minus-strand trim-asymmetric
            # reads (myGetFeatureBasedPos.py:253-254 accounting)
            strict_ref_clips=False,
        )
        for posneg in (0, 1):
            opts = LabelOptions(
                posneg=posneg, fulmod=fulmod, motif="CG", mod_offset=0,
                truncate_margin=10**9,  # keep all rows for comparison
            )
            try:
                mfeat = build_labeled_features(
                    read.m_event, read.raw_signals, read.basecall, bmr, opts,
                )
            except FeatureBuildError:
                # the reference rejects reads whose clip arithmetic and
                # matched-event span disagree (its own "Error Does not
                # match" gate, e.g. '-'-strand reads with CIGAR-leading
                # insertions); we reject identically
                continue
            want = _reference_labels(
                bmr.base_map, bmr.strand, fulmod.get(rec.rname, set()),
                "CG", 0, posneg,
            )
            if mfeat is None:
                assert not any(neg or pos for neg, pos in want)
                continue
            pad = 100
            n_aligned = len(want)
            got = [
                (int(mfeat[pad + i, 1]), int(mfeat[pad + i, 2]))
                for i in range(n_aligned)
            ]
            assert got == want, (sim.read_id, posneg)
            checked += 1
    assert checked >= 6
