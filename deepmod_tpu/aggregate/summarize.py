"""Per-genomic-position modification summaries and BED emission.

Replicates the reference summarizer (sum_handler, myDetect.py:1028-1120):
for each (chr, strand, position) of the base of interest, coverage = reads
whose readbase != '-', modified = rows with mod_pred == 1, written as a
BED line with the reference's exact formatting (space-separated fields
with a trailing space, coverage capped at 1000 in column 5, integer
truncated percent, myDetect.py:1107-1120).

The reference accumulates into Python dicts per position; here counts are
dense int64 vectors per (chr, strand) filled with np.bincount — and, on
device, the same reduction is a segment-sum + psum across the mesh
(deepmod_tpu.parallel.aggregation) so multi-host merges ride the ICI
instead of the filesystem.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from deepmod_tpu.align.cigar import BaseMapResult


@dataclasses.dataclass
class PositionCounts:
    """Dense per-position counters for one (chr, strand)."""

    length: int
    coverage: np.ndarray   # int32[length] (coverage >2e9 per site is not real)
    mod_count: np.ndarray  # int32[length]
    seen: np.ndarray       # bool[length]: position appeared in any base map
                           # (even via deletion rows, which leave coverage 0
                           # but still create a dict entry in the reference,
                           # myDetect.py:1092-1094)

    @classmethod
    def zeros(cls, length: int) -> "PositionCounts":
        return cls(
            length=length,
            coverage=np.zeros(length, np.int32),
            mod_count=np.zeros(length, np.int32),
            seen=np.zeros(length, bool),
        )


CountsMap = Dict[Tuple[str, str], PositionCounts]


def accumulate_base_map(
    counts: CountsMap,
    bmr: BaseMapResult,
    target_base: str,
    chrom_length: int,
) -> None:
    """Add one read's predictions into the per-position counters.

    Rules from myDetect.py:1089-1100: only rows whose refbase equals the
    target base count; rows with refbase in '-','N','n' are skipped;
    coverage increments when readbase != '-'; mod_count when mod_pred==1
    (within covered rows).
    """
    key = (bmr.rname, bmr.strand)
    if key not in counts:
        counts[key] = PositionCounts.zeros(chrom_length)
    pc = counts[key]
    bm = bmr.base_map
    is_target = bm["refbase"] == target_base
    pc.seen[bm["refbasei"][is_target].astype(np.int64)] = True
    sel = is_target & (bm["readbase"] != "-")
    pos = bm["refbasei"][sel].astype(np.int64)
    pc.coverage += np.bincount(pos, minlength=pc.length).astype(np.int32)
    modded = pos[bm["mod_pred"][sel] == 1]
    pc.mod_count += np.bincount(modded, minlength=pc.length).astype(np.int32)


def merge_counts(dest: CountsMap, src: CountsMap) -> None:
    """Associative merge (the all-reduce the reference does via BED files,
    sum_chr_mod.py:47-52)."""
    for key, pc in src.items():
        if key not in dest:
            dest[key] = PositionCounts.zeros(pc.length)
        if dest[key].length < pc.length:
            grown = PositionCounts.zeros(pc.length)
            grown.coverage[: dest[key].length] = dest[key].coverage
            grown.mod_count[: dest[key].length] = dest[key].mod_count
            dest[key] = grown
        dest[key].coverage[: pc.length] += pc.coverage
        dest[key].mod_count[: pc.length] += pc.mod_count
        dest[key].seen[: pc.length] |= pc.seen


def bed_line(
    chrom: str, strand: str, pos: int, base: str, coverage: int, mod_count: int
) -> str:
    """One output line, byte-identical to myDetect.py:1113-1120.

    Fields joined by single spaces INCLUDING a trailing '\n' element, so
    every line ends with ' \n'.
    """
    percent = int(100 * mod_count / (coverage if coverage > 0 else 1))
    fields = [
        chrom,
        str(pos),
        str(pos + 1),
        base,
        str(1000 if coverage > 1000 else coverage),
        strand,
        str(pos),
        str(pos + 1),
        "0,0,0",
        str(coverage),
        str(percent),
        str(mod_count),
        "\n",
    ]
    return " ".join(fields)


def write_bed(
    path: str,
    chrom: str,
    strand: str,
    base: str,
    pc: PositionCounts,
) -> int:
    """Write mod_pos BED for one (chr, strand); returns line count.

    Emits every position that appeared in any read's base map (the
    reference creates a dict entry per target-base row even for deletion
    rows with coverage 0, myDetect.py:1092-1094). Sorted by position like
    the reference's sorted dict keys (myDetect.py:1110-1111).
    """
    written = 0
    with open(path, "w") as fh:
        for pos in np.flatnonzero(pc.seen):
            fh.write(
                bed_line(
                    chrom, strand, int(pos), base,
                    int(pc.coverage[pos]), int(pc.mod_count[pos]),
                )
            )
            written += 1
    return written


def read_bed(path: str) -> Dict[Tuple[str, str, int], Tuple[int, int]]:
    """Parse a mod_pos BED back into {(chr, strand, pos): (cov, mod)}."""
    out: Dict[Tuple[str, str, int], Tuple[int, int]] = {}
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) < 12:
                continue
            out[(parts[0], parts[5], int(parts[1]))] = (
                int(parts[9]), int(parts[11])
            )
    return out
