"""Cross-process (multi-host) merge of per-position counts.

The reference's multi-node story is independent runs + a filesystem merge
tool (sum_chr_mod.py; docs/Usage.md:22-27). Under a ``jax.distributed``
runtime the detect engine instead merges per-(chr,strand) counts through
device collectives and emits ONE BED set from process 0 — replacing the
filesystem barrier of myDetect.py:1196-1221.

Collectives must execute in the same order with the same shapes on every
process, while each process holds counts for an arbitrary subset of
(chr, strand) keys with ragged sizes. Determinism comes from iterating
the full sorted (chromosome x strand) grid derived from the reference
FASTA (identical on every process); raggedness is resolved by an initial
fixed-shape length gather, after which every process pads its COO block
to the global maximum. Per key that is exactly two
``process_allgather`` rounds: lengths, then the padded (n, 3) blocks.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from deepmod_tpu.aggregate.summarize import CountsMap, PositionCounts


def merge_counts_across_processes(
    counts: CountsMap,
    chrom_lengths: Dict[str, int],
) -> CountsMap:
    """All-reduce ``counts`` over every jax process.

    ``chrom_lengths`` (from the replicated reference FASTA) defines the
    deterministic key grid; it MUST be identical on all processes.
    Returns the merged map (identical on every process — BED writing is
    then gated to process 0 by the caller).
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() <= 1:
        return counts

    merged: CountsMap = {}
    for chrom in sorted(chrom_lengths):
        for strand in ("+", "-"):
            key = (chrom, strand)
            pc = counts.get(key)
            if pc is not None:
                pos, cov, mod = pc.to_coo()
            else:
                pos = np.empty(0, np.int64)
                cov = np.empty(0, np.int32)
                mod = np.empty(0, np.int32)
            n_local = np.asarray([len(pos)], np.int64)
            all_n = np.asarray(
                multihost_utils.process_allgather(n_local)
            ).reshape(-1)
            n_max = int(all_n.max())
            if n_max == 0:
                continue
            # chunk the gather: human-scale chromosomes can carry tens of
            # millions of seen positions per process — an unchunked
            # (nproc, n_max, 3) int64 block would be GBs of host memory.
            # The chunk count derives from the gathered n_max, so every
            # process executes the same collective sequence. The env
            # override exists for tests to force multi-chunk gathers.
            import os

            CHUNK_ROWS = int(
                os.environ.get("DMT_MERGE_CHUNK_ROWS", 1 << 22)
            )
            out = PositionCounts.zeros(int(chrom_lengths[chrom]))
            for lo in range(0, n_max, CHUNK_ROWS):
                hi = min(lo + CHUNK_ROWS, n_max)
                block = np.zeros((hi - lo, 3), np.int64)
                take = max(0, min(len(pos), hi) - lo)
                if take:
                    block[:take, 0] = pos[lo : lo + take]
                    block[:take, 1] = cov[lo : lo + take]
                    block[:take, 2] = mod[lo : lo + take]
                gathered = np.asarray(
                    multihost_utils.process_allgather(block)
                )
                for p in range(gathered.shape[0]):
                    n_p = max(0, min(int(all_n[p]), hi) - lo)
                    if n_p == 0:
                        continue
                    out.add_coo(
                        gathered[p, :n_p, 0],
                        gathered[p, :n_p, 1],
                        gathered[p, :n_p, 2],
                    )
            merged[key] = out
    return merged


def merge_index_parts(out_base: str, pre_base_str: str) -> None:
    """Combine per-process ``rnn.pred.ind.<chr>.p<pid>`` parts into the
    reference-named merged per-chromosome index files. Runs on process 0
    AFTER the cross-process barrier; a no-op for parts on another host's
    private filesystem (per-read outputs then stay per-host, like the
    reference's per-shard runs)."""
    import glob
    import os
    from collections import defaultdict

    parts = glob.glob(os.path.join(out_base, f"{pre_base_str}.*.p*"))
    by_chr: Dict[str, list] = defaultdict(list)
    headers: Dict[str, list] = {}
    for part in parts:
        name = os.path.basename(part)
        chrom = name[len(pre_base_str) + 1 : name.rfind(".p")]
        with open(part) as fh:
            head = []
            for line in fh:
                if line.startswith("#"):
                    head.append(line)  # identical across parts (same
                    #                    wrk_base/out_base on every process)
                elif line.strip():
                    by_chr[chrom].append(line)
            headers.setdefault(chrom, head)
    def row_key(line: str):
        # the same ordering _write_index_files uses (numeric position)
        f = line.split()
        return (f[0], f[1], int(f[2]), f[3], f[4], f[5]) if len(f) >= 6 else (line,)

    for chrom, lines in by_chr.items():
        path = os.path.join(out_base, f"{pre_base_str}.{chrom}")
        with open(path, "w") as fh:
            fh.writelines(headers.get(chrom, []))
            fh.writelines(sorted(lines, key=row_key))
    for part in parts:
        os.remove(part)
