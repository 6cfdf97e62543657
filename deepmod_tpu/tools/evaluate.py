"""Motif-ground-truth performance evaluation
(DeepMod_tools/cal_EcoliDetPerf.py equivalent, sklearn/matplotlib only —
the reference imports rpy2/ggplot2 but plots with matplotlib anyway).

Builds per-site ground truth from a motif scan of the reference genome
(methylated run's motif sites = positives; every control-run site and
non-motif site = negatives), scores sites by methylation percentage, and
reports ROC-AUC and average precision at coverage thresholds 1 and 5
(cal_EcoliDetPerf.py:241-281), with ROC/PR PNGs. The reference also
computes a per-site binomial log-pmf column (:114) that nothing — in
the reference either — ever reads back; it is omitted here rather than
paying one scipy call per site for a dead column.
"""

from __future__ import annotations

import glob as globmod
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from deepmod_tpu.features.labels import scan_motif
from deepmod_tpu.io.fasta import read_fasta

COV_THRESHOLDS = (1, 5)


def _find_beds(spec: Sequence[str], base: str) -> List[str]:
    """Accept explicit BED files or run folders (globbed like
    cal_EcoliDetPerf.py:193-205)."""
    out: List[str] = []
    for item in spec:
        if os.path.isfile(item):
            out.append(item)
        else:
            for depth in ("", "*/", "*/*/"):
                out.extend(
                    globmod.glob(
                        os.path.join(item, depth + f"mod_pos.*.{base}.bed")
                    )
                )
    return out


def _read_sites(
    paths: Sequence[str],
    start: Optional[int],
    end: Optional[int],
) -> Dict[Tuple[str, int, str], List[int]]:
    """(chr, pos, strand) -> [cov, pct, modcount], re-deriving pct on merge
    (readmodf_dict, cal_EcoliDetPerf.py:78-106)."""
    sites: Dict[Tuple[str, int, str], List[int]] = {}
    for path in paths:
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 12:
                    continue
                pos = int(parts[1])
                if start is not None and pos < start:
                    continue
                if end is not None and pos > end:
                    continue
                key = (parts[0], pos, parts[5])
                cov, pct, mod = int(parts[9]), int(parts[10]), int(parts[11])
                if key not in sites:
                    sites[key] = [cov, pct, mod]
                else:
                    sites[key][0] += cov
                    sites[key][2] += mod
                    sites[key][1] = (
                        int(sites[key][2] * 100 / sites[key][0])
                        if sites[key][0] > 0 else 0
                    )
    return sites


def ecoli_performance(
    mod_beds: Sequence[str],
    ctrl_beds: Sequence[str],
    ref_fasta: str,
    motif: str = "CG",
    out_prefix: str = "perf",
    mod_offset: int = 0,
    chrom: Optional[str] = None,
    start: Optional[int] = None,
    end: Optional[int] = None,
    make_plots: bool = True,
) -> Dict[str, float]:
    base = motif[mod_offset].upper()
    genome = read_fasta(ref_fasta, chrom)
    motif_sites, _ = scan_motif(genome, motif, mod_offset, chrom, start, end)

    mod_sites = _read_sites(_find_beds(mod_beds, base), start, end)
    ctrl_sites = _read_sites(_find_beds(ctrl_beds, base), start, end)

    labels: List[int] = []
    scores: List[int] = []
    coverages: List[int] = []
    tp = fp = tn = fn = 0

    for source, pos_label in ((ctrl_sites, 0), (mod_sites, 1)):
        for (chr_, pos, strand), (cov, pct, mod) in source.items():
            at_motif = (strand, pos) in motif_sites.get(chr_, set())
            label = pos_label if at_motif else 0
            labels.append(label)
            scores.append(pct)
            coverages.append(cov)
            if label == 0:
                tn += cov - mod
                fp += mod
            else:
                tp += mod
                fn += cov - mod

    labels_a = np.asarray(labels)
    scores_a = np.asarray(scores)
    cov_a = np.asarray(coverages)
    metrics: Dict[str, float] = {
        "num_sites": float(len(labels_a)),
        "num_positive_sites": float(labels_a.sum()),
        "read_tp": float(tp),
        "read_fp": float(fp),
        "read_tn": float(tn),
        "read_fn": float(fn),
    }
    from sklearn.metrics import (
        average_precision_score,
        precision_recall_curve,
        roc_auc_score,
        roc_curve,
    )

    curves = {}
    for covt in COV_THRESHOLDS:
        sel = cov_a >= covt
        if sel.sum() == 0 or len(np.unique(labels_a[sel])) < 2:
            metrics[f"auc_cov{covt}"] = float("nan")
            metrics[f"ap_cov{covt}"] = float("nan")
            continue
        metrics[f"auc_cov{covt}"] = float(
            roc_auc_score(labels_a[sel], scores_a[sel])
        )
        metrics[f"ap_cov{covt}"] = float(
            average_precision_score(labels_a[sel], scores_a[sel])
        )
        curves[covt] = (
            roc_curve(labels_a[sel], scores_a[sel]),
            precision_recall_curve(labels_a[sel], scores_a[sel]),
        )

    if make_plots and curves:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        styles = {1: "b-", 5: "r-."}
        fig = plt.figure()
        for covt, ((fpr, tpr, _), _pr) in curves.items():
            plt.plot(
                fpr, tpr, styles.get(covt, "k-"), lw=2,
                label=f"Coverage>={covt} (AUC={metrics[f'auc_cov{covt}']:.3f})",
            )
        plt.plot([0, 1], [0, 1])
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.legend(loc="lower right")
        fig.savefig(f"{out_prefix}_roc.png", dpi=150)
        plt.close(fig)

        fig = plt.figure()
        for covt, (_roc, (precision, recall, _)) in curves.items():
            plt.plot(
                recall, precision, styles.get(covt, "k-"), lw=2,
                label=f"Coverage>={covt} (AP={metrics[f'ap_cov{covt}']:.3f})",
            )
        plt.xlabel("Recall")
        plt.ylabel("Precision")
        plt.legend(loc="lower left")
        fig.savefig(f"{out_prefix}_pr.png", dpi=150)
        plt.close(fig)

    return metrics
