#!/usr/bin/env python
"""Cluster-effect second stage, validated for VALUE (not just format).

The one reference workflow that through round 4 had only format-level
parity evidence (hm_cluster_predict.py features/BED rewrite byte-equal,
bundled-checkpoint forward to 6e-8) but had never been shown to IMPROVE
site-level accuracy on a driven cohort (VERDICT r4, next-round #1).

The loop (reference workflow: docs/Usage.md:29-42, BASELINE.json
configs[3]):

  1. synthesize a cohort whose methylation is CLUSTER-CORRELATED: CpG
     dyads carry per-site methylation probabilities assigned per 250 bp
     tile (make_clustered_site_prob) — nearby CpGs share state, the
     structure the 14-feature MLP conditions on
     (hm_cluster_predict.py:130-154: ±25 bp neighbor histogram);
  2. train the first-stage BiLSTM on fully-methylated vs control
     cohorts (getfeatures --posneg 1/0 -> train), as the reference
     documents;
  3. detect on the clustered cohort (chrT + chrE);
  4. merge -> per-chromosome BEDs; motif -> CpG index;
  5. clustertrain on chrT sites against the underlying site
     probabilities (the bisulfite-truth analog);
  6. clusterpred on held-out chrE with (a) the chrT-trained model and
     (b) the reference's bundled NA12878 checkpoint (golden-import
     path, exercised on-cohort);
  7. report site-level AUC / average precision on chrE (labels:
     site_prob >= 0.5) BEFORE vs AFTER the second stage.

Sites the merged BED drops (modcount==0, sum_chr_mod.py:55-57) keep
their first-stage fraction in the "after" scoring — exactly what a user
of the reference workflow gets.

Usage: python scripts/validate_cluster_loop.py [--out DIR] [--small]
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print(f"+ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, **kw,
    )
    print("\n".join(proc.stdout.splitlines()[-8:]), flush=True)
    print(f"  [{time.time()-t0:.1f}s]", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"command failed: {cmd}")
    return proc.stdout


def read_bed_fracs(paths):
    """detect-format BED -> {(strand,pos): (cov, frac)} (cov from col 10,
    frac = modcount/cov — full precision, not the integer percent)."""
    out = {}
    for path in paths:
        if not os.path.isfile(path):
            continue
        with open(path) as fh:
            for line in fh:
                p = line.split()
                if len(p) < 12:
                    continue
                cov = int(p[9])
                if cov > 0:
                    out[(p[5], int(p[1]))] = (cov, int(p[11]) / cov)
    return out


def read_rewritten(path):
    """clusterpred output: '<merged line> <new_percent>' -> {(strand,pos):
    frac}."""
    out = {}
    if not os.path.isfile(path):
        return out
    with open(path) as fh:
        for line in fh:
            p = line.split()
            if len(p) >= 13:
                out[(p[5], int(p[1]))] = int(p[-1]) / 100.0
    return out


def site_truth(probs):
    """site_prob array -> {(strand,pos): true_prob} for both strands of
    every dyad (the - strand C sits at dyad_pos + 1)."""
    import numpy as np

    truth = {}
    for p in np.flatnonzero(probs):
        truth[("+", int(p))] = float(probs[p])
        truth[("-", int(p) + 1)] = float(probs[p])
    return truth


def metrics(truth, before, after, min_cov):
    """AUC/AP over truth sites with coverage >= min_cov; 'after' falls
    back to 'before' where the second stage did not rewrite."""
    from sklearn.metrics import average_precision_score, roc_auc_score

    y, s_before, s_after = [], [], []
    for key, true_p in truth.items():
        if key not in before or before[key][0] < min_cov:
            continue
        y.append(1 if true_p >= 0.5 else 0)
        s_before.append(before[key][1])
        s_after.append(after.get(key, before[key][1]))
    if len(set(y)) < 2:
        return None
    return {
        "n_sites": len(y),
        "n_pos": int(sum(y)),
        "auc_before": round(float(roc_auc_score(y, s_before)), 4),
        "auc_after": round(float(roc_auc_score(y, s_after)), 4),
        "ap_before": round(float(average_precision_score(y, s_before)), 4),
        "ap_after": round(float(average_precision_score(y, s_after)), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dmt_cluster_loop")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--shift", type=float, default=1.0,
                    help="mod signal-level shift (lower = harder first "
                         "stage = more denoising headroom)")
    args = ap.parse_args()

    import numpy as np

    from deepmod_tpu.testing.synthetic import (
        SynthConfig, generate_dataset, make_clustered_site_prob, make_genome,
    )

    chrom_size = 8_000 if args.small else 60_000
    n_train = 60 if args.small else 400
    n_cohort = 80 if args.small else 960
    if args.small and args.shift == 1.0:
        args.shift = 2.5  # tiny cohorts need a strong signal to train

    base = args.out
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    rng = np.random.RandomState(42)
    genome = make_genome(rng, {"chrT": chrom_size, "chrE": chrom_size})
    landscape = make_clustered_site_prob(rng, genome, tile=250)

    t_start = time.time()
    # first-stage training cohorts: fully methylated CG vs control
    for name, n, seed, shift in (("train_mod", n_train, 11, args.shift),
                                 ("train_ctl", n_train, 12, 0.0)):
        generate_dataset(os.path.join(base, name), SynthConfig(
            genome_sizes={}, num_reads=n, seed=seed,
            mod_motif="CG" if shift else None, mod_level_shift=shift,
        ), genome=genome)
        print(f"synth {name}: {n} reads", flush=True)
    # clustered detection cohort (held-out seeds, partial methylation)
    generate_dataset(os.path.join(base, "clustered"), SynthConfig(
        genome_sizes={}, num_reads=n_cohort, seed=13,
        mod_site_prob=landscape, mod_level_shift=args.shift,
    ), genome=genome)
    print(f"synth clustered: {n_cohort} reads", flush=True)
    ref = os.path.join(base, "train_mod", "ref.fa")

    py = [sys.executable, "-m", "deepmod_tpu"]
    label_flags = ["--motifORPos", "1", "--motif", "CG", "--ModinMotif", "0"]
    for name, posneg in (("train_mod", 1), ("train_ctl", 0)):
        run(py + [
            "getfeatures", "--wrkBase", os.path.join(base, name, "fast5"),
            "--Ref", ref, "--posneg", str(posneg),
            "--outFolder", os.path.join(base, f"feat_{name}"),
            "--FileID", "f", "--threads", str(args.threads),
        ] + label_flags)
    # 4 plain epochs then a class-weighted resume (the r3 full-loop
    # recipe — plain training alone can collapse to all-negative on the
    # imbalanced site distribution)
    wrk = (os.path.join(base, "feat_train_mod") + ";" +
           os.path.join(base, "feat_train_ctl"))
    train_dir = os.path.join(base, "train1")
    run(py + ["train", "--wrkBase", wrk,
              "--outFolder", train_dir, "--FileID", "m"])
    train2_dir = os.path.join(base, "train2")
    run(py + ["train", "--wrkBase", wrk,
              "--outFolder", train2_dir, "--FileID", "m",
              "--modfile", os.path.join(train_dir, "4", "m.npz"),
              "--unbalanced", "1"])
    model = os.path.join(train2_dir, "4", "m.npz")

    run(py + [
        "detect", "--wrkBase", os.path.join(base, "clustered", "fast5"),
        "--Ref", ref, "--modfile", model,
        "--outFolder", os.path.join(base, "det_clustered"),
        "--FileID", "mod", "--Base", "C",
        "--threads", str(args.threads),
    ])

    # merge + motif index (reference post-processing, docs/Usage.md:29-42)
    run(py + ["merge", base, "C", "pred", "chrT,chrE"])
    for chrom in ("chrT", "chrE"):
        merged = os.path.join(base, f"pred.{chrom}.C.bed")
        n_lines = sum(1 for _ in open(merged)) if os.path.isfile(merged) else 0
        print(f"merged {chrom}: {n_lines} sites", flush=True)
        if n_lines < 20:
            raise SystemExit(
                f"merged BED {merged} nearly empty ({n_lines} sites) — "
                "first-stage model detected almost nothing (modcount==0 "
                "rows are dropped by the merger); raise --shift or scale"
            )
    motif_dir = os.path.join(base, "motif")
    run(py + ["motif", "--ref", ref, "--out", motif_dir, "--motif", "CG"])

    # truth files: the underlying site probabilities (bisulfite analog)
    truth_t = site_truth(landscape["chrT"])
    truth_path = os.path.join(base, "truth_chrT.txt")
    with open(truth_path, "w") as fh:
        for (strand, pos), p in sorted(truth_t.items()):
            fh.write(f"chrT {strand} {pos} {p:.4f}\n")

    cluster_model = os.path.join(base, "cluster.npz")
    run(py + [
        "clustertrain", os.path.join(base, "pred"), motif_dir,
        "--truth", truth_path, "--out", cluster_model, "--chrs", "chrT",
        "--epochs", "40",
    ])
    run(py + [
        "clusterpred", os.path.join(base, "pred"), motif_dir,
        "--model", cluster_model, "--chrs", "chrE", "chrT",
    ])
    # bundled NA12878 checkpoint (golden-import path) on the same cohort
    bundled_prefix = os.path.join(base, "pred_bundled")
    for chrom in ("chrT", "chrE"):
        src = os.path.join(base, f"pred.{chrom}.C.bed")
        shutil.copy(src, f"{bundled_prefix}.{chrom}.C.bed")
    run(py + [
        "clusterpred", bundled_prefix, motif_dir, "--chrs", "chrE",
    ])

    # ---- score chrE (held out from clustertrain) --------------------
    det = os.path.join(base, "det_clustered")
    truth_e = site_truth(landscape["chrE"])
    before = read_bed_fracs([
        os.path.join(det, "mod_pos.chrE+.C.bed"),
        os.path.join(det, "mod_pos.chrE-.C.bed"),
    ])
    after_trained = read_rewritten(
        os.path.join(base, "pred_clusterCpG.chrE.C.bed")
    )
    after_bundled = read_rewritten(f"{bundled_prefix}_clusterCpG.chrE.C.bed")
    # and chrT (training chromosome, reported for completeness)
    truth_t_all = site_truth(landscape["chrT"])
    before_t = read_bed_fracs([
        os.path.join(det, "mod_pos.chrT+.C.bed"),
        os.path.join(det, "mod_pos.chrT-.C.bed"),
    ])
    after_t = read_rewritten(os.path.join(base, "pred_clusterCpG.chrT.C.bed"))

    report = {"shift": args.shift, "chrom_size": chrom_size,
              "cohort_reads": n_cohort,
              "total_s": round(time.time() - t_start, 1)}
    for tag, tr, bf, af in (
        ("chrE_cov5_trained", truth_e, before, after_trained),
        ("chrE_cov1_trained", truth_e, before, after_trained),
        ("chrE_cov5_bundled", truth_e, before, after_bundled),
        ("chrT_cov5_train_chrom", truth_t_all, before_t, after_t),
    ):
        min_cov = 1 if "cov1" in tag else 5
        m = metrics(tr, bf, af, min_cov)
        report[tag] = m
        print(f"{tag}: {m}", flush=True)
    print(json.dumps({"cluster_loop": report}))


if __name__ == "__main__":
    main()
