#!/usr/bin/env python
"""Full capability-loop validation at realistic coverage.

Synthesizes a methylated + control nanopore cohort on a shared genome,
then drives the ENTIRE user workflow through the CLI exactly as the
reference documents it (bin/DeepMod.py:352-358 usage examples):

  1. getfeatures --posneg 1 on the methylated sample (CG motif labels)
     and --posneg 0 on the control sample;
  2. train (4 plain epochs), then resume --modfile + --unbalanced 1
     (4 class-weighted epochs) — exercising checkpoint resume;
  3. detect on HELD-OUT methylated + control read sets (different seeds);
  4. evaluate: site-level AUC/AP against the CG motif ground truth with
     the control run as negatives (cal_EcoliDetPerf methodology).

Scale defaults: 200 kb genome, 600+600 training reads, 1300+1300
held-out reads (~20x site coverage) — large enough that per-site
aggregation is meaningful, small enough for a 2-core dev VM.

Usage: python scripts/validate_full_loop.py [--out DIR] [--small]
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
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    print(tail, flush=True)
    print(f"  [{time.time()-t0:.1f}s]", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"command failed: {cmd}")
    return proc.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dmt_full_loop")
    ap.add_argument("--small", action="store_true",
                    help="tiny sizes for a smoke run")
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--fnum", type=int, default=7, choices=(7, 57),
                    help="57 adds the 50-bin signal histogram features "
                         "(myDetect.py:885-891)")
    ap.add_argument("--trainPrecision", default="fp32",
                    choices=("fp32", "bf16"),
                    help="fused-VJP sequence-storage precision for BOTH "
                         "train phases (bf16: round-5 1.5x mode — this "
                         "flag exists for the convergence study)")
    ap.add_argument("--labels", default="motif", choices=("motif", "pos"),
                    help="'pos' drives the bisulfite-style position-file "
                         "label path (--motifORPos 2 with fulmod/anymod/"
                         "nomod files derived from the motif truth, "
                         "myGetFeatureBasedPos.py:672-698) instead of the "
                         "motif scan")
    args = ap.parse_args()
    fnum = ["--fnum", str(args.fnum)]

    genome_size = 20_000 if args.small else 200_000
    n_train = 40 if args.small else 600
    n_test = 60 if args.small else 1300

    from deepmod_tpu.testing.synthetic import (
        SynthConfig, generate_dataset, make_genome,
    )
    import numpy as np

    base = args.out
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    genome = make_genome(np.random.RandomState(42), {"chrV": genome_size})

    t_start = time.time()
    sets = {}
    for name, n, seed, shift in (
        ("train_mod", n_train, 11, 1.2),
        ("train_ctl", n_train, 12, 0.0),
        ("test_mod", n_test, 13, 1.2),
        ("test_ctl", n_test, 14, 0.0),
    ):
        cfg = SynthConfig(
            genome_sizes={"chrV": genome_size}, num_reads=n, seed=seed,
            mod_motif="CG" if shift else None, mod_level_shift=shift,
        )
        generate_dataset(os.path.join(base, name), cfg, genome=genome)
        sets[name] = os.path.join(base, name)
        print(f"synth {name}: {n} reads", flush=True)
    ref = os.path.join(base, "train_mod", "ref.fa")
    print(f"[synth {time.time()-t_start:.0f}s]", flush=True)

    py = [sys.executable, "-m", "deepmod_tpu"]
    # label-source flags: motif scan (reference usage example) or
    # bisulfite-style position files derived from the same motif truth
    if args.labels == "pos":
        from deepmod_tpu.features.labels import scan_motif

        fulmod_set, candidates = scan_motif(genome, "CG", 0)
        cg = sorted(fulmod_set.get("chrV", set()))
        # simulate a bisulfite call set: ~10% of CG sites 'partially
        # methylated' (anymod — excluded from training both ways), the
        # rest fulmod; every non-CG target position nomod
        anymod_rows = [sp for i, sp in enumerate(cg) if i % 10 == 3]
        fulmod_rows = [sp for i, sp in enumerate(cg) if i % 10 != 3]
        nomod_rows = sorted(
            candidates.get("chrV", set()) - fulmod_set.get("chrV", set())
        )
        posdir = os.path.join(base, "posfiles")
        os.makedirs(posdir)
        for fname, rows in (("fulmod.txt", fulmod_rows),
                            ("anymod.txt", anymod_rows),
                            ("nomod.txt", nomod_rows)):
            with open(os.path.join(posdir, fname), "w") as fh:
                for strand, pos in rows:
                    fh.write(f"chrV {strand} {pos}\n")
        print(f"position files: {len(fulmod_rows)} fulmod, "
              f"{len(anymod_rows)} anymod, {len(nomod_rows)} nomod",
              flush=True)
        label_flags = [
            "--motifORPos", "2", "--motif", "CG", "--ModinMotif", "0",
            "--fulmod", os.path.join(posdir, "fulmod.txt"),
            "--anymod", os.path.join(posdir, "anymod.txt"),
            "--nomod", os.path.join(posdir, "nomod.txt"),
        ]
    else:
        label_flags = [
            "--motifORPos", "1", "--motif", "CG", "--ModinMotif", "0",
        ]
    # 1. features (posneg mirrors the reference usage example)
    for name, posneg in (("train_mod", 1), ("train_ctl", 0)):
        run(py + [
            "getfeatures", "--wrkBase", os.path.join(sets[name], "fast5"),
            "--Ref", ref,
            "--posneg", str(posneg),
            "--outFolder", os.path.join(base, f"feat_{name}"),
            "--FileID", "f", "--threads", str(args.threads),
        ] + label_flags + fnum)

    # 2. train: 4 plain epochs, then resume class-weighted
    prec = ["--trainPrecision", args.trainPrecision]
    train1 = os.path.join(base, "train1")
    run(py + [
        "train",
        "--wrkBase",
        os.path.join(base, "feat_train_mod") + ";" +
        os.path.join(base, "feat_train_ctl"),
        "--outFolder", train1, "--FileID", "m",
    ] + fnum + prec)
    ckpt1 = os.path.join(train1, "4", "m.npz")
    train2 = os.path.join(base, "train2")
    run(py + [
        "train",
        "--wrkBase",
        os.path.join(base, "feat_train_mod") + ";" +
        os.path.join(base, "feat_train_ctl"),
        "--outFolder", train2, "--FileID", "m",
        "--modfile", ckpt1, "--unbalanced", "1",
    ] + fnum + prec)
    model = os.path.join(train2, "4", "m.npz")

    # 3. detect on held-out sets
    for name in ("test_mod", "test_ctl"):
        run(py + [
            "detect", "--wrkBase", os.path.join(sets[name], "fast5"),
            "--Ref", ref, "--modfile", model,
            "--outFolder", os.path.join(base, f"det_{name}"),
            "--FileID", "mod", "--Base", "C",
            "--threads", str(args.threads),
        ] + fnum)

    # 4. evaluate vs motif ground truth
    out = run(py + [
        "evaluate",
        "--mod-bed",
        os.path.join(base, "det_test_mod", "mod_pos.chrV+.C.bed"),
        os.path.join(base, "det_test_mod", "mod_pos.chrV-.C.bed"),
        "--ctrl-bed",
        os.path.join(base, "det_test_ctl", "mod_pos.chrV+.C.bed"),
        os.path.join(base, "det_test_ctl", "mod_pos.chrV-.C.bed"),
        "--ref", ref, "--motif", "CG",
        "--out-prefix", os.path.join(base, "perf"),
    ])
    metrics = {}
    for line in out.splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            try:
                metrics[k.strip()] = float(v)
            except ValueError:
                pass
    print(json.dumps({"full_loop_metrics": metrics, "fnum": args.fnum,
                      "labels": args.labels,
                      "train_precision": args.trainPrecision,
                      "total_s": round(time.time() - t_start, 1)}))


if __name__ == "__main__":
    main()
