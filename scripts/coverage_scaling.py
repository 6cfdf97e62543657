#!/usr/bin/env python
"""Coverage-scaling accuracy study: site-level AUC/AP vs per-site coverage.

Substantiates the claim the per-site design rests on (and the reference's
30x protocol assumes, docs/Reproducibility.md:38-45): aggregating
per-read calls across coverage multiplies discrimination, pushing
site-level AUC toward the per-read ceiling.

Method: one synthetic cohort at ~30x coverage is trained and detected
ONCE; lower coverages are obtained by subsampling READS from the detect
run's own per-read outputs (index entries -> predetail groups) and
re-aggregating — the same per-read predictions, thinned, so the
comparison isolates coverage itself.

Usage: python scripts/coverage_scaling.py [--out DIR] [--small]
Prints one JSON line with {coverage: metrics} at the end.
"""
import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dmt_coverage")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    import numpy as np

    from deepmod_tpu.engine.detect import DetectConfig, detect_run
    from deepmod_tpu.engine.getfeatures import (
        GetFeaturesConfig,
        getfeatures_run,
    )
    from deepmod_tpu.engine.summarize import (
        read_index_file,
        read_predetail,
        _accumulate_detail,
    )
    from deepmod_tpu.aggregate.summarize import write_bed
    from deepmod_tpu.models.tf_import import load_bilstm_npz
    from deepmod_tpu.testing.synthetic import (
        SynthConfig,
        generate_dataset,
        make_genome,
    )
    from deepmod_tpu.tools.evaluate import ecoli_performance
    from deepmod_tpu.train.loader import find_feature_files
    from deepmod_tpu.train.trainer import TrainConfig, train_run

    genome_size = 20_000 if args.small else 50_000
    n_train = 60 if args.small else 400
    # ~30x: mean read ~2.25 kb over both strands
    n_test = 80 if args.small else 670

    base = args.out
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    genome = make_genome(np.random.RandomState(42), {"chrV": genome_size})
    t0 = time.time()

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
    ref = os.path.join(sets["train_mod"], "ref.fa")
    print(f"[synth {time.time()-t0:.0f}s]", flush=True)

    for name, posneg in (("train_mod", 1), ("train_ctl", 0)):
        getfeatures_run(GetFeaturesConfig(
            wrk_base=os.path.join(sets[name], "fast5"), ref=ref,
            out_folder=os.path.join(base, f"feat_{name}"),
            posneg=posneg, motif="CG", align_str="builtin",
            threads=args.threads, save_format="both",
        ))
    print(f"[features {time.time()-t0:.0f}s]", flush=True)

    mod_files = find_feature_files(os.path.join(base, "feat_train_mod"))
    ctl_files = find_feature_files(os.path.join(base, "feat_train_ctl"))
    params, model_config, _ = train_run(
        [mod_files, ctl_files],
        TrainConfig(out_folder=os.path.join(base, "train1"), epochs=4,
                    seed=1, log_every=50),
    )
    params, model_config, _ = train_run(
        [mod_files, ctl_files],
        TrainConfig(out_folder=os.path.join(base, "train2"), epochs=4,
                    unbalanced=True, seed=1, log_every=50),
        init_params=params,
        resume_opt_from=os.path.join(base, "train1", "4", "mod.npz"),
    )
    model = os.path.join(base, "train2", "4", "mod.npz")
    print(f"[train {time.time()-t0:.0f}s]", flush=True)

    for name in ("test_mod", "test_ctl"):
        detect_run(DetectConfig(
            wrk_base=os.path.join(sets[name], "fast5"), ref=ref,
            model_path=model,
            out_folder=os.path.join(base, f"det_{name}"),
            file_id="mod", base="C", threads=args.threads,
        ))
    print(f"[detect {time.time()-t0:.0f}s]", flush=True)

    def subsample_beds(det_dir: str, frac: float, out_dir: str, seed: int):
        """Re-aggregate a read subsample of a detect run into BEDs."""
        import glob as globmod

        rng = np.random.RandomState(seed)
        counts = {}
        pred_path = os.path.join(det_dir, "mod")
        for index_path in sorted(
            globmod.glob(os.path.join(pred_path, "rnn.pred.ind.*"))
        ):
            headers, entries = read_index_file(index_path)
            base_out = headers.get("#base_folder_output", pred_path)
            if not os.path.isdir(base_out):
                base_out = pred_path
            for entry in entries:
                if rng.rand() >= frac:
                    continue
                m_pred, chrom, strand = read_predetail(base_out, entry)
                _accumulate_detail(counts, m_pred, chrom, strand, "C")
        os.makedirs(out_dir, exist_ok=True)
        beds = []
        for (chrom, strand), pc in sorted(counts.items()):
            path = os.path.join(out_dir, f"mod_pos.{chrom}{strand}.C.bed")
            if write_bed(path, chrom, strand, "C", pc) > 0:
                beds.append(path)
        return beds

    results = {}
    full_cov = 30 if not args.small else 4
    for cov in ((5, 15, 30) if not args.small else (2, 4)):
        frac = cov / full_cov
        if frac >= 1.0:
            mod_beds = [os.path.join(base, "det_test_mod")]
            ctl_beds = [os.path.join(base, "det_test_ctl")]
        else:
            mod_beds = subsample_beds(
                os.path.join(base, "det_test_mod"), frac,
                os.path.join(base, f"sub_mod_{cov}x"), seed=cov,
            )
            ctl_beds = subsample_beds(
                os.path.join(base, "det_test_ctl"), frac,
                os.path.join(base, f"sub_ctl_{cov}x"), seed=cov + 100,
            )
        m = ecoli_performance(
            mod_beds, ctl_beds, ref, motif="CG",
            out_prefix=os.path.join(base, f"perf_{cov}x"),
            make_plots=False,
        )
        results[f"{cov}x"] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in m.items()
            if k.startswith(("auc", "ap", "num", "read_"))
        }
        print(f"[{cov}x] " + json.dumps(results[f"{cov}x"]), flush=True)

    print(json.dumps({
        "coverage_scaling": results,
        "total_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
