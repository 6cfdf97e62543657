"""Post-hoc tools: merge, motif index, cluster second stage, evaluation."""

import os

import numpy as np
import pytest

from deepmod_tpu.aggregate.summarize import bed_line
from deepmod_tpu.io.fasta import write_fasta
from deepmod_tpu.tools.cluster_predict import (
    build_cluster_features,
    cluster_predict_run,
)
from deepmod_tpu.tools.evaluate import ecoli_performance
from deepmod_tpu.tools.motif_index import generate_motif_positions
from deepmod_tpu.tools.sum_chr_mod import (
    merge_bed_dicts,
    merge_runs,
    read_bed_counts,
    save_merged,
)


def _write_bed(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for chrom, strand, pos, cov, mod in rows:
            fh.write(bed_line(chrom, strand, pos, "C", cov, mod))


# ------------------------------------------------------------------ merge


def test_merge_runs(tmp_path):
    pred = str(tmp_path / "preds")
    _write_bed(
        f"{pred}/run1/mod_pos.chr1+.C.bed",
        [("chr1", "+", 100, 5, 2), ("chr1", "+", 200, 3, 0)],
    )
    _write_bed(
        f"{pred}/run2/mod_pos.chr1+.C.bed",
        [("chr1", "+", 100, 4, 1), ("chr1", "+", 300, 2, 2)],
    )
    _write_bed(
        f"{pred}/run1/mod_pos.chr1-.C.bed", [("chr1", "-", 150, 6, 3)]
    )
    n = merge_runs(pred, "C", "sum1", chrs="chr1")
    assert n == 1
    merged = f"{pred}/sum1.chr1.C.bed"
    lines = open(merged).read().splitlines()
    # modcount==0 rows dropped (pos 200)
    entries = {int(l.split()[1]): l for l in lines}
    assert set(entries) == {100, 150, 300}
    l100 = entries[100].split()
    assert l100[9] == "9" and l100[11] == "3" and l100[10] == "33"
    # the tool's double-space quirk after the strand column
    assert "+  100" in entries[100]


def test_read_and_merge_dicts(tmp_path):
    path = str(tmp_path / "a" / "mod_pos.chrX+.C.bed")
    _write_bed(path, [("chrX", "+", 5, 10, 4)])
    d = read_bed_counts(path)
    assert d[("chrX", 5, "+")] == [10, 4]
    merge_bed_dicts(d, {("chrX", 5, "+"): [1, 1], ("chrX", 9, "-"): [2, 0]})
    assert d[("chrX", 5, "+")] == [11, 5]
    out = str(tmp_path / "merged.bed")
    n = save_merged(out, d, "C")
    assert n == 1  # chrX:9 dropped (mod 0)


# ------------------------------------------------------------ motif index


def test_generate_motif_positions(tmp_path):
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, {"chrZ": "AACGTTCGAA"})
    out = str(tmp_path / "motifs")
    n = generate_motif_positions(ref, out, "CG", "C", chrs=["chrZ"])
    assert n == 2
    na = open(os.path.join(out, "na_chrZ_C.bed")).read().splitlines()
    # C at 2, 6 ('+'); G at 3, 7 ('-')
    assert na == ["chrZ\t2\t+", "chrZ\t3\t-", "chrZ\t6\t+", "chrZ\t7\t-"]
    motif = open(os.path.join(out, "motif_chrZ_C.bed")).read().splitlines()
    assert motif == [
        "chrZ\t2\t+", "chrZ\t3\t-", "chrZ\t6\t+", "chrZ\t7\t-",
    ]


# --------------------------------------------------------- cluster stage


def test_build_cluster_features_shape_and_partner():
    keys = [("+", 100), ("-", 101), ("+", 110)]
    frac = {("+", 100): 0.8, ("-", 101): 0.6, ("+", 110): 0.2}
    feats = build_cluster_features(keys, frac)
    assert feats.shape == (3, 14)
    # site ('+',100): own 0.8, partner ('-',101) 0.6
    row = feats[list(sorted(frac)).index(("+", 100))]
    # keys sorted: ('+',100), ('+',110), ('-',101)
    row0 = feats[0]
    assert row0[0] == pytest.approx(0.8)
    assert row0[1] == pytest.approx(0.6)
    # neighbor for site 100: site 110 (dedup'd; 101 excluded as partner)
    assert row0[2] == 1
    # histogram normalized: bin of 0.2 -> int(0.2/0.1+0.5)=2
    assert row0[3 + 2] == pytest.approx(1.0)


def test_cluster_predict_run(tmp_path):
    # golden cluster weights as native npz model
    weights = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "cluster_weights.npz")
    )
    model_path = str(tmp_path / "cluster.npz")
    np.savez(model_path, **{k: weights[k] for k in weights.files})

    motif_dir = str(tmp_path / "motifs")
    os.makedirs(motif_dir)
    with open(os.path.join(motif_dir, "motif_chr1_C.bed"), "w") as fh:
        for pos, strand in ((100, "+"), (101, "-"), (110, "+"), (111, "-")):
            fh.write(f"chr1\t{pos}\t{strand}\n")
    prefix = str(tmp_path / "merged")
    with open(f"{prefix}.chr1.C.bed", "w") as fh:
        fh.write("chr1 100 101 C 8 +  100 101 0,0,0 8 75 6\n")
        fh.write("chr1 110 111 C 5 +  110 111 0,0,0 5 20 1\n")
    n = cluster_predict_run(prefix, motif_dir, model_path, chrs=["chr1"])
    assert n == 2
    out = open(f"{prefix}_clusterCpG.chr1.C.bed").read().splitlines()
    assert len(out) == 2
    for line in out:
        parts = line.split()
        assert 0 <= int(parts[-1]) <= 100  # appended refined percent


# -------------------------------------------------------------- evaluate


def test_ecoli_performance(tmp_path):
    rng = np.random.RandomState(0)
    seq = "".join(rng.choice(list("ACGT"), 3000))
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, {"ecoli": seq})
    codes = np.frombuffer(seq.encode(), np.uint8)
    cg = np.flatnonzero((codes[:-1] == ord("C")) & (codes[1:] == ord("G")))
    non_motif_c = np.setdiff1d(np.flatnonzero(codes == ord("C")), cg)[:50]

    # methylated run: motif sites ~90% meth, non-motif ~5%
    mod_rows = [("ecoli", "+", int(p), 10, 9) for p in cg[:50]]
    mod_rows += [("ecoli", "+", int(p), 10, 1) for p in non_motif_c]
    _write_bed(str(tmp_path / "mod" / "mod_pos.ecoli+.C.bed"), mod_rows)
    # control run: motif sites ~5% meth
    ctl_rows = [("ecoli", "+", int(p), 10, 0) for p in cg[:50]]
    _write_bed(str(tmp_path / "ctl" / "mod_pos.ecoli+.C.bed"), ctl_rows)

    metrics = ecoli_performance(
        [str(tmp_path / "mod")],
        [str(tmp_path / "ctl")],
        ref,
        motif="CG",
        out_prefix=str(tmp_path / "perf"),
    )
    assert metrics["auc_cov1"] > 0.95
    assert metrics["ap_cov1"] > 0.9
    assert metrics["num_positive_sites"] == 50
    assert os.path.isfile(str(tmp_path / "perf_roc.png"))
    assert os.path.isfile(str(tmp_path / "perf_pr.png"))


def test_chunked_position_counts_match_dense():
    """Human-scale chunk-lazy counters agree with the dense path."""
    import deepmod_tpu.aggregate.summarize as agg

    rng = np.random.RandomState(0)
    dense = agg.PositionCounts(10_000)
    chunked = agg.PositionCounts(agg.DENSE_LIMIT + 1)
    assert dense.dense and not chunked.dense
    for _ in range(5):
        seen = rng.randint(0, 10_000, 300).astype(np.int64)
        covered = seen[rng.rand(300) < 0.8]
        modded = covered[rng.rand(len(covered)) < 0.3]
        dense.add(seen, covered, modded)
        chunked.add(seen, covered, modded)
    # also spread some positions across chunk boundaries
    far = np.asarray([agg.CHUNK - 1, agg.CHUNK, agg.CHUNK + 5], np.int64)
    chunked.add(far, far, far[:1])
    got = {p: (c, m) for p, c, m in chunked.iter_seen() if p < 10_000}
    want = {p: (c, m) for p, c, m in dense.iter_seen()}
    assert got == want
    far_entries = {p: (c, m) for p, c, m in chunked.iter_seen() if p >= 10_000}
    assert far_entries == {
        agg.CHUNK - 1: (1, 1), agg.CHUNK: (1, 0), agg.CHUNK + 5: (1, 0),
    }
    # memory proportional to touched chunks only
    assert chunked.nbytes() <= 3 * agg.CHUNK * 9
