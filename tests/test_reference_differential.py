"""Differential tests executing the ACTUAL reference code as oracle.

Round 1 proved parity only against builder-written transcriptions; these
tests import /root/reference (TF stubbed, see tests/ref_oracle.py) and
execute the reference's own functions on randomized synthetic fixtures,
comparing byte-for-byte (VERDICT.md "Next round" #1 and #2):

- ingestion: get_Event_Signals (myDetect.py:348-386) — getEvent v1/v2,
  EventTable rundif, MoveTable, mnormalized, per-event mean/std — vs
  io.fast5.read_fast5_file;
- motif labels: readMotifMod (myGetFeatureBasedPos.py:615-647) vs
  features.labels.scan_motif;
- detect: handle_line + handle_record (myDetect.py:929-943, 488-782) with
  a deterministic stand-in classifier, comparing the RNN input windows,
  predetail HDF5 contents, index entries, and the final BEDs produced by
  the reference's own sum_handler (myDetect.py:1028-1120) — run over BOTH
  sides' per-read outputs — against detect_run's BEDs;
- getfeatures: the labeled handle_record (myGetFeatureBasedPos.py:109-350,
  get_Feature :355-528) vs getfeatures_run, comparing decompressed
  .xy.gz text and .xy.ind sidecars, including flush boundaries.

The reference's rundif path predates modern numpy (uint64 event starts
promote to float64 and break slicing; the resegmenter also requires
trailing stay events) — those fixtures use '<u4' starts + tail_stays.
"""

import glob
import gzip
import os
from types import SimpleNamespace

import numpy as np
import pytest

import ref_oracle
from deepmod_tpu.engine.detect import DetectConfig, detect_run
from deepmod_tpu.engine.getfeatures import GetFeaturesConfig, getfeatures_run
from deepmod_tpu.io.fast5 import Fast5ReadOptions, read_fast5_file
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

EVENT_FIELDS = ("mean", "stdv", "start", "length", "model_state")


def _write_sam(path, records):
    with open(path, "w") as fh:
        for rec in records:
            fh.write(
                "\t".join(
                    [rec.qname, str(rec.flag), rec.rname, str(rec.pos),
                     str(rec.mapq), rec.cigar, "*", "0", "0", rec.seq, "*"]
                )
                + "\n"
            )


def _prepare(tmp_path, synth_cfg):
    """Dataset + my ingestion + shared builtin-aligner SAM."""
    from deepmod_tpu.align.aligner import get_aligner

    genome, reads = generate_dataset(str(tmp_path), synth_cfg)
    ref_fa = os.path.join(str(tmp_path), "ref.fa")
    f5mine = {r.read_id: read_fast5_file(r.path) for r in reads}
    aligner = get_aligner(ref_fa, "builtin", ref_seqs=genome)
    records = aligner.align({rid: fr.basecall for rid, fr in f5mine.items()})
    sam_path = os.path.join(str(tmp_path), "aln.sam")
    _write_sam(sam_path, records)
    sam_lines = [l.rstrip("\n") for l in open(sam_path)]
    return genome, reads, ref_fa, f5mine, sam_path, sam_lines


# ---------------------------------------------------------------- ingestion


@pytest.mark.parametrize(
    "style,n_reads,extra_moptions,extra_readopts",
    [
        ("v1", 40, {}, {}),
        ("v2", 40, {}, {}),
        ("move", 25, {"move": True}, {"move": True}),
    ],
)
def test_ingestion_differential(tmp_path, style, n_reads, extra_moptions,
                                extra_readopts):
    cfg = SynthConfig(
        num_reads=n_reads, seed=100 + n_reads, fast5_style=style,
        genome_sizes={"chrA": 30000, "chrB": 15000},
        read_length=(600, 1800),
    )
    _, reads = generate_dataset(str(tmp_path), cfg)
    f5ref, errs = ref_oracle.ref_get_event_signals(
        [r.path for r in reads], **extra_moptions
    )
    assert not errs, errs
    opts = Fast5ReadOptions(**extra_readopts)
    assert len(f5ref) == len(reads)
    for r in reads:
        mine = read_fast5_file(r.path, opts)
        basecall, m_event, raw, _path, skip = f5ref[r.read_id]
        assert basecall == mine.basecall
        assert tuple(skip) == tuple(mine.left_right_skip)
        assert np.array_equal(raw, mine.raw_signals)
        assert len(m_event) == len(mine.m_event)
        for f in EVENT_FIELDS:
            assert np.array_equal(m_event[f], mine.m_event[f]), (
                r.read_id, f
            )


def test_ingestion_differential_rundif(tmp_path):
    cfg = SynthConfig(
        num_reads=15, seed=77, fast5_style="v2", v2_index_dtype="<u4",
        tail_stays=3, genome_sizes={"chrA": 25000}, read_length=(600, 1400),
    )
    _, reads = generate_dataset(str(tmp_path), cfg)
    f5ref, errs = ref_oracle.ref_get_event_signals(
        [r.path for r in reads], SignalGroup="rundif"
    )
    assert not errs, errs
    opts = Fast5ReadOptions(signal_group="rundif")
    for r in reads:
        mine = read_fast5_file(r.path, opts)
        basecall, m_event, raw, _path, _skip = f5ref[r.read_id]
        assert basecall == mine.basecall
        assert np.array_equal(raw, mine.raw_signals)
        assert len(m_event) == len(mine.m_event)
        for f in EVENT_FIELDS:
            assert np.array_equal(m_event[f], mine.m_event[f]), (
                r.read_id, f
            )


# -------------------------------------------------------------- motif labels


def test_motif_scan_differential():
    from deepmod_tpu.features.labels import scan_motif

    rng = np.random.RandomState(5)
    genome = {
        "c1": "".join(rng.choice(list("ACGT"), 5000)),
        "c2": "".join(rng.choice(list("ACGT"), 3000)),
    }
    for mpat, off in (("CG", 0), ("GATC", 1), ("A", 0)):
        fulmod, _cand = ref_oracle.ref_read_motif_mod(genome, mpat, off)
        my_fulmod, _my_cand = scan_motif(genome, mpat, off)
        for chrom in genome:
            ref_set = set(fulmod[chrom].keys())
            mine = my_fulmod.get(chrom) or set()
            my_set = {(s, int(p)) for (s, p) in mine}
            assert ref_set == my_set, (mpat, off, chrom)


# ------------------------------------------------------------------- detect


class _RulePredictor:
    """Duck-typed WindowPredictor applying ref_oracle.center_mean_rule
    directly on the compact feature blocks (column fnum-3 == the center
    event's mean; exact under float32 — all feature values are either
    3-decimal-rounded float32s or small integers)."""

    config = SimpleNamespace(timesteps=21)

    def predict_from_features(self, features, centers, window=21,
                              **kwargs):
        return (features[centers, features.shape[1] - 3] > 0).astype(np.int8)


def _load_predetail(path):
    import h5py

    out = {}
    with h5py.File(path, "r") as fh:
        for key in fh["pred"]:
            g = fh[f"pred/{key}"]
            out[key] = (dict(g.attrs), g["predetail"][()])
    return out


def _my_windows(sam_path, ref_fa, paths, fnum):
    """Rebuild the exact window batches my engine feeds the classifier
    (compact blocks -> strided windows), in the engine's read order."""
    from deepmod_tpu.engine.detect import DetectConfig as DC
    from deepmod_tpu.engine.detect import _host_options
    from deepmod_tpu.engine.host_worker import host_process_files, init_worker

    conf = DC(
        wrk_base="", ref=ref_fa, model_path="unused", out_folder="",
        fnum=fnum, align_str=sam_path,
    )
    init_worker(_host_options(conf))
    results, _errs = host_process_files(paths)
    wins = []
    for r in results:
        view = np.lib.stride_tricks.sliding_window_view(
            r.features, 21, axis=0
        )
        centers = 100 + np.arange(r.n_aligned)
        wins.append(np.moveaxis(view[centers - 10], 2, 1))
    return np.concatenate(wins, axis=0)


@pytest.mark.parametrize("fnum", [7, 57])
def test_detect_differential(tmp_path, fnum):
    cfg = SynthConfig(
        num_reads=12, seed=31, fast5_style="v2",
        genome_sizes={"chrA": 30000, "chrB": 20000},
        read_length=(700, 1500),
    )
    genome, reads, ref_fa, f5mine, sam_path, sam_lines = _prepare(
        tmp_path, cfg
    )
    wrk_base = os.path.join(str(tmp_path), "fast5")

    # ---- reference side: its own ingestion + handle_record chain
    f5ref, errs = ref_oracle.ref_get_event_signals([r.path for r in reads])
    assert not errs
    for rid in f5ref:  # both ingestions agreed (also pinned above)
        assert f5ref[rid][0] == f5mine[rid].basecall
    ref_out = os.path.join(str(tmp_path), "refout", "mod")
    ct = os.path.join(ref_out, "0")
    os.makedirs(ct, exist_ok=True)
    sp_options, session = ref_oracle.ref_detect_batch(
        f5ref, sam_lines, genome, ct, batchid=0,
        wrkBase=wrk_base, outFolder=os.path.join(str(tmp_path), "refout") + "/",
        FileID="mod", fnum=fnum,
    )
    assert not dict(sp_options["Error"]), dict(sp_options["Error"])
    assert len(sp_options["Mod"]) == len(reads)

    # ---- my side: detect_run over the same SAM with the same rule
    my_out = os.path.join(str(tmp_path), "myout")
    dconf = DetectConfig(
        wrk_base=wrk_base, ref=ref_fa, model_path="unused",
        out_folder=my_out, file_id="mod", base="C", fnum=fnum,
        align_str=sam_path, threads=1, use_pallas=False,
    )
    res = detect_run(dconf, predictor=_RulePredictor())
    assert res.num_reads == len(reads)

    # ---- the exact windows fed to the model match (full feature parity,
    # histogram columns included)
    ref_windows = np.concatenate(session.windows, axis=0)
    mine_windows = _my_windows(
        sam_path, ref_fa, [r.path for r in reads], fnum
    ).astype(np.float64)
    assert ref_windows.shape == mine_windows.shape
    assert np.array_equal(ref_windows, mine_windows)

    # ---- predetail HDF5 contents
    ref_pd = _load_predetail(os.path.join(ct, "rnn.pred.detail.fast5.0"))
    my_pd = _load_predetail(
        os.path.join(my_out, "mod", "0", "rnn.pred.detail.fast5.0")
    )
    assert sorted(ref_pd) == sorted(my_pd)
    for key in ref_pd:
        ra, rd = ref_pd[key]
        ma, md = my_pd[key]
        assert set(ra) == set(ma)
        for attr in ra:
            rv, mv = ra[attr], ma[attr]
            rv = rv.decode() if isinstance(rv, bytes) else rv
            mv = mv.decode() if isinstance(mv, bytes) else mv
            assert str(rv) == str(mv), (key, attr, rv, mv)
        assert rd.dtype == md.dtype
        assert np.array_equal(rd, md), key

    # ---- index entries (my merged files vs the reference's Mod list;
    # my files sort rows — a documented deviation — so compare as sets)
    ref_entries = sorted(tuple(str(x) for x in mod) for mod in sp_options["Mod"])
    my_entries = []
    my_index_files = sorted(
        glob.glob(os.path.join(my_out, "mod", "rnn.pred.ind.*"))
    )
    for p in my_index_files:
        for line in open(p):
            if not line.startswith("#"):
                my_entries.append(tuple(line.split()[:6]))
    assert ref_entries == sorted(my_entries)

    # ---- reference sum_handler over the REFERENCE's outputs == my BEDs
    chr_strands = sorted({(e[0], e[1]) for e in ref_entries})
    ref_sum_in = []
    for chrom in sorted({c for c, _ in chr_strands}):
        cif = os.path.join(ref_out, f"rnn.pred.ind.{chrom}")
        with open(cif, "w") as fh:
            fh.write(f"#base_folder_fast5 {wrk_base} \n")
            fh.write(f"#base_folder_output {ref_out} \n")
            for e in ref_entries:
                if e[0] == chrom:
                    fh.write(" ".join(list(e) + ["\n"]))
        for c, s in chr_strands:
            if c == chrom:
                ref_sum_in.append((cif, c, s))
    ref_sum_out = os.path.join(str(tmp_path), "refsum")
    os.makedirs(ref_sum_out, exist_ok=True)
    beds = ref_oracle.ref_sum_handler(ref_sum_in, ref_sum_out, base="C")
    assert beds
    for bed in beds:
        mine = os.path.join(my_out, os.path.basename(bed))
        assert os.path.exists(bed) and os.path.exists(mine), bed
        assert open(bed, "rb").read() == open(mine, "rb").read(), bed

    # ---- reference sum_handler over MY per-read outputs == my BEDs
    # (closes the L6 loop through the reference's own reader/aggregator)
    my_sum_in = []
    for p in my_index_files:
        chrom = os.path.basename(p).split("rnn.pred.ind.")[-1]
        for c, s in chr_strands:
            if c == chrom:
                my_sum_in.append((p, c, s))
    my_sum_out = os.path.join(str(tmp_path), "mysum")
    os.makedirs(my_sum_out, exist_ok=True)
    beds2 = ref_oracle.ref_sum_handler(my_sum_in, my_sum_out, base="C")
    assert beds2
    for bed in beds2:
        mine = os.path.join(my_out, os.path.basename(bed))
        assert open(bed, "rb").read() == open(mine, "rb").read(), bed


# -------------------------------------------------------------- getfeatures


@pytest.mark.parametrize(
    "posneg,fnum,spb",
    [(1, 7, 1.0), (0, 7, 1.0), (1, 57, 1.0), (1, 7, 0.01)],
)
def test_getfeatures_differential(tmp_path, posneg, fnum, spb):
    cfg = SynthConfig(
        num_reads=10, seed=41, fast5_style="v2",
        genome_sizes={"chrA": 30000}, read_length=(900, 1600),
        mod_motif="CG", mod_offset=0, mod_level_shift=0.6,
    )
    genome, reads, ref_fa, f5mine, sam_path, sam_lines = _prepare(
        tmp_path, cfg
    )
    fulmod, _cand = ref_oracle.ref_read_motif_mod(genome, "CG", 0)
    f5ref, errs = ref_oracle.ref_get_event_signals([r.path for r in reads])
    assert not errs

    ref_out = os.path.join(str(tmp_path), "refgf", "0")
    os.makedirs(ref_out, exist_ok=True)
    sp_options = ref_oracle.ref_getfeatures_batch(
        f5ref, sam_lines, genome, ref_out,
        fulmodlist=fulmod, anymodlist=None, nomodlist=None,
        motif=("CG", 0), posneg=posneg, fnum=fnum,
        size_per_batch=spb * 1e7, region=(None, None, None),
    )
    assert not dict(sp_options["Error"]), dict(sp_options["Error"])

    my_out = os.path.join(str(tmp_path), "mygf")
    gconf = GetFeaturesConfig(
        wrk_base=os.path.join(str(tmp_path), "fast5"), ref=ref_fa,
        out_folder=my_out, posneg=posneg, fnum=fnum, size_per_batch=spb,
        motif_or_pos=1, motif="CG", mod_offset=0, align_str=sam_path,
        threads=1,
    )
    res = getfeatures_run(gconf)
    assert res.num_reads == len(reads)

    ref_files = sorted(
        glob.glob(os.path.join(ref_out, "*.xy.gz")),
        key=lambda p: int(os.path.basename(p).split(".")[0]),
    )
    my_files = sorted(
        glob.glob(os.path.join(my_out, "0", "*.xy.gz")),
        key=lambda p: int(os.path.basename(p).split(".")[0]),
    )
    assert len(ref_files) == len(my_files) and ref_files
    if spb < 1.0:
        assert len(ref_files) > 1  # the flush boundary is actually hit
    for rf, mf in zip(ref_files, my_files):
        assert gzip.open(rf).read() == gzip.open(mf).read(), rf
        ri = open(rf.replace(".xy.gz", ".xy.ind"), "rb").read()
        mi = open(mf.replace(".xy.gz", ".xy.ind"), "rb").read()
        assert ri == mi, rf


# ------------------------------------------------------------ post-hoc tools

REF_TOOLS = "/root/reference/DeepMod_tools"


def test_sum_chr_mod_differential(tmp_path):
    """The reference's own multi-run merge tool (sum_chr_mod.py, run as a
    subprocess — no TF anywhere in it) over synthetic per-run BEDs must
    produce byte-identical merged files to tools.sum_chr_mod.merge_runs."""
    import shutil
    import subprocess
    import sys

    from deepmod_tpu.aggregate.summarize import bed_line
    from deepmod_tpu.tools.sum_chr_mod import merge_runs

    rng = np.random.RandomState(8)
    chroms = ("chr1", "chr2")
    pred_ref = tmp_path / "pred_ref"
    pred_my = tmp_path / "pred_my"
    for run in ("runA/out", "runB/sub/out"):  # 2- and 3-level nesting
        for chrom in chroms:
            for strand in "+-":
                lines = []
                for pos in sorted(rng.choice(5000, 40, replace=False)):
                    cov = int(rng.randint(0, 1400))  # exercises the
                    #                      1000-cap and cov==0 percent rule
                    mod = int(rng.randint(0, cov + 1))
                    lines.append(
                        bed_line(chrom, strand, int(pos), "C", cov, mod)
                    )
                for base_dir in (pred_ref, pred_my):
                    d = base_dir / run
                    d.mkdir(parents=True, exist_ok=True)
                    (d / f"mod_pos.{chrom}{strand}.C.bed").write_text(
                        "".join(lines)
                    )

    proc = subprocess.run(
        [sys.executable, os.path.join(REF_TOOLS, "sum_chr_mod.py"),
         str(pred_ref), "C", "merged", ",".join(chroms)],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    assert merge_runs(str(pred_my), "C", "merged", ",".join(chroms)) == len(
        chroms
    )
    for chrom in chroms:
        ref_out = pred_ref / f"merged.{chrom}.C.bed"
        my_out = pred_my / f"merged.{chrom}.C.bed"
        assert ref_out.exists() and my_out.exists()
        assert ref_out.read_bytes() == my_out.read_bytes(), chrom


def test_generate_motif_pos_differential(tmp_path):
    """The reference's motif index generator (generate_motif_pos.py as a
    subprocess) vs tools.motif_index.generate_motif_positions: na_* and
    motif_* files byte-identical."""
    import subprocess
    import sys

    from deepmod_tpu.io.fasta import write_fasta
    from deepmod_tpu.tools.motif_index import generate_motif_positions

    rng = np.random.RandomState(9)
    genome = {
        "chr1": "".join(rng.choice(list("ACGT"), 4000)),
        "chr2": "".join(rng.choice(list("ACGTN"), 3000, p=[0.24, 0.24, 0.24, 0.24, 0.04])),
    }
    ref_fa = tmp_path / "ref.fa"
    write_fasta(str(ref_fa), genome)

    ref_out = tmp_path / "ref_out"
    proc = subprocess.run(
        [sys.executable, os.path.join(REF_TOOLS, "generate_motif_pos.py"),
         str(ref_fa), str(ref_out), "C", "CG", "0", "1,2"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    my_out = tmp_path / "my_out"
    generate_motif_positions(
        str(ref_fa), str(my_out), motif="CG", base="C", mod_offset=0,
        chrs=["chr1", "chr2"],
    )
    compared = 0
    for chrom in genome:
        for prefix in ("na", "motif"):
            rf = ref_out / f"{prefix}_{chrom}_C.bed"
            mf = my_out / f"{prefix}_{chrom}_C.bed"
            assert rf.exists() and mf.exists(), (prefix, chrom)
            assert rf.read_bytes() == mf.read_bytes(), (prefix, chrom)
            compared += 1
    assert compared == 4


def test_ingestion_differential_v1_gap_patching(tmp_path):
    """The v1 reader's time-derived gap patching (myDetect.py:204-231:
    filler events for >2-sample jumps, length-extension otherwise) plus a
    nonzero raw start_time, bit-identical against the reference."""
    cfg = SynthConfig(
        num_reads=12, seed=55, fast5_style="v1",
        gap_rate=0.08, gap_len=(1, 8), v1_start_time=123456,
        genome_sizes={"chrA": 20000}, read_length=(700, 1300),
    )
    _, reads = generate_dataset(str(tmp_path), cfg)
    f5ref, errs = ref_oracle.ref_get_event_signals([r.path for r in reads])
    assert not errs, errs
    filler_reads = 0
    for r in reads:
        mine = read_fast5_file(r.path)
        basecall, m_event, raw, _p, skip = f5ref[r.read_id]
        assert basecall == mine.basecall
        assert np.array_equal(raw, mine.raw_signals)
        assert len(m_event) == len(mine.m_event)
        if len(m_event) > len(r.seq):
            filler_reads += 1
        for f in EVENT_FIELDS:
            assert np.array_equal(m_event[f], mine.m_event[f]), (
                r.read_id, f
            )
    assert filler_reads > 0, "gap fixtures never exercised the patch path"


def test_error_taxonomy_differential(tmp_path):
    """Malformed fast5s must land in the same reference error classes
    (get_Event_Signals fills sp_options['Error'], myDetect.py:348-386;
    read_fast5_batch mirrors the class strings)."""
    import h5py

    from deepmod_tpu.io.fast5 import read_fast5_batch
    from deepmod_tpu.utils import ErrorCensus

    cfg = SynthConfig(
        num_reads=4, seed=91, fast5_style="v2",
        genome_sizes={"chrA": 15000}, read_length=(600, 900),
    )
    _, reads = generate_dataset(str(tmp_path), cfg)

    def clone_without(src, out_name, drop):
        dst = str(tmp_path / out_name)
        with h5py.File(src, "r") as fin, h5py.File(dst, "w") as fout:
            def copy(name):
                if any(name == d or name.startswith(d + "/") for d in drop):
                    return
                obj = fin[name]
                if isinstance(obj, h5py.Group):
                    g = fout.require_group(name)
                    for k, v in obj.attrs.items():
                        g.attrs[k] = v
                else:
                    fout.create_dataset(name, data=obj[()])
            fin.visit(copy)
            # root + intermediate group attrs
            for k, v in fin.attrs.items():
                fout.attrs[k] = v
            def copy_attrs(name, obj):
                if name in fout and isinstance(obj, h5py.Group):
                    for k, v in obj.attrs.items():
                        fout[name].attrs[k] = v
            fin.visititems(copy_attrs)
        return dst

    broken = [
        clone_without(reads[0].path, "no_events.fast5",
                      ["Analyses/Basecall_1D_000/BaseCalled_template/Events"]),
        clone_without(reads[1].path, "no_fastq.fast5",
                      ["Analyses/Basecall_1D_000/BaseCalled_template/Fastq"]),
        clone_without(reads[2].path, "no_signal.fast5", ["Raw"]),
        clone_without(reads[3].path, "no_channel.fast5", ["UniqueGlobalKey"]),
    ]
    f5ref, ref_errs = ref_oracle.ref_get_event_signals(broken)
    assert not f5ref
    my_errs = ErrorCensus()
    out = read_fast5_batch(broken, errors=my_errs)
    assert not out
    ref_classes = {k: sorted(os.path.basename(p) for p in v)
                   for k, v in ref_errs.items()}
    my_classes = {k: sorted(os.path.basename(p) for p in v)
                  for k, v in my_errs.errors.items()}
    assert ref_classes == my_classes


def test_train_loader_differential(tmp_path):
    """The reference's own feature-file loader (getDataFromFile_new,
    myMultiBiRNN.py:306-361 — numpy only, no TF at call time) vs
    train.loader.load_feature_file: windows, labels, and E-mode region
    splits element-identical; .ind sidecar parse (getGZFilePos :366-377)
    vs read_ind_sidecar."""
    from deepmod_tpu.train.loader import (
        TestSplit,
        load_feature_file,
        read_ind_sidecar,
    )

    md = ref_oracle.modules()
    cfg = SynthConfig(
        num_reads=8, seed=47, fast5_style="v2",
        genome_sizes={"chrA": 30000}, read_length=(900, 1500),
        mod_motif="CG", mod_offset=0, mod_level_shift=0.6,
    )
    genome, reads, ref_fa, _f5, sam_path, _lines = _prepare(tmp_path, cfg)
    out = os.path.join(str(tmp_path), "feat")
    res = getfeatures_run(GetFeaturesConfig(
        wrk_base=os.path.join(str(tmp_path), "fast5"), ref=ref_fa,
        out_folder=out, posneg=1, motif="CG", align_str=sam_path,
        threads=1, save_format="xy.gz",
    ))
    files = sorted(glob.glob(os.path.join(out, "*", "*.xy.gz")))
    assert files

    cases = [
        (["N", "100"], None, False),
        (["-", 5000, 20000], TestSplit(mode="E", start=5000, end=20000), False),
        (["+", 5000, 20000], TestSplit(mode="E", start=5000, end=20000), True),
    ]
    compared = 0
    for ref_test, split, for_test in cases:
        moptions = {"test": ref_test, "windowsize": 21}
        for fn in files:
            m_data, m_y, _ = md.myMultiBiRNN.getDataFromFile_new(fn, moptions)
            x, y = load_feature_file(fn, 21, split, for_test=for_test)
            assert len(x) == len(m_data), (ref_test, fn)
            if len(x):
                assert np.array_equal(np.asarray(m_data), x), (ref_test, fn)
                assert np.array_equal(np.asarray(m_y), y), (ref_test, fn)
                compared += 1
    assert compared >= 3

    # .ind sidecar parse
    for fn in files:
        ref_ind = md.myMultiBiRNN.getGZFilePos(fn)
        mine = dict(read_ind_sidecar(fn))
        assert {int(k): v for k, v in ref_ind.items()} == mine


def test_detect_region_filter_differential(tmp_path):
    """Region and chromosome filtering (myDetect.py:502-511, 548-558:
    ConUnk underscore rule, pos>start / pos+len(m_event)<end strictness)
    must keep the same read set and emit the same BEDs."""
    cfg = SynthConfig(
        num_reads=10, seed=37, fast5_style="v2",
        genome_sizes={"chr_odd": 25000, "chrB": 25000},
        read_length=(700, 1400),
    )
    genome, reads, ref_fa, f5mine, sam_path, sam_lines = _prepare(
        tmp_path, cfg
    )
    wrk_base = os.path.join(str(tmp_path), "fast5")
    f5ref, errs = ref_oracle.ref_get_event_signals([r.path for r in reads])
    assert not errs

    scenarios = [
        # ConUnk False drops chr_odd (underscore in the name)
        dict(con_unk=False, regions=((None, None, None),)),
        # region window on chrB only
        dict(con_unk=True, regions=(("chrB", 2000, 22000),)),
    ]
    for i, sc in enumerate(scenarios):
        ref_out = os.path.join(str(tmp_path), f"ref{i}", "mod")
        ct = os.path.join(ref_out, "0")
        os.makedirs(ct, exist_ok=True)
        sp_options, _sess = ref_oracle.ref_detect_batch(
            f5ref, sam_lines, genome, ct, batchid=0,
            wrkBase=wrk_base,
            outFolder=os.path.join(str(tmp_path), f"ref{i}") + "/",
            FileID="mod", fnum=7,
            ConUnk=sc["con_unk"],
            region=[tuple(r) for r in sc["regions"]],
        )
        my_out = os.path.join(str(tmp_path), f"my{i}")
        res = detect_run(
            DetectConfig(
                wrk_base=wrk_base, ref=ref_fa, model_path="unused",
                out_folder=my_out, file_id="mod", base="C", fnum=7,
                align_str=sam_path, threads=1, use_pallas=False,
                con_unk=sc["con_unk"], regions=sc["regions"],
            ),
            predictor=_RulePredictor(),
        )
        # same accepted read set
        ref_keys = sorted(str(m[3]) for m in sp_options["Mod"])
        assert res.num_reads == len(ref_keys), (i, res.num_reads, ref_keys)
        # reference sum_handler over the reference outputs == my BEDs
        ref_entries = sorted(
            tuple(str(x) for x in mod) for mod in sp_options["Mod"]
        )
        chr_strands = sorted({(e[0], e[1]) for e in ref_entries})
        sum_in = []
        for chrom in sorted({c for c, _ in chr_strands}):
            cif = os.path.join(ref_out, f"rnn.pred.ind.{chrom}")
            with open(cif, "w") as fh:
                fh.write(f"#base_folder_fast5 {wrk_base} \n")
                fh.write(f"#base_folder_output {ref_out} \n")
                for e in ref_entries:
                    if e[0] == chrom:
                        fh.write(" ".join(list(e) + ["\n"]))
            for c, s in chr_strands:
                if c == chrom:
                    sum_in.append((cif, c, s))
        sum_out = os.path.join(str(tmp_path), f"refsum{i}")
        os.makedirs(sum_out, exist_ok=True)
        beds = ref_oracle.ref_sum_handler(sum_in, sum_out, base="C")
        produced = [b for b in beds if os.path.exists(b)]
        assert produced or not ref_entries
        for bed in produced:
            mine = os.path.join(my_out, os.path.basename(bed))
            assert os.path.exists(mine), bed
            assert open(bed, "rb").read() == open(mine, "rb").read(), (i, bed)


def test_cluster_predict_tool_differential(tmp_path):
    """The reference's hm_cluster_predict.py run end-to-end as a
    subprocess, with its TF session stubbed to the SAME jax-cpu cluster
    MLP forward my tool uses (weights from the bundled reference
    checkpoint; MLP math itself is golden-pinned elsewhere to 6e-8 vs
    real TF). This differentially validates the tool's neighbor-histogram
    featurization, batching, and BED rewrite against
    tools.cluster_predict — byte-identical output files."""
    import subprocess
    import sys

    from deepmod_tpu.aggregate.summarize import bed_line
    from deepmod_tpu.io.fasta import write_fasta
    from deepmod_tpu.tools.cluster_predict import (
        cluster_predict_run,
        load_cluster_model,
    )
    from deepmod_tpu.tools.motif_index import generate_motif_positions

    rng = np.random.RandomState(12)
    genome = {"chr1": "".join(rng.choice(list("ACGT"), 6000))}
    ref_fa = tmp_path / "ref.fa"
    write_fasta(str(ref_fa), genome)
    motif_dir = tmp_path / "motif"
    generate_motif_positions(
        str(ref_fa), str(motif_dir), motif="CG", base="C", chrs=["chr1"]
    )

    # synthesize a merged per-chromosome BED over the CpG sites
    cg = []
    with open(motif_dir / "motif_chr1_C.bed") as fh:
        for line in fh:
            parts = line.split()
            cg.append((parts[2], int(parts[1])))
    lines = []
    for strand, pos in sorted(cg, key=lambda t: (t[1], t[0])):
        if rng.rand() < 0.3:
            continue  # not every CpG is covered
        cov = int(rng.randint(1, 40))
        mod = int(rng.randint(0, cov + 1))
        lines.append(bed_line("chr1", strand, pos, "C", cov, mod))
    pred_prefix = str(tmp_path / "runA")
    with open(f"{pred_prefix}.chr1.C.bed", "w") as fh:
        fh.write("".join(lines))
    pred_prefix_my = str(tmp_path / "runB")
    with open(f"{pred_prefix_my}.chr1.C.bed", "w") as fh:
        fh.write("".join(lines))

    # weights npz so the subprocess needs no TensorFlow at all
    params = load_cluster_model()  # bundled reference checkpoint
    npz = tmp_path / "cluster.npz"
    np.savez(npz, **{k: np.asarray(v) for k, v in params.items()})

    bootstrap = tmp_path / "bootstrap.py"
    bootstrap.write_text(
        '''import sys, types, locale
locale.setlocale = lambda *a, **k: ""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from deepmod_tpu.models import cluster_forward

npz = sys.argv.pop(1)
script = sys.argv.pop(1)
data = np.load(npz)
params = {k: data[k] for k in data.files}

tf = types.ModuleType("tensorflow")
class _Saver:
    def restore(self, sess, ck):
        return "restored"
tf.train = types.SimpleNamespace(
    import_meta_graph=lambda p: _Saver(),
    latest_checkpoint=lambda d: d,
)
class _Graph:
    def get_tensor_by_name(self, name):
        return name
tf.get_default_graph = lambda: _Graph()
class _Session:
    def __enter__(self):
        return self
    def __exit__(self, *a):
        return False
    def run(self, fetches, feed_dict=None):
        x = np.asarray(feed_dict["X:0"], np.float32)
        return [np.asarray(cluster_forward(params, jnp.asarray(x)))]
tf.Session = _Session
sys.modules["tensorflow"] = tf
exec(compile(open(script).read(), script, "exec"), {"__name__": "__main__"})
'''
    )
    proc = subprocess.run(
        [sys.executable, str(bootstrap), str(npz),
         os.path.join(REF_TOOLS, "hm_cluster_predict.py"),
         pred_prefix, str(motif_dir)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    ref_out = f"{pred_prefix}_clusterCpG.chr1.C.bed"
    assert os.path.exists(ref_out)

    total = cluster_predict_run(
        pred_prefix_my, str(motif_dir), model_path=str(npz), chrs=["chr1"]
    )
    assert total > 0
    my_out = f"{pred_prefix_my}_clusterCpG.chr1.C.bed"
    assert open(ref_out, "rb").read() == open(my_out, "rb").read()


def test_evaluator_differential(tmp_path):
    """The reference's E. coli evaluator (cal_EcoliDetPerf.py, run with
    rpy2/pkg_resources stubbed — its plots go through matplotlib; R is
    imported but never used) must compute the same site-level AUC/AP as
    tools.evaluate.ecoli_performance on the same mod/control BEDs."""
    import re
    import subprocess
    import sys

    from deepmod_tpu.aggregate.summarize import bed_line
    from deepmod_tpu.features.labels import scan_motif
    from deepmod_tpu.io.fasta import write_fasta
    from deepmod_tpu.tools.evaluate import ecoli_performance

    rng = np.random.RandomState(21)
    genome = {"chrE": "".join(rng.choice(list("ACGT"), 8000))}
    ref_fa = tmp_path / "ref.fa"
    write_fasta(str(ref_fa), genome)
    motif_sites, _ = scan_motif(genome, "CG", 0)

    def synth_bed_folder(folder, methylated):
        folder.mkdir(parents=True, exist_ok=True)
        codes = np.frombuffer(genome["chrE"].encode(), np.uint8)
        for strand in "+-":
            lines = []
            target = ord("C") if strand == "+" else ord("G")
            for pos in np.flatnonzero(codes == target):
                if rng.rand() < 0.4:
                    continue
                cov = int(rng.randint(1, 25))
                at_motif = (strand, int(pos)) in motif_sites["chrE"]
                p_mod = 0.75 if (methylated and at_motif) else 0.06
                mod = int(rng.binomial(cov, p_mod))
                lines.append(
                    bed_line("chrE", strand, int(pos), "C", cov, mod)
                )
            (folder / f"mod_pos.chrE{strand}.C.bed").write_text("".join(lines))

    mod_dir = tmp_path / "modrun"
    ctl_dir = tmp_path / "ctlrun"
    synth_bed_folder(mod_dir, True)
    synth_bed_folder(ctl_dir, False)

    bootstrap = tmp_path / "boot_eval.py"
    bootstrap.write_text(
        '''import sys, types
import numpy as np
if not hasattr(np, "uint"):
    np.uint = np.uint64
for name in ("rpy2", "rpy2.robjects", "rpy2.robjects.packages"):
    m = types.ModuleType(name)
    sys.modules[name] = m
sys.modules["rpy2.robjects.packages"].importr = lambda *a, **k: None
pk = types.ModuleType("pkg_resources")
pk.resource_string = lambda *a, **k: b""
sys.modules["pkg_resources"] = pk
script = sys.argv.pop(1)
exec(compile(open(script).read(), script, "exec"), {"__name__": "__main__"})
'''
    )
    fig_dir = tmp_path / "figs"
    fig_dir.mkdir()
    proc = subprocess.run(
        [sys.executable, str(bootstrap),
         os.path.join(REF_TOOLS, "cal_EcoliDetPerf.py"),
         str(mod_dir), str(ref_fa), "Cg", "0", "", "-1", "-1",
         str(fig_dir), str(ctl_dir)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    # printed metric lines: '\t\t <fig> <covt> <auc>' (roc, %.7f) and
    # '\t\t <fig> <covt> ap=<ap>' (pr, %.5f); all_mp == every site class
    ref_auc = {}
    ref_ap = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"\s+(\S+) (\d+) ap=([0-9.]+)", line)
        if m and "all_mp" in m.group(1):
            ref_ap[int(m.group(2))] = float(m.group(3))
        m = re.match(r"\s+(\S+) (\d+) ([0-9.]+)$", line)
        if m and "all_mp" in m.group(1):
            ref_auc[int(m.group(2))] = float(m.group(3))
    assert set(ref_auc) == {1, 5} and set(ref_ap) == {1, 5}, proc.stdout[-2000:]

    mine = ecoli_performance(
        [str(mod_dir)], [str(ctl_dir)], str(ref_fa), motif="CG",
        out_prefix=str(tmp_path / "perf"), make_plots=False,
    )
    for covt in (1, 5):
        assert abs(mine[f"auc_cov{covt}"] - ref_auc[covt]) < 5e-7, (
            covt, mine[f"auc_cov{covt}"], ref_auc[covt]
        )
        assert abs(mine[f"ap_cov{covt}"] - ref_ap[covt]) < 5e-5, (
            covt, mine[f"ap_cov{covt}"], ref_ap[covt]
        )


# ---------------------------------------------------------------- CLI parity


def _parser_surface(parser):
    """{option_string: (default, nargs0)} for every optional action."""
    out = {}
    for action in parser._actions:
        for opt in action.option_strings:
            if opt in ("-h", "--help"):
                continue
            out[opt] = (action.default, action.nargs == 0 or isinstance(
                action.const, bool))
    return out


def _ref_cli_parser():
    """Exec the reference CLI definition (bin/DeepMod.py builds its
    argparse tree at module scope and, with len(sys.argv) < 2, only
    prints help — no parse) and return its root parser."""
    import contextlib
    import io
    import sys

    ref_oracle.modules()  # sys.path + TF/np/h5py shims
    src = open(os.path.join(ref_oracle.REF_BIN, "..", "bin", "DeepMod.py")).read()
    ns = {"__name__": "ref_deepmod_cli"}
    argv = sys.argv
    sys.argv = ["DeepMod.py"]
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            exec(compile(src, "DeepMod.py", "exec"), ns)
    finally:
        sys.argv = argv
    return ns["parser"]


def test_cli_flag_parity_differential():
    """Every reference flag exists on our same-named subcommand with the
    SAME default (the reference's help strings lie in places — e.g.
    --files_per_thread says 500 but defaults to 1000 — so the executable
    parser, not the docs, is the contract)."""
    import argparse

    from deepmod_tpu.cli import build_parser

    ref_root = _ref_cli_parser()
    ours_root = build_parser()

    def subparsers(root):
        for action in root._actions:
            if isinstance(action, argparse._SubParsersAction):
                return action.choices
        raise AssertionError("no subparsers")

    ref_subs = subparsers(ref_root)
    our_subs = subparsers(ours_root)
    assert set(ref_subs) <= set(our_subs), set(ref_subs) - set(our_subs)

    # documented default deviations (docs/Design.md table): --alignStr
    # defaults to 'auto' (minimap2 when installed — the reference's
    # default — else the built-in aligner, which the reference can't do)
    known = {"--alignStr": ("auto", "minimap2")}

    mismatches = []
    for cmd, ref_sub in ref_subs.items():
        ref_surface = _parser_surface(ref_sub)
        our_surface = _parser_surface(our_subs[cmd])
        for opt, (ref_default, ref_flag0) in ref_surface.items():
            if known.get(opt) == (our_surface.get(opt, (None,))[0], ref_default):
                continue
            if opt not in our_surface:
                mismatches.append(f"{cmd} {opt}: missing")
                continue
            our_default, our_flag0 = our_surface[opt]
            if ref_default != our_default:
                mismatches.append(
                    f"{cmd} {opt}: default {our_default!r} != reference "
                    f"{ref_default!r}"
                )
            if ref_flag0 != our_flag0:
                mismatches.append(f"{cmd} {opt}: arity differs")
    assert not mismatches, "\n".join(mismatches)


def test_v1_collapse_round_semantics_differential(tmp_path):
    """Pin WHICH round the reference's v1 collapse actually executes on
    event means/stdvs (myDetect.py:199-231): ``round(np.float64, 3)``
    under py3/modern numpy is numpy scalar ``__round__`` =
    rint(x*1000)/1000, which differs from CPython's decimal round at
    doubles adjacent to .0005 midpoints (2.6755 -> 2.676 vs 2.675) and at
    exactly-representable midpoints ((2k+1)/2000 with 125 | 2k+1, e.g.
    0.0625 -> half-even 0.062). Crafted means drive the reference's own
    getEvent as oracle against collapse_events_v1 AND the C collapse.

    The collapse-time rounds are normally overwritten by the per-event
    stats pass (myDetect.py:342-343), so only a unit-level differential
    can observe them."""
    md = ref_oracle.modules()
    moptions = ref_oracle.base_moptions()

    # means/stdvs at CPython-vs-numpy divergence points plus fuzz
    crafted = [2.6755, 0.0625, 0.1875, 2.5755, 0.4445, 1.0005, -2.6755,
               0.5615, 0.0005, -0.0005]
    rng = np.random.RandomState(3)
    n = 64
    means = np.asarray(
        crafted + list((2 * rng.randint(0, 5000, n - len(crafted)) + 1)
                       / 2000.0)
    )
    stdvs = means[::-1].copy()
    rate = 4000.0
    starts_sec = np.cumsum(np.full(n, 6)) / rate
    lens_sec = np.full(n, 6) / rate
    move = np.ones(n, np.int64)
    move[10] = 0  # one stay so the collapse path is non-trivial
    events = np.zeros(n, dtype=[
        ("mean", "<f8"), ("stdv", "<f8"), ("start", "<f8"),
        ("length", "<f8"), ("model_state", "S5"), ("move", "<i8"),
    ])
    events["mean"] = means
    events["stdv"] = stdvs
    events["start"] = starts_sec
    events["length"] = lens_sec
    events["model_state"] = b"ACGTA"
    events["move"] = move

    class _DS:
        def __init__(self, arr):
            self.value = arr

    event_path = "/Analyses/Basecall_1D_000/BaseCalled_template/Events"
    sp_param = {
        "f5status": "",
        "f5reader": {event_path: _DS(events)},
        "channel_info": {"sampling_rate": rate},
        "raw_attributes": {"start_time": 0},
        "mfile_path": "crafted",
        "used_albacore_version": 1,
    }
    md.myDetect.getEvent(moptions, sp_param)
    assert sp_param["f5status"] == "", sp_param
    ref_event = sp_param["m_event"]

    from deepmod_tpu.io.events import collapse_events_v1

    mine, _skip = collapse_events_v1(events, rate, 0)
    assert len(mine) == len(ref_event)
    np.testing.assert_array_equal(ref_event["mean"], mine["mean"])
    np.testing.assert_array_equal(ref_event["stdv"], mine["stdv"])
    np.testing.assert_array_equal(ref_event["start"], mine["start"])
    np.testing.assert_array_equal(ref_event["length"], mine["length"])

    # the C v1 collapse on a real file carrying the same crafted table
    from deepmod_tpu.native.fast5_native import native_fast5_available

    if not native_fast5_available():
        pytest.skip("native fast5 reader unavailable")
    import ctypes

    import h5py

    from deepmod_tpu.io.events import EVENT_DTYPE
    from deepmod_tpu.native import fast5_native

    _, reads = generate_dataset(
        str(tmp_path),
        SynthConfig(genome_sizes={"chrN": 4000}, num_reads=1,
                    read_length=(200, 300), seed=47, fast5_style="v1"),
    )
    with h5py.File(reads[0].path, "r+") as fh:
        key = "Analyses/Basecall_1D_000/BaseCalled_template/Events"
        del fh[key]
        fh.create_dataset(key, data=events)
    lib = fast5_native._load()
    handle = lib.dmt_f5_open(
        reads[0].path.encode(), b"Basecall_1D_000", b"BaseCalled_template", 0
    )
    try:
        assert lib.dmt_f5_status(handle) == 0
        buf = np.empty(2 * n + 2, EVENT_DTYPE)
        skl = ctypes.c_longlong()
        skr = ctypes.c_longlong()
        cnt = int(lib.dmt_f5_events_collapsed_v1(
            handle, rate, 0,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
            ctypes.byref(skl), ctypes.byref(skr),
        ))
    finally:
        lib.dmt_f5_free(handle)
    assert cnt == len(ref_event)
    np.testing.assert_array_equal(ref_event["mean"], buf[:cnt]["mean"])
    np.testing.assert_array_equal(ref_event["stdv"], buf[:cnt]["stdv"])
