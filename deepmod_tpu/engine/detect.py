"""End-to-end modification detection pipeline.

The TPU-native counterpart of the reference's detect path
(mDetect_manager -> detect_handler -> mDetect1 -> handle_record ->
mPredict1 -> sum_handler, myDetect.py:1124-1263, 948-984, 392-465,
488-782, 787-834, 1028-1120):

- fast5 batches are ingested and aligned on the host (vectorized numpy +
  the in-process aligner), producing fixed-shape window batches;
- ALL windows of a file batch are concatenated and streamed through ONE
  jitted BiLSTM with bucketed static batch shapes — instead of the
  reference's per-read 512-window sess.run chunks, so the MXU sees large
  dense batches and recompilation is bounded by the bucket count;
- per-read predictions are scattered back to base maps, written in the
  reference's exact on-disk formats (predetail HDF5 + index files), and
  simultaneously accumulated into dense per-(chr,strand) counters so BED
  emission needs no second pass over the prediction files.

A summarize-only mode (pred_det=False) re-reads reference-format
predetail files, mirroring myDetect.py:988-1120.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmod_tpu.aggregate.summarize import (
    CountsMap,
    accumulate_base_map,
    write_bed,
)
from deepmod_tpu.align.aligner import get_aligner
from deepmod_tpu.align.cigar import (
    AlignmentRejected,
    BaseMapResult,
    expand_alignment,
)
from deepmod_tpu.align.sam import filter_best_alignments
from deepmod_tpu.features.builder import (
    FeatureBuildError,
    build_feature_matrix,
    extract_windows,
    map_predictions_to_base_map,
)
from deepmod_tpu.io.fast5 import Fast5Read, Fast5ReadOptions, read_fast5_batch
from deepmod_tpu.io.fasta import FastaReference
from deepmod_tpu.models.bilstm import BiLSTMConfig, bilstm_predict
from deepmod_tpu.models.tf_import import load_model
from deepmod_tpu.utils import ErrorCensus

PRE_BASE_STR = "rnn.pred.ind"  # index-file infix (myDetect.py:39)


@dataclasses.dataclass
class DetectConfig:
    wrk_base: str
    ref: str
    model_path: str
    out_folder: str
    file_id: str = "mod"
    base: str = "C"
    fnum: int = 7
    window_size: int = 21
    align_str: str = "auto"
    basecall_1d: str = "Basecall_1D_000"
    basecall_2strand: str = "BaseCalled_template"
    signal_group: str = "simple"
    move: bool = False
    con_unk: bool = True
    # regions: list of (chrom|None, start|None, end|None) (DeepMod.py:152-160)
    regions: Sequence[Tuple[Optional[str], Optional[int], Optional[int]]] = (
        (None, None, None),
    )
    recursive: bool = True
    files_per_batch: int = 1000
    use_pallas: Optional[bool] = None
    pred_det: bool = True
    pred_path: Optional[str] = None   # for summarize-only mode
    write_per_read: bool = True       # predetail HDF5 + index files


@dataclasses.dataclass
class DetectResult:
    out_folder: str
    bed_files: List[str]
    num_reads: int
    num_windows: int
    errors: Dict[str, List[str]]
    elapsed_s: float


class WindowPredictor:
    """Bucketed, jitted window classification.

    Static shapes per bucket keep XLA compiles bounded; the final partial
    chunk pads up to the smallest covering bucket and the padding is
    sliced off after argmax (padding windows are zeros — harmless).
    """

    def __init__(
        self,
        params,
        config: BiLSTMConfig,
        buckets: Sequence[int] = (512, 4096, 16384),
        use_pallas: Optional[bool] = None,
    ):
        self.params = jax.device_put(params)
        self.config = config
        self.buckets = sorted(buckets)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self._fn = jax.jit(
            lambda p, x: bilstm_predict(p, x, config, use_pallas=self.use_pallas)
        )

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, windows: np.ndarray) -> np.ndarray:
        """(N, T, F) -> (N,) int8 predictions."""
        n = len(windows)
        if n == 0:
            return np.empty(0, np.int8)
        out = np.empty(n, np.int8)
        big = self.buckets[-1]
        done = 0
        while n - done >= big:
            chunk = jnp.asarray(windows[done : done + big])
            out[done : done + big] = np.asarray(self._fn(self.params, chunk))
            done += big
        if done < n:
            rem = n - done
            bucket = self._bucket_for(rem)
            padded = np.zeros((bucket,) + windows.shape[1:], windows.dtype)
            padded[:rem] = windows[done:]
            preds = np.asarray(self._fn(self.params, jnp.asarray(padded)))
            out[done:] = preds[:rem]
        return out


def discover_fast5(wrk_base: str, recursive: bool = True) -> List[str]:
    """Glob fast5 files up to 4 levels deep (myDetect.py:1142-1146)."""
    files = glob.glob(os.path.join(wrk_base, "*.fast5"))
    if recursive:
        for depth in ("*/*.fast5", "*/*/*.fast5", "*/*/*/*.fast5"):
            files.extend(glob.glob(os.path.join(wrk_base, depth)))
    return files


def _chrom_ok(rname: str, config: DetectConfig) -> bool:
    if not config.con_unk and any(c in rname for c in "_-/:"):
        return False
    return any(r[0] in ("", None, rname) for r in config.regions)


def _region_ok(rname: str, pos: int, n_events: int, config: DetectConfig) -> bool:
    for chrom, start, end in config.regions:
        if (
            chrom in ("", None, rname)
            and (start in ("", None) or pos > start)
            and (end in ("", None) or pos + n_events < end)
        ):
            return True
    return False


@dataclasses.dataclass
class _ReadWork:
    read: Fast5Read
    bmr: BaseMapResult
    pos0: int          # 0-based mapped position from SAM
    n_aligned: int
    window_offset: int


def _save_predetail(
    h5_path: str,
    pred_key: str,
    bmr: BaseMapResult,
    read: Fast5Read,
    pred_mod_num: int,
    read_id: str,
) -> None:
    """Per-read prediction HDF5, format-identical to myDetect.py:716-760."""
    import h5py

    bm = bmr.base_map
    with h5py.File(h5_path, "a") as fh:
        base_group = fh["pred"] if "pred" in fh else fh.create_group("pred")
        if pred_key in base_group:
            del base_group[pred_key]
        group = base_group.create_group(pred_key)
        group.attrs["mapped_chr"] = bmr.rname
        group.attrs["mapped_strand"] = bmr.strand
        group.attrs["mapped_start"] = (
            bm["refbasei"][0] if bmr.strand == "+" else bm["refbasei"][-1]
        )
        group.attrs["mapped_end"] = (
            bm["refbasei"][-1] if bmr.strand == "+" else bm["refbasei"][0]
        )
        group.attrs["clipped_bases_start"] = (
            bmr.left_clip if bmr.strand == "+" else bmr.right_clip
        )
        group.attrs["clipped_bases_end"] = (
            bmr.right_clip if bmr.strand == "+" else bmr.left_clip
        )
        group.attrs["num_insertions"] = bmr.num_insert
        group.attrs["num_deletions"] = bmr.num_del
        group.attrs["num_matches"] = bmr.num_match
        group.attrs["num_mismatches"] = bmr.num_mismatch
        group.attrs["pred_mod_num"] = pred_mod_num
        group.attrs["f5file"] = read.path
        group.attrs["readk"] = read_id
        as_s1 = np.empty(
            len(bm),
            dtype=[("refbase", "S1"), ("readbase", "S1"),
                   ("refbasei", np.uint64), ("readbasei", np.uint64),
                   ("mod_pred", np.int64)],
        )
        for field in ("refbase", "readbase", "refbasei", "readbasei", "mod_pred"):
            as_s1[field] = bm[field]
        group.create_dataset("predetail", data=as_s1, compression="gzip")


def process_batch(
    f5files: Sequence[str],
    config: DetectConfig,
    predictor: WindowPredictor,
    reference: FastaReference,
    counts: CountsMap,
    batch_id: int,
    ct_folder: str,
    errors: ErrorCensus,
) -> Tuple[int, int, List[List[str]]]:
    """One file batch: ingest -> align -> features -> predict -> outputs.

    Returns (n_reads, n_windows, index_entries).
    """
    read_opts = Fast5ReadOptions(
        basecall_1d=config.basecall_1d,
        basecall_2strand=config.basecall_2strand,
        signal_group=config.signal_group,
        move=config.move,
    )
    f5data = read_fast5_batch(list(f5files), read_opts, errors)
    if not f5data:
        return 0, 0, []

    aligner = get_aligner(config.ref, config.align_str)
    records = aligner.align({rid: r.basecall for rid, r in f5data.items()})
    best = filter_best_alignments(records)
    for rid, read in f5data.items():
        if rid not in best:
            errors.add("Not in alignment sam", read.path)

    # host-side feature construction
    work: List[_ReadWork] = []
    window_blocks: List[np.ndarray] = []
    total_windows = 0
    for rid in sorted(best):
        rec = best[rid]
        read = f5data[rid]
        if not _chrom_ok(rec.rname, config):
            continue
        pos0 = rec.pos - 1
        if not _region_ok(rec.rname, pos0, len(read.m_event), config):
            continue
        if rec.rname not in reference:
            errors.add("Not in alignment sam", read.path)
            continue
        refseq = reference.fetch(rec.rname)
        try:
            bmr = expand_alignment(
                refseq, rec.seq, pos0, rec.cigar, rec.strand, rec.rname,
                len(read.m_event), min_events=50,
            )
            mfeat, start_clip, end_clip = build_feature_matrix(
                read.m_event, read.raw_signals, read.basecall, bmr,
                fnum=config.fnum,
            )
        except (AlignmentRejected, FeatureBuildError) as exc:
            errors.add(str(exc), read.path)
            continue
        n_aligned = len(read.m_event) - start_clip - end_clip
        windows = extract_windows(
            mfeat, n_aligned, window=config.window_size
        )
        work.append(_ReadWork(read, bmr, pos0, n_aligned, total_windows))
        window_blocks.append(windows)
        total_windows += n_aligned

    if not work:
        return 0, 0, []

    all_windows = np.concatenate(window_blocks, axis=0)
    preds = predictor.predict(all_windows)

    index_entries: List[List[str]] = []
    pred_file = os.path.join(ct_folder, f"rnn.pred.detail.fast5.{batch_id}")
    for readk_ind, item in enumerate(work):
        p = preds[item.window_offset : item.window_offset + item.n_aligned]
        pred_mod_num = map_predictions_to_base_map(item.bmr, p)
        accumulate_base_map(
            counts, item.bmr, config.base, reference.length(item.bmr.rname)
        )
        if config.write_per_read:
            pred_key = f"pred_{readk_ind}"
            _save_predetail(
                pred_file, pred_key, item.bmr, item.read, pred_mod_num,
                item.read.read_id,
            )
            rel_f5 = os.path.relpath(item.read.path, config.wrk_base)
            rel_pred = os.path.relpath(
                pred_file, os.path.join(config.out_folder, config.file_id)
            )
            index_entries.append(
                [item.bmr.rname, item.bmr.strand, str(item.pos0), pred_key,
                 rel_f5, rel_pred]
            )
    return len(work), total_windows, index_entries


def _write_index_files(
    index_entries: List[List[str]], config: DetectConfig
) -> None:
    """Merged per-chromosome index files (myDetect.py:1195-1221)."""
    out_base = os.path.join(config.out_folder, config.file_id)
    by_chr: Dict[str, List[List[str]]] = defaultdict(list)
    for entry in index_entries:
        by_chr[entry[0]].append(entry)
    for chrom, entries in by_chr.items():
        entries = sorted(
            entries, key=lambda e: (e[0], e[1], int(e[2]), e[3], e[4], e[5])
        )
        path = os.path.join(out_base, f"{PRE_BASE_STR}.{chrom}")
        with open(path, "w") as fh:
            fh.write(f"#base_folder_fast5 {config.wrk_base} \n")
            fh.write(
                f"#base_folder_output {os.path.abspath(out_base)} \n"
            )
            for entry in entries:
                fh.write(" ".join(entry + ["\n"]))


def detect_run(config: DetectConfig) -> DetectResult:
    """Full detect: per-read prediction + genomic summaries + BED."""
    start_time = time.time()
    os.makedirs(os.path.join(config.out_folder, config.file_id), exist_ok=True)

    params, model_config = load_model(config.model_path)
    model_config = dataclasses.replace(
        model_config, timesteps=config.window_size
    )
    if model_config.num_input != config.fnum:
        raise ValueError(
            f"model expects fnum={model_config.num_input}, got {config.fnum}"
        )
    predictor = WindowPredictor(params, model_config, use_pallas=config.use_pallas)
    reference = FastaReference(config.ref)

    files = sorted(discover_fast5(config.wrk_base, config.recursive))
    errors = ErrorCensus()
    counts: CountsMap = {}
    all_index: List[List[str]] = []
    n_reads = 0
    n_windows = 0

    sub_folder_size = 100  # batches per subfolder (myDetect.py:1163)
    for batch_id in range(0, max(1, (len(files) + config.files_per_batch - 1) // config.files_per_batch)):
        batch = files[batch_id * config.files_per_batch : (batch_id + 1) * config.files_per_batch]
        if not batch:
            continue
        ct_folder = os.path.join(
            config.out_folder, config.file_id, str(batch_id // sub_folder_size)
        )
        os.makedirs(ct_folder, exist_ok=True)
        r, w, idx = process_batch(
            batch, config, predictor, reference, counts, batch_id, ct_folder,
            errors,
        )
        n_reads += r
        n_windows += w
        all_index.extend(idx)

    if config.write_per_read:
        _write_index_files(all_index, config)

    bed_files: List[str] = []
    prefix = "mod_pos"
    for (chrom, strand), pc in sorted(counts.items()):
        bed_path = os.path.join(
            config.out_folder, f"{prefix}.{chrom}{strand}.{config.base}.bed"
        )
        if write_bed(bed_path, chrom, strand, config.base, pc) > 0:
            bed_files.append(bed_path)

    # completion sentinel (myDetect.py:1263)
    open(config.out_folder.rstrip("/") + ".done", "w").close()

    return DetectResult(
        out_folder=config.out_folder,
        bed_files=bed_files,
        num_reads=n_reads,
        num_windows=n_windows,
        errors=errors.errors,
        elapsed_s=time.time() - start_time,
    )
