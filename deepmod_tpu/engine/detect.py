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
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepmod_tpu.aggregate.summarize import CountsMap, write_bed
from deepmod_tpu.engine.outputs import (
    OutputOptions,
    build_batch_request,
    scatter_selected_preds,
    write_batch_outputs,
)
from deepmod_tpu.models.bilstm import BiLSTMConfig, bilstm_predict
from deepmod_tpu.models.tf_import import load_model
from deepmod_tpu.utils import ErrorCensus

PRE_BASE_STR = "rnn.pred.ind"  # index-file infix (myDetect.py:39)

# depth of the async chunk queue in WindowPredictor.predict/
# _predict_compact: chunk i+k's host->device transfer overlaps chunk i's
# compute + result fetch. 2 hides either side; deeper helps only when
# per-call latency (not bandwidth or memory) dominates — tunable for
# probes (device memory grows linearly with depth).
_LOOKAHEAD = int(os.environ.get("DMT_PREDICT_LOOKAHEAD", "2"))


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
    mod_cluster: bool = False         # inline CpG-cluster rescue
    output_layer: str = ""            # '' | 'sigmoid' (myMultiBiRNN.py:50-53)
    hidden: int = 100                 # validated against the model
    threads: int = 1                  # host-side ingestion workers
    precision: str = "bf16"           # 'fp32' | 'bf16' (pallas path); bf16
                                      # is default: zero argmax flips on
                                      # 65536 real windows (docs/Validation.md)
    # multi-host sharding: (host_id, num_hosts); each host processes
    # files[host_id::num_hosts] (set automatically from
    # jax.process_index()/process_count() when host_shard == 'auto')
    host_shard: Optional[Tuple[int, int]] = None
    trace_dir: Optional[str] = None   # jax.profiler trace output
    # aggregate per-position counts ON DEVICE (segment-add + psum over the
    # mesh) instead of host bincount; needs >1 device and dense-sized
    # chromosomes — the multi-chip path where merges ride the ICI.
    # Default OFF by measurement (scripts/probe_device_agg.py, round 3):
    # host bincount wins 2.6-4.2x on an 8-device CPU mesh at realistic
    # batch/chromosome sizes (the shard_map+psum machinery costs more
    # than the bandwidth-bound bincount it replaces), and on a 1-chip
    # tunneled TPU the observation transfer dominates. Kept available
    # (and engine-tested byte-identical) for real multi-chip meshes
    # where per-batch merges ride ICI instead of host memory.
    device_aggregation: bool = False
    # classify only windows whose reference base IS the target
    # (BED-identical since summaries count only refbase==Base rows, but
    # per-read files carry mod_pred 0 where the reference stores model
    # outputs for non-target rows). Under the compact-transfer default
    # the predictor still ships/classifies every built row when the
    # selection is DENSE (any single-base target, ~25% density — measured
    # parity with the standard mode, BENCH_r03/r04), and auto-routes to
    # window transfer when the selection is sparse enough (<1/window
    # density) that shipping materialized windows moves fewer bytes AND
    # less compute — see WindowPredictor.predict_from_features.
    target_only: bool = False
    # dorado-style basecall BAM/SAM (mv:B:c + ts:i tags) enabling .pod5
    # inputs under wrk_base (pod5 carries raw signal only; beyond the
    # reference, which scopes pod5 out — io/pod5.py)
    basecalls: str = ""
    # replicate the reference detect path's swapped minus-strand trim
    # accounting, which drops firstmatch!=tail '-' reads as 'Error Does
    # not match' (~2-3% of reads; see align/cigar.py docstring). False
    # keeps them with self-consistent windows — more coverage, and the
    # accounting the reference's own getfeatures variant uses
    strict_ref_clips: bool = True
    # predetail gzip level (schema pinned, level not observable downstream
    # — outputs.OutputOptions for the measurement)
    predetail_gzip: int = 1


@dataclasses.dataclass
class DetectResult:
    out_folder: str
    bed_files: List[str]
    num_reads: int
    num_windows: int
    errors: Dict[str, List[str]]
    elapsed_s: float
    stage_seconds: Dict[str, float] = dataclasses.field(default_factory=dict)


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
        buckets: Optional[Sequence[int]] = None,
        use_pallas: Optional[bool] = None,
        data_parallel: bool = True,
        precision: str = "fp32",
        compact_transfer: Optional[bool] = None,
    ):
        self.config = config
        if buckets is None:
            # 256k batches measured fastest on TPU (+8% over 128k,
            # same-process A/B; compiled lazily, so small runs never pay
            # for the big bucket); CPU keeps compiles small
            buckets = (
                (512, 4096, 16384, 65536, 131072, 262144)
                if jax.default_backend() == "tpu"
                else (512, 4096, 16384)
            )
        self.buckets = sorted(buckets)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.precision = precision
        n_dev = jax.device_count()
        if data_parallel and n_dev > 1:
            # shard window batches over all devices, params replicated;
            # buckets are multiples of any sane device count
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.asarray(jax.devices()), ("data",))
            replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(params, replicated)

            def _predict(p, x):
                return bilstm_predict(
                    p, x, config, use_pallas=self.use_pallas,
                    precision=self.precision,
                )

            if self.use_pallas:
                # a pallas_call is opaque to the SPMD partitioner; run the
                # fused kernel per shard on its local batch slice (kernels
                # pad each shard to tile multiples internally)
                _predict = jax.shard_map(
                    _predict,
                    mesh=mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
            self._fn = jax.jit(
                _predict,
                in_shardings=(replicated, NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data")),
            )
        else:
            self.params = jax.device_put(params)
            self._fn = jax.jit(
                lambda p, x: bilstm_predict(
                    p, x, config, use_pallas=self.use_pallas,
                    precision=self.precision,
                )
            )
        self._data_parallel = data_parallel and n_dev > 1
        self._n_dev = n_dev
        if compact_transfer is None:
            # ship compact (rows, fnum) feature blocks and build the
            # sliding windows ON DEVICE (21 shifted copies): 21x fewer
            # host->device bytes for bit-identical predictions
            compact_transfer = jax.default_backend() == "tpu"
        self.compact_transfer = bool(compact_transfer)
        # packed compact transfer: the 4 one-hot refbase columns ride as
        # ONE uint8 code (0..3 = ACGT, 4 = no base: '-'/'N'/pad rows) and
        # are rebuilt on device from a 5x4 LUT — 7 bytes/row instead of
        # 14 in bf16, bit-identical (LUT rows are exact 0/1; the numeric
        # columns transfer as the very same host-cast values). fnum=57's
        # histogram columns aren't safely byte-packable (counts can
        # exceed 255), so packing applies to the production fnum=7 only.
        self._pack_onehot = (
            config.num_input == 7
            and os.environ.get("DMT_COMPACT_PACK", "1") != "0"
        )
        # fnum=57: the 50 histogram columns are small nonnegative counts
        # — when every value in a call is an integer < 256 (checked; one
        # >=256 count falls back to the unpacked transfer) they ride as
        # uint8 alongside the one-hot code: 57 B/row vs 114 B in bf16.
        # uint8 -> bf16 is exact for ints < 256 (8 significand bits), so
        # predictions stay bit-identical. OPT-IN (DMT_COMPACT_PACK57=1):
        # the same-process chip A/B (scripts/probe_compact_pack.py
        # --fnum 57, round 5) measured the packed path 0.73x — the
        # device-side u8->bf16 assemble costs more than the byte cut
        # saves on this latency-floored tunnel. The halved transfer
        # targets bandwidth-bound PCIe/ICI infeed; equality stays pinned
        # (tests/test_detect_e2e.py, multichip dryrun) so flipping the
        # default is a one-line measurement away on real hardware.
        self._pack_hist = (
            config.num_input == 57
            and os.environ.get("DMT_COMPACT_PACK57", "0") == "1"
        )
        self._compact_fns: dict = {}
        # host->device payload bytes dispatched (features/windows only;
        # the int8 result fetch is negligible). Monotonic across calls —
        # callers snapshot before/after to attribute a run's traffic
        # (bench.py derives measured link MB/s from it).
        self.transfer_bytes = 0

    def _get_compact_fn(self, pack: bool):
        """Jitted (rows, F) -> (rows,) predictions (``pack``: the packed
        codes+rest variant, see _predict_compact).

        Window i = feature rows i..i+T-1 via jnp.roll shifts (the last
        T-1 windows wrap around — garbage, but valid centers never map
        there and the host discards them). Roll keeps the row count
        unchanged, so on a multi-device mesh the build runs under plain
        SPMD with feats sharded over 'data' — XLA inserts the halo
        collective-permutes — and the shard_map'd Pallas kernel consumes
        the already-built windows per shard."""
        if pack not in self._compact_fns:
            T = self.config.timesteps
            lut = np.zeros((5, 4), np.float32)
            lut[:4] = np.eye(4, dtype=np.float32)

            def _assemble(codes, rest):
                # rebuild [onehot(4) | mean stdv length] on device; the
                # LUT gather is exact 0/1 in any dtype
                return jnp.concatenate(
                    [jnp.asarray(lut, rest.dtype)[codes], rest], axis=1
                )

            def _assemble_hist(hist_u8, codes, rest):
                # fnum=57: [hist(50) | onehot(4) | mean stdv length];
                # uint8 -> feature dtype is exact for counts < 256
                return jnp.concatenate(
                    [hist_u8.astype(rest.dtype),
                     jnp.asarray(lut, rest.dtype)[codes], rest], axis=1
                )

            # multi-device build: jnp.roll keeps the row count unchanged
            # (divisible by the mesh), so the build runs under plain SPMD
            # with halo collective-permutes. Single-device uses shifted
            # SLICES instead — measured 2.5-3x faster on chip (the roll's
            # wrap concat defeats fusion into the kernel's input copy).
            def _windows(feats):
                return jnp.stack(
                    [jnp.roll(feats, -t, axis=0) for t in range(T)], axis=1
                )

            if self._data_parallel:
                from jax.sharding import (
                    Mesh, NamedSharding, PartitionSpec as P,
                )

                mesh = Mesh(np.asarray(jax.devices()), ("data",))
                replicated = NamedSharding(mesh, P())
                sharded = NamedSharding(mesh, P("data"))

                def _kernel(p, win):
                    return bilstm_predict(
                        p, win, self.config, use_pallas=self.use_pallas,
                        precision=self.precision,
                    )

                if self.use_pallas:
                    _kernel = jax.shard_map(
                        _kernel, mesh=mesh,
                        in_specs=(P(), P("data")), out_specs=P("data"),
                        check_vma=False,
                    )

                if pack == "hist":
                    def _pred_compact(p, hist_u8, codes, rest):
                        return _kernel(
                            p, _windows(_assemble_hist(hist_u8, codes, rest))
                        )

                    self._compact_fns[pack] = jax.jit(
                        _pred_compact,
                        in_shardings=(replicated, sharded, sharded, sharded),
                        out_shardings=sharded,
                    )
                elif pack:
                    def _pred_compact(p, codes, rest):
                        return _kernel(p, _windows(_assemble(codes, rest)))

                    self._compact_fns[pack] = jax.jit(
                        _pred_compact,
                        in_shardings=(replicated, sharded, sharded),
                        out_shardings=sharded,
                    )
                else:
                    def _pred_compact(p, feats):
                        return _kernel(p, _windows(feats))

                    self._compact_fns[pack] = jax.jit(
                        _pred_compact,
                        in_shardings=(replicated, sharded),
                        out_shardings=sharded,
                    )
            else:
                def _window_slices(feats):
                    rows = feats.shape[0]
                    return jnp.stack(
                        [feats[t : rows - T + 1 + t] for t in range(T)],
                        axis=1,
                    )

                if pack == "hist":
                    def _pred_compact(p, hist_u8, codes, rest):
                        win = _window_slices(
                            _assemble_hist(hist_u8, codes, rest)
                        )
                        return bilstm_predict(
                            p, win, self.config,
                            use_pallas=self.use_pallas,
                            precision=self.precision,
                        )
                elif pack:
                    def _pred_compact(p, codes, rest):
                        win = _window_slices(_assemble(codes, rest))
                        return bilstm_predict(
                            p, win, self.config,
                            use_pallas=self.use_pallas,
                            precision=self.precision,
                        )
                else:
                    def _pred_compact(p, feats):
                        win = _window_slices(feats)
                        return bilstm_predict(
                            p, win, self.config,
                            use_pallas=self.use_pallas,
                            precision=self.precision,
                        )

                self._compact_fns[pack] = jax.jit(_pred_compact)
        return self._compact_fns[pack]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _transfer_dtype(self):
        # bf16 mode: cast on the HOST before transfer — numpy/ml_dtypes
        # rounds nearest-even exactly like XLA's convert, so results are
        # bit-identical to casting on device, and host->device bytes halve
        if self.precision == "bf16" and self.use_pallas:
            import ml_dtypes

            return np.dtype(ml_dtypes.bfloat16)
        return np.dtype(np.float32)

    def predict(self, windows: np.ndarray) -> np.ndarray:
        """(N, T, F) -> (N,) int8 predictions.

        Chunk dispatch is ASYNC with a bounded in-flight queue: JAX
        enqueues host->device transfer + compute per chunk and returns
        immediately, so chunk i+1's transfer overlaps chunk i's compute
        (the result fetch is 1 byte/window — negligible). Lookahead 2 is
        enough to hide either side and bounds device memory.
        """
        n = len(windows)
        if n == 0:
            return np.empty(0, np.int8)
        dt = self._transfer_dtype()
        if windows.dtype != dt:
            windows = windows.astype(dt)
        out = np.empty(n, np.int8)
        inflight: List[Tuple[int, int, Any]] = []  # (start, count, device arr)
        lookahead = _LOOKAHEAD

        def drain(limit: int) -> None:
            while len(inflight) > limit:
                start, count, preds = inflight.pop(0)
                out[start : start + count] = np.asarray(preds)[:count]

        done = 0
        # consume DESCENDING buckets greedily, but stop descending once the
        # remainder's covering bucket pads with bounded waste (<= max of
        # the smallest bucket and ~1.5% of n): a 150k-window call runs
        # 131072 + 16384 + a padded 4096 (3 device calls, ~1% waste)
        # instead of either padding the whole call up to the top bucket
        # (~75% waste) or descending through every level (8 calls — each
        # result fetch pays the tunnel's host-sync RTT)
        max_waste = max(self.buckets[0], n >> 6)
        row_bytes = windows[:1].nbytes
        for b in reversed(self.buckets):
            while n - done >= b:
                inflight.append(
                    (done, b, self._fn(self.params, jnp.asarray(windows[done : done + b])))
                )
                done += b
                self.transfer_bytes += b * row_bytes
                drain(lookahead)
            rem = n - done
            if rem == 0 or self._bucket_for(rem) - rem <= max_waste:
                break
        if done < n:
            rem = n - done
            bucket = self._bucket_for(rem)
            if bucket == rem:
                tail = windows[done:]
            else:
                tail = np.zeros((bucket,) + windows.shape[1:], windows.dtype)
                tail[:rem] = windows[done:]
            inflight.append((done, rem, self._fn(self.params, jnp.asarray(tail))))
            self.transfer_bytes += bucket * row_bytes
        drain(0)
        return out

    def predict_from_features(
        self, features: np.ndarray, centers: np.ndarray, window: int = 21,
        assume_packable: bool = False,
    ) -> np.ndarray:
        """Classify windows cut from compact per-read feature blocks.

        ``features``: concatenated (rows, fnum) blocks (each block carries
        its own +-100 pad); ``centers``: absolute row index of each
        window's center. Workers ship the compact blocks (~21x less IPC
        than materialized windows); the windows themselves are strided
        views materialized here just before transfer. (An on-device
        gather variant measured 12x SLOWER on this hardware — 7-wide rows
        gather poorly on TPU — so transfer-then-classify stays.)

        ``assume_packable``: skip the one-hot verification scan before
        packed transfer — for ENGINE-BUILT feature blocks, whose leading
        columns are 0/1 one-hots by construction. Library callers must
        leave it False (arbitrary inputs are verified and fall back).
        """
        n = len(centers)
        if n == 0:
            return np.empty(0, np.int8)
        # SPARSE selections (region-restricted or motif-style targets):
        # the compact path ships every feature row its chunks span and
        # classifies a window per row, so once n*window < rows the
        # materialized-window path moves fewer bytes AND runs fewer
        # windows — route there (density threshold 1/window ~= 4.8%).
        # Dense targetOnly selections (any single base, ~25%) stay on the
        # compact path, where shipping each row once beats shipping 21x
        # overlapping windows.
        if self.compact_transfer and n * window >= len(features):
            return self._predict_compact(
                features, centers, window, assume_packable
            )
        half = window // 2
        view = np.lib.stride_tricks.sliding_window_view(features, window, axis=0)
        windows = np.moveaxis(view[centers - half], 2, 1)
        # astype always copies, so this materializes the strided view and
        # (in bf16 mode) does the half-width transfer cast in one pass
        return self.predict(windows.astype(self._transfer_dtype()))

    def _predict_compact(
        self, features: np.ndarray, centers: np.ndarray, window: int,
        assume_packable: bool = False,
    ) -> np.ndarray:
        """Compact-transfer classification: ship (rows, fnum) feature
        blocks, build windows on device, classify EVERY window, keep the
        requested centers host-side.

        21x less host->device traffic than materialized windows for
        bit-identical predictions (the window build is a pure copy; bf16
        rounding happens host-side on the compact rows exactly as it did
        on the windows). The per-read +-100 pads (>= window//2) guarantee
        no window of a valid center crosses into a neighboring read's
        rows; windows centered IN pad regions are computed and discarded
        (~3% extra device work). Measured on chip vs window transfer:
        see docs/Validation.md (round 3)."""
        n = len(centers)
        half = window // 2
        # the chunk advance below assumes ascending centers (the engine
        # always concatenates per-read blocks in order); one cheap pass
        # guards the public API against silent wrong answers. The bounds
        # check guards the same class of bug: a center within half a
        # window of either end would classify zero-padded garbage (or,
        # for a negative row0, silently slice rows from the array END) —
        # the engine's per-read +-100 pads make this unreachable from
        # detect, but the guard protects library callers.
        if n > 1 and not np.all(np.diff(centers) >= 0):
            raise ValueError("compact transfer requires ascending centers")
        if int(centers[0]) < half or int(centers[-1]) + half >= len(features):
            raise ValueError(
                "compact transfer requires a full window inside features "
                f"for every center (first={int(centers[0])}, "
                f"last={int(centers[-1])}, rows={len(features)}, "
                f"window={window})"
            )
        dt = self._transfer_dtype()
        if features.dtype != dt:
            features = features.astype(dt)
        pack: Any = False
        if self._pack_hist:
            # fnum=57 feature columns: [hist 0..49 | onehot 50..53 |
            # mean stdv length 54..56] (features/builder.py layout).
            # Counts must be integers < 256 for the uint8 ride-along;
            # engine-built histograms are integral by construction
            # (assume_packable), arbitrary inputs are verified.
            itemsize = features.dtype.itemsize
            hist = features[:, :50]
            check_ok = bool((hist < 256).all()) and itemsize in (2, 4)
            if check_ok and not assume_packable:
                hf = np.asarray(hist, np.float32)
                onehot_f = np.asarray(features[:, 50:54], np.float32)
                check_ok = bool(
                    (hf >= 0).all() and (hf == np.floor(hf)).all()
                    and ((onehot_f == 0.0) | (onehot_f == 1.0)).all()
                    and (onehot_f.sum(axis=1) <= 1.0).all()
                )
            if check_ok:
                pack = "hist"
                utype = np.uint16 if itemsize == 2 else np.uint32
                sign_mask = utype(0x7FFF if itemsize == 2 else 0x7FFFFFFF)
                codes = np.full(len(features), 4, np.uint8)
                for k in range(3, -1, -1):
                    col = features[:, 50 + k].view(utype)
                    codes[(col & sign_mask) != 0] = k
                rest = features[:, 54:]
        elif self._pack_onehot:
            # pack the 4 one-hot columns into ONE uint8 code (7 bytes/row
            # instead of 14 in bf16). Engine-built features always
            # qualify (and pass assume_packable to skip the scan);
            # arbitrary library inputs (cols 0..3 not a 0/1 one-hot) fall
            # back to the unpacked transfer so the packing can never
            # change an answer.
            check_ok = True
            if not assume_packable:
                onehot_f = np.asarray(features[:, :4], np.float32)
                check_ok = bool(
                    ((onehot_f == 0.0) | (onehot_f == 1.0)).all()
                    and (onehot_f.sum(axis=1) <= 1.0).all()
                )
            # the integer-view trick below only exists for 2-/4-byte
            # transfer dtypes; any other itemsize degrades to the
            # unpacked transfer instead of crashing the predict path
            itemsize = features.dtype.itemsize
            if check_ok and itemsize in (2, 4):
                pack = "onehot"
                # four strided column compares on an unsigned integer
                # view beat any argmax formulation ~6-10x (axis-1 argmax
                # over tiny rows is slow, and bf16->f32 materialization
                # costs two full passes); the sign-bit mask keeps a
                # hypothetical -0.0 reading as zero, like float compare.
                # Rows with no hit ('-'/'N' refbase, pad rows) stay 4.
                utype = np.uint16 if itemsize == 2 else np.uint32
                sign_mask = utype(0x7FFF if itemsize == 2 else 0x7FFFFFFF)
                codes = np.full(len(features), 4, np.uint8)
                for k in range(3, -1, -1):
                    col = features[:, k].view(utype)
                    codes[(col & sign_mask) != 0] = k
                rest = features[:, 4:]
        fn = self._get_compact_fn(pack)
        out = np.empty(n, np.int8)
        inflight: List[Tuple[int, int, np.ndarray, Any]] = []
        lookahead = _LOOKAHEAD

        def drain(limit: int) -> None:
            while len(inflight) > limit:
                i, j, idx, preds = inflight.pop(0)
                out[i:j] = np.asarray(preds)[idx]

        # a row chunk must cover at least one full window or the loop
        # below cannot advance (a bucket list like (8,) with window 21
        # would otherwise spin forever); round the floor up to a
        # multiple of the mesh size so sharded builds stay even
        min_rows = 1 << int(window).bit_length()
        if self._data_parallel:
            min_rows = -(-min_rows // self._n_dev) * self._n_dev
        i = 0
        while i < n:
            row0 = int(centers[i]) - half
            span = int(centers[-1]) + half + 1 - row0
            bucket = (
                self.buckets[-1]
                if span >= self.buckets[-1]
                else self._bucket_for(span)
            )
            bucket = max(bucket, min_rows)
            # centers computable from rows [row0, row0+bucket):
            # c + half <= row0 + bucket - 1
            j = int(np.searchsorted(centers, row0 + bucket - half, "left"))
            idx = np.asarray(centers[i:j]) - row0 - half
            if pack:
                c_chunk = codes[row0 : row0 + bucket]
                r_chunk = rest[row0 : row0 + bucket]
                if len(c_chunk) < bucket:
                    cpad = np.full(bucket, 4, np.uint8)
                    cpad[: len(c_chunk)] = c_chunk
                    rpad = np.zeros((bucket, rest.shape[1]), rest.dtype)
                    rpad[: len(r_chunk)] = r_chunk
                    c_chunk, r_chunk = cpad, rpad
                if pack == "hist":
                    h_chunk = hist[row0 : row0 + bucket].astype(np.uint8)
                    if len(h_chunk) < bucket:
                        hpad = np.zeros((bucket, 50), np.uint8)
                        hpad[: len(h_chunk)] = h_chunk
                        h_chunk = hpad
                    pred = fn(
                        self.params, jnp.asarray(h_chunk),
                        jnp.asarray(c_chunk),
                        jnp.asarray(np.ascontiguousarray(r_chunk)),
                    )
                    self.transfer_bytes += h_chunk.nbytes
                else:
                    pred = fn(
                        self.params, jnp.asarray(c_chunk),
                        jnp.asarray(np.ascontiguousarray(r_chunk)),
                    )
                self.transfer_bytes += c_chunk.nbytes + r_chunk.nbytes
            else:
                chunk = features[row0 : row0 + bucket]
                if len(chunk) < bucket:
                    pad = np.zeros(
                        (bucket,) + features.shape[1:], features.dtype
                    )
                    pad[: len(chunk)] = chunk
                    chunk = pad
                pred = fn(self.params, jnp.asarray(chunk))
                self.transfer_bytes += chunk.nbytes
            inflight.append((i, j, idx, pred))
            i = j
            drain(lookahead)
        drain(0)
        return out


def discover_fast5(wrk_base: str, recursive: bool = True) -> List[str]:
    """Glob fast5 (and pod5) files up to 4 levels deep
    (myDetect.py:1142-1146; .pod5 is beyond the reference)."""
    files = []
    for ext in ("*.fast5", "*.pod5"):
        files.extend(glob.glob(os.path.join(wrk_base, ext)))
        if recursive:
            for depth in ("*/", "*/*/", "*/*/*/"):
                files.extend(glob.glob(os.path.join(wrk_base, depth + ext)))
    return files


def _host_options(config: DetectConfig):
    from .host_worker import HostOptions

    return HostOptions(
        ref=config.ref,
        align_str=config.align_str,
        fnum=config.fnum,
        window_size=config.window_size,
        base=config.base,
        con_unk=config.con_unk,
        regions=tuple(config.regions),
        basecall_1d=config.basecall_1d,
        basecall_2strand=config.basecall_2strand,
        signal_group=config.signal_group,
        move=config.move,
        basecalls=config.basecalls,
        min_events=50,
        cpg_canonicalize=True,
        strict_ref_clips=config.strict_ref_clips,
    )


def _nullstage(timer):
    import contextlib

    return timer.stage if timer is not None else (
        lambda name: contextlib.nullcontext()
    )


def predict_batch_windows(
    results, predictor: WindowPredictor, timer=None,
    target_base: Optional[str] = None,
) -> np.ndarray:
    """The DEVICE part of one batch: classify every read's windows.

    With ``target_base`` set (detect --targetOnly), only windows whose
    reference base IS the target are classified — the BED summaries count
    exclusively refbase==Base positions (sum_handler, myDetect.py:
    1095-1100), so this is BED-identical at ~4x less device work and
    transfer; non-target rows get mod_pred 0 in the per-read files
    (where the reference stores their model outputs)."""
    stage = _nullstage(timer)
    with stage("device_inference"):
        all_features, all_centers, selections, n_total = build_batch_request(
            results, target_base
        )
        preds_sel = predictor.predict_from_features(
            all_features, all_centers, window=predictor.config.timesteps,
            assume_packable=True,
        )
        return scatter_selected_preds(results, selections, preds_sel, n_total)


def consume_host_results(
    results,  # List[HostReadResult]
    config: DetectConfig,
    predictor: WindowPredictor,
    counts: CountsMap,
    batch_id: int,
    ct_folder: str,
    timer=None,
) -> Tuple[int, int, List[List[str]]]:
    """Synchronous one-shot: device inference + outputs for one batch.

    The detect run paths inline the two halves to pipeline them through a
    writer thread; this composition stays as the public API for library
    users (serving-style callers) and must remain predict + apply."""
    if not results:
        return 0, 0, []
    preds = predict_batch_windows(
        results, predictor, timer,
        target_base=config.base if config.target_only else None,
    )
    return apply_batch_outputs(
        results, preds, config, counts, batch_id, ct_folder, timer
    )


def apply_batch_outputs(
    results,  # List[HostReadResult]
    preds: np.ndarray,
    config: DetectConfig,
    counts: CountsMap,
    batch_id: int,
    ct_folder: str,
    timer=None,
) -> Tuple[int, int, List[List[str]]]:
    """The OUTPUT part of one batch: prediction scatter, per-read HDF5,
    count accumulation. Runs off the device thread (the pipelined detect
    paths overlap it with the next batch's inference); mutates ``counts``,
    so at most one thread may run it at a time. The per-read loop lives
    in outputs.write_batch_outputs (shared with HostPool workers)."""
    stage = _nullstage(timer)
    if not results:
        return 0, 0, []
    use_device_agg = config.device_aggregation and jax.device_count() > 1
    batch_obs: Dict[Tuple[str, str], list] = {}

    def collect_for_device(key, item) -> bool:
        # defer cov/mod to ONE device reduction per key per batch; `seen`
        # (a boolean, no addition) is set host-side immediately
        if not counts[key].dense:
            return False
        bm = item.base_map
        is_target = bm["refbase"] == config.base
        counts[key].seen[bm["refbasei"][is_target].astype(np.int64)] = True
        sel = is_target & (bm["readbase"] != "-")
        pos = bm["refbasei"][sel].astype(np.int64)
        batch_obs.setdefault(key, []).append(
            (pos, (bm["mod_pred"][sel] == 1).astype(np.int64))
        )
        return True

    with stage("outputs_and_aggregation"):
        n_reads, n_windows, index_entries = write_batch_outputs(
            results, preds, _output_options(config), counts,
            batch_id, ct_folder,
            collect=collect_for_device if use_device_agg else None,
        )
    if batch_obs:
        with stage("device_aggregation"):
            for key, obs in batch_obs.items():
                pos = np.concatenate([o[0] for o in obs])
                mod = np.concatenate([o[1] for o in obs])
                _device_accumulate(counts[key], pos,
                                   np.ones(len(pos), np.int64), mod)
    return n_reads, n_windows, index_entries


def _output_options(config: DetectConfig) -> OutputOptions:
    return OutputOptions(
        wrk_base=config.wrk_base,
        out_base=os.path.join(config.out_folder, config.file_id),
        base=config.base,
        write_per_read=config.write_per_read,
        mod_cluster=config.mod_cluster,
        gzip_level=config.predetail_gzip,
    )


def _device_accumulate(pc, pos: np.ndarray, cov: np.ndarray,
                       mod: np.ndarray) -> None:
    """One device reduction for a batch's (positions, coverage, mod)
    observations: scatter-add per shard + psum over the mesh
    (parallel.aggregation). LOCAL devices only: under a multi-process
    jax.distributed runtime each process reduces its own batches
    independently (batch counts differ per process, so a global
    collective here would deadlock); the end-of-run cross-process merge
    (parallel.cross_process) combines the per-process results."""
    from jax.sharding import Mesh

    from deepmod_tpu.parallel.aggregation import sharded_position_counts

    mesh = Mesh(np.asarray(jax.local_devices()), ("data",))
    n_dev = mesh.devices.size
    pad = (-len(pos)) % n_dev
    if pad:
        pos = np.concatenate([pos, np.zeros(pad, np.int64)])
        mod = np.concatenate([mod, np.zeros(pad, np.int64)])
        cov = np.concatenate([cov, np.zeros(pad, np.int64)])
    cov_vec, mod_vec = sharded_position_counts(mesh, pos, cov, mod, pc.length)
    pc.coverage += np.asarray(cov_vec)
    pc.mod_count += np.asarray(mod_vec)


def _merge_counts_coo(
    counts: CountsMap, coo, use_device_agg: bool, timer=None
) -> None:
    """Fold a worker batch's COO count summary into the engine's counters
    — the only serialized piece of the output stage under HostPool."""
    from deepmod_tpu.aggregate.summarize import PositionCounts

    stage = _nullstage(timer)
    for chrom, strand, length, pos, cov, mod in coo:
        key = (chrom, strand)
        if key not in counts:
            counts[key] = PositionCounts.zeros(length)
        pc = counts[key]
        if use_device_agg and pc.dense and len(pos):
            pc.seen[pos] = True
            with stage("device_aggregation"):
                _device_accumulate(pc, pos, cov.astype(np.int64),
                                   mod.astype(np.int64))
        else:
            pc.add_coo(pos, cov, mod)


def _write_index_files(
    index_entries: List[List[str]], config: DetectConfig, part_dir: str = ""
) -> None:
    """Merged per-chromosome index files (myDetect.py:1195-1221).

    ``part_dir`` ('p<pid>' under a multi-process runtime) writes each
    process's part INSIDE its private output tree so processes on a
    shared filesystem never clobber each other and part names can never
    collide with merged outputs; process 0 then combines parts
    (parallel.cross_process.merge_index_parts)."""
    out_base = os.path.join(config.out_folder, config.file_id)
    if part_dir:
        os.makedirs(os.path.join(out_base, part_dir), exist_ok=True)
    by_chr: Dict[str, List[List[str]]] = defaultdict(list)
    for entry in index_entries:
        by_chr[entry[0]].append(entry)
    for chrom, entries in by_chr.items():
        entries = sorted(
            entries, key=lambda e: (e[0], e[1], int(e[2]), e[3], e[4], e[5])
        )
        path = os.path.join(out_base, part_dir, f"{PRE_BASE_STR}.{chrom}")
        with open(path, "w") as fh:
            fh.write(f"#base_folder_fast5 {config.wrk_base} \n")
            fh.write(
                f"#base_folder_output {os.path.abspath(out_base)} \n"
            )
            for entry in entries:
                fh.write(" ".join(entry + ["\n"]))


def detect_run(
    config: DetectConfig,
    predictor: Optional["WindowPredictor"] = None,
    host_pool=None,
) -> DetectResult:
    """Full detect: per-read prediction + genomic summaries + BED.

    With ``pred_det=False``, skips prediction and rebuilds summaries from
    an existing run's prediction files (the reference's --predDet 0 path,
    myDetect.py:1230-1263). ``predictor`` reuses an already-warm
    WindowPredictor (compiled buckets, device-resident params) across
    runs — the serving pattern; it must match the configured model.
    ``host_pool`` likewise reuses a warm engine.host_pool.HostPool
    (spawned workers + loaded aligner index, ~5 s of per-run startup
    otherwise); its HostOptions must match the config's."""
    if config.trace_dir:
        from deepmod_tpu.utils.profiling import device_trace

        with device_trace(config.trace_dir):
            return _detect_run_inner(
                dataclasses.replace(config, trace_dir=None), predictor,
                host_pool,
            )
    return _detect_run_inner(config, predictor, host_pool)


def _detect_run_inner(
    config: DetectConfig,
    predictor: Optional["WindowPredictor"] = None,
    host_pool=None,
) -> DetectResult:
    start_time = time.time()
    if not config.pred_det:
        from .summarize import summarize_run

        pred_path = config.pred_path or os.path.join(
            config.out_folder, config.file_id
        )
        bed_files = summarize_run(
            pred_path, config.out_folder, config.base, config.mod_cluster
        )
        open(config.out_folder.rstrip("/") + ".done", "w").close()
        return DetectResult(
            out_folder=config.out_folder,
            bed_files=bed_files,
            num_reads=0,
            num_windows=0,
            errors={},
            elapsed_s=time.time() - start_time,
        )
    os.makedirs(os.path.join(config.out_folder, config.file_id), exist_ok=True)

    if predictor is None:
        params, model_config = load_model(config.model_path)
        model_config = dataclasses.replace(
            model_config,
            timesteps=config.window_size,
            output_layer=config.output_layer or model_config.output_layer,
        )
        if model_config.num_input != config.fnum:
            raise ValueError(
                f"model expects fnum={model_config.num_input}, got {config.fnum}"
            )
        if model_config.num_hidden != config.hidden:
            raise ValueError(
                f"model expects hidden={model_config.num_hidden}, got {config.hidden}"
            )
        predictor = WindowPredictor(
            params, model_config, use_pallas=config.use_pallas,
            precision=config.precision,
        )

    from deepmod_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    files = sorted(discover_fast5(config.wrk_base, config.recursive))
    if config.host_shard is not None and jax.process_count() > 1:
        # every process would parse the SAME stripe and write colliding
        # outputs (multi_proc turns off below) — reject loudly
        raise ValueError(
            "host_shard is for the manual multi-run workflow (independent "
            "hosts); under a jax.distributed runtime file sharding and "
            "the collective BED merge are automatic — drop --hostShard"
        )
    if config.host_shard is not None:
        host_id, num_hosts = config.host_shard
        files = files[host_id::num_hosts]
    elif jax.process_count() > 1:
        files = files[jax.process_index() :: jax.process_count()]
    errors = ErrorCensus()
    counts: CountsMap = {}
    all_index: List[List[str]] = []
    n_reads = 0
    n_windows = 0
    out_futs: List = []

    def drain_outputs(limit: int) -> None:
        nonlocal n_reads, n_windows
        while len(out_futs) > limit:
            r, w, idx = out_futs.pop(0).result()
            n_reads += r
            n_windows += w
            all_index.extend(idx)

    from .host_worker import host_process_files, init_worker

    host_opts = _host_options(config)
    sub_folder_size = 100  # batches per subfolder (myDetect.py:1163)
    n_batches = max(1, (len(files) + config.files_per_batch - 1) // config.files_per_batch)
    batches = [
        files[i * config.files_per_batch : (i + 1) * config.files_per_batch]
        for i in range(n_batches)
    ]

    # under a multi-process runtime every process writes its per-read
    # outputs into a private p<pid>/ tree (batch ids restart at 0 in each
    # process, so shared paths would collide)
    multi_proc = jax.process_count() > 1 and config.host_shard is None
    proc_dir = f"p{jax.process_index()}" if multi_proc else ""

    def ct_folder_for(batch_id: int) -> str:
        folder = os.path.join(
            config.out_folder, config.file_id, proc_dir,
            str(batch_id // sub_folder_size),
        )
        os.makedirs(folder, exist_ok=True)
        return folder

    if config.threads > 1 and len(batches) > 1:
        # host stages AND output writes in spawn-context workers (they
        # never touch the TPU): each worker ingests a batch, ships the
        # compact feature block up for device classification, receives
        # the predictions back, and writes ITS batch's predetail HDF5 in
        # parallel with every other worker (per-batch files — the
        # reference's own exclusivity guarantee, myDetect.py:714-760).
        # Only the COO count merge is serialized here. Worker IPC per
        # batch: compact features up (21x less than windows), int8 preds
        # down, COO counts + index entries up — base maps never cross.
        from .host_pool import HostPool

        out_opts = _output_options(config)
        target_base = config.base if config.target_only else None
        own_pool = host_pool is None
        pool = host_pool if host_pool is not None else HostPool(
            config.threads, host_opts
        )
        if pool.host_opts != host_opts:
            raise ValueError(
                "host_pool was built with different HostOptions than this "
                "config resolves to — reuse is only valid across runs over "
                "the same reference/aligner/feature settings"
            )
        from collections import deque

        todo = deque(
            (batch_id, batch)
            for batch_id, batch in enumerate(batches) if batch
        )
        bid_to_batch: Dict[int, int] = {}  # pool bid -> run batch id
        outstanding = 0
        ok = False
        try:
            while todo or outstanding:
                # keep every live worker ~2 batches deep: one being
                # ingested, one awaiting preds/writing outputs
                while todo:
                    load = pool.min_load()
                    if load is None:  # every worker died: fail the rest
                        while todo:
                            batch_id, _ = todo.popleft()
                            errors.add(
                                "Batch worker failed: WorkerDied",
                                f"batch_{batch_id}",
                            )
                        break
                    if load >= 2:
                        break
                    batch_id, batch = todo.popleft()
                    bid = pool.submit_ingest(
                        batch_id, batch, ct_folder_for(batch_id),
                        out_opts, target_base,
                    )
                    bid_to_batch[bid] = batch_id
                    outstanding += 1
                if not outstanding:
                    continue
                msg = pool.next_message()
                kind = msg[0]
                if kind == "features":
                    _, wid, bid, feats, centers, batch_errors = msg
                    for ekind, paths in batch_errors.items():
                        errors.extend(ekind, paths)
                    with timer.stage("device_inference"):
                        preds_sel = predictor.predict_from_features(
                            feats, centers,
                            window=predictor.config.timesteps,
                            assume_packable=True,
                        )
                    pool.send_preds(wid, bid, preds_sel)
                elif kind == "outputs":
                    (_, wid, bid, n_r, n_w, idx, coo, secs,
                     batch_errors) = msg
                    for ekind, paths in batch_errors.items():
                        errors.extend(ekind, paths)
                    n_reads += n_r
                    n_windows += n_w
                    all_index.extend(idx)
                    if secs:
                        timer.add("outputs_in_workers", secs)
                    with timer.stage("counts_merge"):
                        _merge_counts_coo(
                            counts, coo,
                            config.device_aggregation
                            and jax.device_count() > 1,
                            timer,
                        )
                    bid_to_batch.pop(bid, None)
                    outstanding -= 1
                elif kind == "error":
                    _, wid, bid, phase, message = msg
                    errors.add(
                        f"Batch worker failed: {message.split(':')[0]}",
                        f"batch_{bid_to_batch.pop(bid, bid)}",
                    )
                    outstanding -= 1
            ok = True
        finally:
            if own_pool:
                pool.close()
            elif not ok:
                # a shared pool must come back clean after this run's
                # exception — drop its in-flight state and stashed
                # worker batches so the next run schedules freshly
                pool.abandon_inflight()
    else:
        # single-process path still overlaps: a prefetch thread prepares
        # the NEXT batch's host work while the device consumes the current
        # one (the host stages release the GIL in h5py/numpy/C++ kernels)
        import concurrent.futures as cf

        init_worker(host_opts)
        todo = [(batch_id, batch) for batch_id, batch in enumerate(batches) if batch]
        with cf.ThreadPoolExecutor(max_workers=1) as prefetch, \
                cf.ThreadPoolExecutor(max_workers=1) as writer:
            future = (
                prefetch.submit(host_process_files, todo[0][1]) if todo else None
            )
            for pos, (batch_id, batch) in enumerate(todo):
                try:
                    with timer.stage("host_ingest_align_features"):
                        results, batch_errors = future.result()
                except Exception as exc:
                    errors.add(
                        f"Batch worker failed: {type(exc).__name__}",
                        f"batch_{batch_id}",
                    )
                    results, batch_errors = [], {}
                if pos + 1 < len(todo):
                    future = prefetch.submit(host_process_files, todo[pos + 1][1])
                for kind, paths in batch_errors.items():
                    errors.extend(kind, paths)
                if not results:
                    continue
                preds = predict_batch_windows(
                    results, predictor, timer,
                    target_base=config.base if config.target_only else None,
                )
                for r in results:
                    r.features = None  # outputs never read them; frees
                                       # the batch's largest allocation
                out_futs.append(
                    writer.submit(
                        apply_batch_outputs, results, preds, config, counts,
                        batch_id, ct_folder_for(batch_id), timer,
                    )
                )
                drain_outputs(2)  # bound the writer backlog
            drain_outputs(0)

    if config.write_per_read:
        _write_index_files(
            all_index, config, part_dir=proc_dir if multi_proc else ""
        )

    if multi_proc:
        # SPMD merge over ICI/DCN replacing the reference's filesystem
        # barrier (myDetect.py:1196-1221): per-(chr,strand) COO counts are
        # all-gathered across processes (deterministic key grid from the
        # replicated FASTA), then process 0 alone emits the merged BEDs.
        from deepmod_tpu.io.fasta import FastaReference
        from deepmod_tpu.parallel.cross_process import (
            merge_counts_across_processes,
            merge_index_parts,
        )

        with timer.stage("cross_process_merge"):
            ref_fa = FastaReference(config.ref)
            chrom_lengths = {n: ref_fa.length(n) for n in ref_fa.names()}
            counts = merge_counts_across_processes(counts, chrom_lengths)
        if config.write_per_read:
            # every process has written its index parts once it reaches
            # the collective above; merge on the lead process (no-op for
            # parts on another host's private disk)
            if jax.process_index() == 0:
                merge_index_parts(
                    os.path.join(config.out_folder, config.file_id),
                    PRE_BASE_STR,
                    jax.process_count(),
                )

    bed_files: List[str] = []
    if not multi_proc or jax.process_index() == 0:
        prefix = "cluster_mod_pos" if config.mod_cluster else "mod_pos"
        for (chrom, strand), pc in sorted(counts.items()):
            bed_path = os.path.join(
                config.out_folder, f"{prefix}.{chrom}{strand}.{config.base}.bed"
            )
            if write_bed(bed_path, chrom, strand, config.base, pc) > 0:
                bed_files.append(bed_path)

        # completion sentinel (myDetect.py:1263)
        open(config.out_folder.rstrip("/") + ".done", "w").close()
    if multi_proc:
        from jax.experimental import multihost_utils

        # other processes return only after the lead finished the outputs
        multihost_utils.sync_global_devices("dmt_detect_done")

    return DetectResult(
        out_folder=config.out_folder,
        bed_files=bed_files,
        num_reads=n_reads,
        num_windows=n_windows,
        errors=errors.errors,
        elapsed_s=time.time() - start_time,
        stage_seconds=timer.as_dict(),
    )
