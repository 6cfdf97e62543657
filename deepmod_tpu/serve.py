"""Long-lived serving mode.

Loads the model and aligner index ONCE, keeps the jitted predictor warm,
and answers detection requests over HTTP (stdlib http.server — no extra
dependencies). This is the deployment shape the reference cannot offer
(it pays TF graph restore + genome indexing per process).

Endpoints (JSON in/out):

  GET  /healthz            -> {"status": "ok", "model": ..., "backend": ...}
  POST /detect             -> body {"fast5": ["/path1", ...]}
       returns per-read predictions and per-position counts:
       {"reads": [{"read_id", "chrom", "strand", "pos0", "n_aligned",
                   "pred_mod_num"}...],
        "positions": [[chrom, strand, pos, coverage, mod_count], ...],
        "errors": {...}}

Start:  python -m deepmod_tpu serve --Ref ref.fa --modfile m.npz --port 8765
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class _DeviceCoalescer:
    """Batches concurrent requests' windows into ONE device call.

    Under concurrency the device stage dominates request latency (each
    call pays the link round trip — ~36 ms on this tunnel — plus
    compute), and a single-flight lock makes p50 grow linearly with the
    client count. A dispatcher thread drains every request currently
    queued, concatenates their host results into one
    predict_batch_windows call (the predictor already buckets arbitrary
    batch sizes), and splits the predictions back per request — so k
    concurrent requests pay ~one device call instead of k.
    """

    def __init__(self, predictor):
        self._predictor = predictor
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def classify(self, results):
        """HostReadResult list -> per-window int8 predictions (ordered
        like the results); blocks until the coalesced call completes."""
        back: queue.Queue = queue.Queue()
        self._q.put((results, back))
        out = back.get()
        if isinstance(out, Exception):
            raise out
        return out

    def close(self) -> None:
        self._q.put(None)
        self._thread.join(timeout=5)

    def _loop(self) -> None:
        import numpy as np

        from deepmod_tpu.engine.detect import predict_batch_windows

        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            # drain everything already queued (DMT_SERVE_COALESCE=0
            # forces single-flight for A/B probes); a ~4 ms grace pass
            # catches requests whose host stage finishes just behind the
            # first one — on the tunneled link one extra wait beats a
            # whole extra device round trip
            import os as _os
            import time as _time

            if _os.environ.get("DMT_SERVE_COALESCE", "1") != "0":
                deadline = _time.monotonic() + 0.004
                while True:
                    try:
                        nxt = self._q.get_nowait()
                    except queue.Empty:
                        if _time.monotonic() < deadline:
                            _time.sleep(0.001)
                            continue
                        break
                    if nxt is None:
                        self._q.put(None)  # re-arm shutdown
                        break
                    batch.append(nxt)
                    deadline = _time.monotonic() + 0.004
            all_results = [r for results, _ in batch for r in results]
            try:
                preds = (
                    predict_batch_windows(all_results, self._predictor)
                    if all_results else np.empty(0, np.int8)
                )
            except Exception as exc:  # deliver to every waiter
                for _, back in batch:
                    back.put(exc)
                continue
            off = 0
            for results, back in batch:
                n = int(sum(r.n_aligned for r in results))
                back.put(preds[off : off + n])
                off += n


class DetectService:
    """Holds the warm model + aligner; concurrent requests coalesce
    their device work into shared batches (_DeviceCoalescer)."""

    def __init__(self, ref: str, model_path: str, base: str = "C",
                 align_str: str = "builtin", fnum: int = 7,
                 window_size: int = 21, precision: str = "bf16",
                 threads: int = 1, basecalls: str = ""):
        import jax

        from deepmod_tpu.engine.detect import WindowPredictor
        from deepmod_tpu.engine.host_worker import HostOptions, init_worker
        from deepmod_tpu.models.tf_import import load_model

        self.base = base
        params, model_config = load_model(model_path)
        import dataclasses

        model_config = dataclasses.replace(model_config, timesteps=window_size)
        # bf16 default matches detect: zero argmax flips measured on chip
        # (docs/Validation.md); fp32 stays available for bit-parity
        self.predictor = WindowPredictor(params, model_config,
                                         precision=precision)
        self.model_path = model_path
        self.backend = jax.default_backend()
        self._host_opts = HostOptions(
            ref=ref, align_str=align_str, fnum=fnum, window_size=window_size,
            base=base, con_unk=True, regions=((None, None, None),),
            basecall_1d="Basecall_1D_000",
            basecall_2strand="BaseCalled_template",
            signal_group="simple", move=False,
            basecalls=basecalls,
        )
        init_worker(self._host_opts)  # builds reference + aligner index
        # threads>1: a persistent HostPool parallelizes the host stages of
        # each request across warm spawn workers (aligner index loaded
        # once per worker at pool build, not per request)
        self._pool = None
        if threads > 1:
            from deepmod_tpu.engine.host_pool import HostPool

            self._pool = HostPool(threads, self._host_opts)
        # the host stage shares one pool / one in-process aligner — keep
        # it single-flight; the DEVICE stage coalesces across requests
        self._host_lock = threading.Lock()
        self._coalescer = _DeviceCoalescer(self.predictor)

    def close(self) -> None:
        self._coalescer.close()
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def _host_stage(self, paths):
        """Ingest+align+featurize, through the pool when one exists."""
        from deepmod_tpu.engine.host_worker import host_process_files

        if self._pool is None:
            return host_process_files(paths)
        n = min(len(self._pool._procs), max(1, len(paths)))
        chunks = [paths[i::n] for i in range(n)]
        order = [self._pool.submit_ingest_return(chunk) for chunk in chunks]
        by_bid = {}
        merged_errors: dict = {}
        pending = len(chunks)
        while pending:
            msg = self._pool.next_message()
            if msg[0] == "results":
                _, wid, bid, results, errors = msg
                by_bid[bid] = results
                for k, v in errors.items():
                    merged_errors.setdefault(k, []).extend(v)
                pending -= 1
            elif msg[0] == "error":
                _, wid, bid, phase, message = msg
                merged_errors.setdefault(
                    f"Batch worker failed: {message.split(':')[0]}", []
                ).append(f"batch_{bid}")
                pending -= 1
        results = [r for bid in order for r in by_bid.get(bid, [])]
        return results, merged_errors

    def detect(self, fast5_paths):
        with self._host_lock:
            results, errors = self._host_stage(list(fast5_paths))
        reads_out = []
        positions = {}
        if results:
            import numpy as np

            # the same device stage the detect engine runs (through the
            # cross-request coalescer) — one implementation, so
            # windowing fixes cannot diverge
            preds = self._coalescer.classify(results)
            off = 0
            for r in results:
                p = preds[off : off + r.n_aligned]
                off += r.n_aligned
                nongap = np.flatnonzero(r.base_map["readbase"] != "-")
                r.base_map["mod_pred"][nongap[p == 1]] = 1
                bm = r.base_map
                sel = (bm["refbase"] == self.base) & (bm["readbase"] != "-")
                for pos, mod in zip(
                    bm["refbasei"][sel].astype(int),
                    bm["mod_pred"][sel].astype(int),
                ):
                    key = (r.rname, r.strand, int(pos))
                    cov, m = positions.get(key, (0, 0))
                    positions[key] = (cov + 1, m + (1 if mod == 1 else 0))
                reads_out.append(
                    {
                        "read_id": r.read_id,
                        "chrom": r.rname,
                        "strand": r.strand,
                        "pos0": r.pos0,
                        "n_aligned": int(r.n_aligned),
                        "pred_mod_num": int((p == 1).sum()),
                    }
                )
        return {
            "reads": reads_out,
            "positions": [
                [c, s, p, cov, mod]
                for (c, s, p), (cov, mod) in sorted(positions.items())
            ],
            "errors": errors,
        }


def make_handler(service: DetectService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "model": service.model_path,
                    "backend": service.backend,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/detect":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                request = json.loads(self.rfile.read(length) or b"{}")
                paths = request.get("fast5", [])
                if not isinstance(paths, list) or not paths:
                    self._send(400, {"error": "body must carry a non-empty 'fast5' list"})
                    return
                self._send(200, service.detect(paths))
            except Exception as exc:  # noqa: BLE001 - report, never crash
                self._send(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(ref: str, model_path: str, port: int = 8765, host: str = "127.0.0.1",
          base: str = "C", align_str: str = "builtin",
          precision: str = "bf16", threads: int = 1,
          basecalls: str = "") -> ThreadingHTTPServer:
    """Build the warm service and return a ready (unstarted) HTTP server."""
    service = DetectService(ref, model_path, base=base, align_str=align_str,
                            precision=precision, threads=threads,
                            basecalls=basecalls)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    server.dmt_service = service  # so callers can close() the host pool
    return server


def main(argv: Optional[list] = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(prog="deepmod_tpu serve")
    parser.add_argument("--Ref", required=True)
    parser.add_argument("--modfile", required=True)
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--Base", default="C")
    parser.add_argument("--alignStr", default="builtin")
    parser.add_argument("--precision", default="bf16",
                        choices=["fp32", "bf16"])
    parser.add_argument("--threads", type=int, default=1,
                        help="host-stage workers (persistent HostPool)")
    parser.add_argument("--basecalls", default="",
                        help="dorado-style basecall BAM/SAM (mv/ts tags) "
                             "enabling .pod5 request paths")
    args = parser.parse_args(argv)
    server = serve(args.Ref, args.modfile, args.port, args.host, args.Base,
                   args.alignStr, precision=args.precision,
                   threads=args.threads, basecalls=args.basecalls)
    print(f"deepmod_tpu serving on {args.host}:{args.port}", flush=True)
    server.serve_forever()
    return 0
