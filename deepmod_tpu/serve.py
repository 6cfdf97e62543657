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
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class DetectService:
    """Holds the warm model + aligner; thread-safe single-flight detect."""

    def __init__(self, ref: str, model_path: str, base: str = "C",
                 align_str: str = "builtin", fnum: int = 7,
                 window_size: int = 21, precision: str = "bf16",
                 threads: int = 1):
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
        )
        init_worker(self._host_opts)  # builds reference + aligner index
        # threads>1: a persistent HostPool parallelizes the host stages of
        # each request across warm spawn workers (aligner index loaded
        # once per worker at pool build, not per request)
        self._pool = None
        if threads > 1:
            from deepmod_tpu.engine.host_pool import HostPool

            self._pool = HostPool(threads, self._host_opts)
        self._lock = threading.Lock()

    def close(self) -> None:
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
        with self._lock:
            results, errors = self._host_stage(list(fast5_paths))
            reads_out = []
            positions = {}
            if results:
                import numpy as np

                from deepmod_tpu.engine.detect import predict_batch_windows

                # the same device stage the detect engine runs — one
                # implementation, so windowing fixes cannot diverge
                preds = predict_batch_windows(results, self.predictor)
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
          precision: str = "bf16", threads: int = 1) -> ThreadingHTTPServer:
    """Build the warm service and return a ready (unstarted) HTTP server."""
    service = DetectService(ref, model_path, base=base, align_str=align_str,
                            precision=precision, threads=threads)
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
    args = parser.parse_args(argv)
    server = serve(args.Ref, args.modfile, args.port, args.host, args.Base,
                   args.alignStr, precision=args.precision,
                   threads=args.threads)
    print(f"deepmod_tpu serving on {args.host}:{args.port}", flush=True)
    server.serve_forever()
    return 0
