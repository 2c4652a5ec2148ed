"""HTTP serving surface (cli/serve.py): routed forward behind a
persistent stdlib server. Pins: healthz gating, /info counters, PNG
round-trip equality with the direct model.upscale path, tiled mode on
odd frame sizes, and malformed-input resilience."""

import argparse
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.cli import serve


TINY = ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"]


def _ckpt(tmp_path):
    m = get_model("edsr")
    m.parse_args(list(TINY))
    m.prepare(is_training=True, scales=[4])
    m.global_step = 5
    return m, m.save(str(tmp_path))


def _args(ckpt, **over):
    base = dict(model="edsr", scales="4", restore_path=ckpt, restore_target=None,
                chop_forward=False, chop_overlap_size=20, tile_forward=False,
                tile_size=32, tile_overlap=8, spatial_shard=0, spatial_halo=32,
                collapsed_tail=1, packed_trunk=1, int8_trunk=0,
                int8_calib_path=None, dp_devices=0)
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    model, ckpt = _ckpt(tmp)
    service = serve.build_service(_args(ckpt), list(TINY))
    httpd = serve.make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    yield service, httpd, url, model
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_healthz_gates_on_warmup(server):
    service, _, url, _ = server
    code, body = _get(url + "/healthz")
    assert (code, body) == (503, b"warming up")
    service.warmup(8, 8)
    code, body = _get(url + "/healthz")
    assert (code, body) == (200, b"ok")


def test_upscale_matches_direct_path(server):
    service, _, url, model = server
    service.ready or service.warmup(8, 8)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (3, 9, 11)).astype(np.float32)
    png = serve.chw_to_png(img)

    code, body = _post(url + "/upscale", png)
    assert code == 200
    out = serve.png_to_chw(body)
    assert out.shape == (3, 36, 44)

    # the server's answer must equal the library path on the SAME decoded
    # pixels (encode/decode quantizes the input once on both sides)
    direct = model.upscale([serve.png_to_chw(png)], scale=4)[0]
    np.testing.assert_array_equal(out, np.clip(np.round(direct), 0, 255))


def test_info_counts_requests(server):
    service, _, url, _ = server
    before = service.num_requests
    code, body = _get(url + "/info")
    assert code == 200
    info = json.loads(body)
    assert info["model"] == "edsr"
    assert info["scale"] == 4
    assert info["num_requests"] == before


def test_metrics_prometheus_exposition(server):
    service, _, url, _ = server
    service.ready or service.warmup(8, 8)
    code, body = _get(url + "/metrics")
    assert code == 200
    text = body.decode()
    assert "# TYPE lvt_requests_total counter" in text
    assert "lvt_ready 1" in text
    assert 'lvt_device_seconds{quantile="0.50"}' in text
    # every sample line must be "name[{labels}] value"
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        name, val = line.rsplit(" ", 1)
        float(val)


def test_malformed_input_is_400_and_survives(server):
    service, _, url, _ = server
    code, body = _post(url + "/upscale", b"this is not a png")
    assert code == 400 and b"bad request" in body
    code, _ = _get(url + "/healthz")
    assert code == 200  # server alive


def test_unknown_path_404(server):
    _, _, url, _ = server
    assert _get(url + "/nope")[0] == 404
    assert _post(url + "/nope", b"x")[0] == 404


def test_oversized_body_is_413_and_survives(tmp_path):
    """--max_body_mb caps the client-declared Content-Length before the
    body is read (advisor r2: memory exhaustion from one request); the
    default server fixture uses the 64 MiB default, so spin a 0-MiB one."""
    model, ckpt = _ckpt(tmp_path)
    service = serve.build_service(_args(ckpt), list(TINY))
    httpd = serve.make_server(service, "127.0.0.1", 0, max_body_mb=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        code, body = _post(url + "/upscale", b"x")
        assert code == 413 and b"exceeds" in body
        # server alive (503 = not yet warmed, still serving)
        assert _get(url + "/healthz")[0] in (200, 503)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_error_body_hides_internals(server):
    """400 bodies must not echo exception internals to clients."""
    _, _, url, _ = server
    code, body = _post(url + "/upscale", b"\x89PNG\r\n\x1a\nbroken")
    assert code == 400
    assert b"Traceback" not in body and b"Error" not in body
    assert body == b"bad request: could not decode or process the image"


def test_tiled_mode_on_odd_frames(tmp_path):
    _, ckpt = _ckpt(tmp_path)
    service = serve.build_service(
        _args(ckpt, tile_forward=True), list(TINY))
    service.warmup(16, 16)
    httpd = serve.make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (3, 37, 41)).astype(np.float32)
        code, body = _post(url + "/upscale", serve.chw_to_png(img))
        assert code == 200
        assert serve.png_to_chw(body).shape == (3, 148, 164)
    finally:
        httpd.shutdown()
        httpd.server_close()


# ---------------------------------------------------------------------------
# concurrency: N clients, bounded device queue, tail-latency stats
# ---------------------------------------------------------------------------

def test_concurrent_clients(server):
    """8 threads x 4 requests: every response 200 and bitwise-equal to
    the single-client answer; /info counts and percentiles populated."""
    service, _, url, model = server
    service.ready or service.warmup(8, 8)
    before = service.num_requests
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (3, 10, 12)).astype(np.float32)
    png = serve.chw_to_png(img)
    expect = np.clip(np.round(
        model.upscale([serve.png_to_chw(png)], scale=4)[0]), 0, 255)

    results = []

    def client():
        for _ in range(4):
            results.append(_post(url + "/upscale", png))

    threads = [threading.Thread(target=client) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(results) == 32
    assert all(code == 200 for code, _ in results)
    for _, body in results:
        np.testing.assert_array_equal(serve.png_to_chw(body), expect)

    info = json.loads(_get(url + "/info")[1])
    assert info["num_requests"] == before + 32
    dev = info["device_seconds"]
    wait = info["queue_wait_seconds"]
    assert dev["p50"] <= dev["p95"] <= dev["p99"]
    assert wait["p50"] <= wait["p95"] <= wait["p99"]
    assert dev["p95"] > 0  # real forwards were timed


class _SlowModel:
    """Duck-typed SRModel surface whose forward blocks: forces a real
    device-lock queue so the shedding path is deterministic."""

    registry_name = "slow"

    def __init__(self, hold_s=0.25):
        self.hold_s = hold_s

    def upscale(self, input_list, scale):
        import time as _t

        _t.sleep(self.hold_s)
        return [np.repeat(np.repeat(input_list[0], scale, 1), scale, 2)]


def test_load_shedding_503():
    """With --max_queue 1, a burst beyond one in-flight + one queued
    request sheds with 503 + Retry-After instead of queueing unboundedly."""
    service = serve.SRService(_SlowModel(), 4, "direct", max_queue=1)
    service.ready = True
    httpd = serve.make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    png = serve.chw_to_png(np.zeros((3, 4, 4), np.float32))
    try:
        results = []

        def client():
            results.append(_post(url + "/upscale", png))

        threads = [threading.Thread(target=client) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        codes = sorted(code for code, _ in results)
        assert codes.count(200) >= 1
        assert codes.count(503) >= 1, codes
        busy = [body for code, body in results if code == 503]
        assert all(b"busy" in b for b in busy)
        info = service.info()
        assert info["num_rejected"] >= 1
        assert info["max_queue"] == 1
        # server still healthy after shedding
        assert _get(url + "/healthz")[0] == 200
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_device_uint8_byte_exact(tmp_path):
    """--device_uint8 (default on) quantizes SR frames on device before
    the D2H pull; bytes must equal the host-quantized f32 contract path,
    including through the PNG encoder."""
    _, ckpt = _ckpt(tmp_path)
    svc_u8 = serve.build_service(_args(ckpt), list(TINY))
    svc_f32 = serve.build_service(_args(ckpt, device_uint8=0), list(TINY))
    assert svc_u8.device_uint8 and not svc_f32.device_uint8
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (3, 11, 9)).astype(np.float32)
    a = svc_u8.upscale_chw(img)
    b = svc_f32.upscale_chw(img)
    assert a.dtype == np.uint8
    np.testing.assert_array_equal(
        a, np.clip(np.round(b), 0, 255).astype(np.uint8))
    assert serve.chw_to_png(a) == serve.chw_to_png(b)
    assert svc_u8.info()["device_uint8"] is True


# ---------------------------------------------------------------------------
# dynamic request batching (--dynamic_batch): queue -> MXU batch dimension
# ---------------------------------------------------------------------------

class _RecordingModel:
    """Duck-typed SRModel whose upscale records every batch size and
    holds the device long enough that concurrent requests pile up on the
    lock (so coalescing is deterministic, like _SlowModel for shedding)."""

    registry_name = "recorder"

    def __init__(self, hold_s=0.15):
        self.hold_s = hold_s
        self.batch_sizes = []
        self.fail_on_value = None

    def upscale(self, input_list, scale):
        import time as _t

        _t.sleep(self.hold_s)
        self.batch_sizes.append(len(input_list))
        if self.fail_on_value is not None and any(
                float(im.flat[0]) == self.fail_on_value for im in input_list):
            raise ValueError("poisoned frame")
        return [np.repeat(np.repeat(im, scale, 1), scale, 2)
                for im in input_list]


def _spin_server(service):
    httpd = serve.make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, "http://127.0.0.1:%d" % httpd.server_address[1]


def test_dynamic_batch_coalesces_under_load():
    """12 concurrent same-geometry requests against a slow device with
    --dynamic_batch 4: fewer forwards than requests, batch sizes drawn
    from the {1,2,4} buckets, every client gets ITS OWN frame back."""
    model = _RecordingModel()
    service = serve.SRService(model, 4, "direct", dynamic_batch=4)
    service.ready = True
    httpd, url = _spin_server(service)
    try:
        results = {}

        def client(i):
            img = np.full((3, 5, 7), float(i), np.float32)
            results[i] = (_post(url + "/upscale", serve.chw_to_png(img)), img)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, ((code, body), img) in results.items():
            assert code == 200, (i, code)
            out = serve.png_to_chw(body)
            np.testing.assert_array_equal(
                out, np.repeat(np.repeat(img, 4, 1), 4, 2))
        info = service.info()
        assert info["num_requests"] == 12
        assert info["num_forwards"] == len(model.batch_sizes)
        assert info["num_forwards"] < 12, model.batch_sizes
        assert info["mean_batch_size"] > 1.0
        assert set(model.batch_sizes) <= {1, 2, 4}, model.batch_sizes
        assert max(model.batch_sizes) > 1, model.batch_sizes
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_dynamic_batch_keeps_geometries_separate():
    """Mixed frame sizes under load: a batch only ever contains one
    geometry, and every response still matches its request."""
    model = _RecordingModel(hold_s=0.1)
    service = serve.SRService(model, 4, "direct", dynamic_batch=4)
    service.ready = True
    httpd, url = _spin_server(service)
    try:
        shapes = [(3, 5, 7), (3, 6, 6)]
        results = {}

        def client(i):
            img = np.full(shapes[i % 2], float(i), np.float32)
            results[i] = (_post(url + "/upscale", serve.chw_to_png(img)), img)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, ((code, body), img) in results.items():
            assert code == 200
            np.testing.assert_array_equal(
                serve.png_to_chw(body),
                np.repeat(np.repeat(img, 4, 1), 4, 2))
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_dynamic_batch_matches_real_model(tmp_path):
    """Against the real EDSR service: concurrent batched responses are
    bitwise-equal to the single-request path's answers."""
    model, ckpt = _ckpt(tmp_path)
    service = serve.build_service(_args(ckpt, dynamic_batch=4), list(TINY))
    service.warmup(8, 8)
    httpd, url = _spin_server(service)
    try:
        rng = np.random.default_rng(3)
        imgs = [rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)
                for _ in range(3)]
        pngs = [serve.chw_to_png(im) for im in imgs]
        expect = [np.clip(np.round(
            model.upscale([serve.png_to_chw(p)], scale=4)[0]), 0, 255)
            for p in pngs]

        results = {}

        def client(i):
            results[i] = _post(url + "/upscale", pngs[i % 3])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(9)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (code, body) in results.items():
            assert code == 200
            np.testing.assert_array_equal(
                serve.png_to_chw(body), expect[i % 3])
        assert service.info()["dynamic_batch"] == 4
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_dynamic_batch_error_propagates_and_survives():
    """A forward failure inside a coalesced batch must 400 every request
    in that batch and leave the server serving."""
    model = _RecordingModel(hold_s=0.1)
    model.fail_on_value = 1.0
    service = serve.SRService(model, 4, "direct", dynamic_batch=4)
    service.ready = True
    httpd, url = _spin_server(service)
    try:
        results = {}

        def client(i):
            img = np.full((3, 4, 4), float(i % 2), np.float32)
            results[i] = _post(url + "/upscale", serve.chw_to_png(img))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        codes = sorted(code for code, _ in results.values())
        assert 400 in codes, codes        # poisoned batches failed
        assert _get(url + "/healthz")[0] == 200
        model.fail_on_value = None
        ok = _post(url + "/upscale",
                   serve.chw_to_png(np.full((3, 4, 4), 7.0, np.float32)))
        assert ok[0] == 200               # still serving after the failure
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_dp_direct_serving_shards_request_batches(tmp_path):
    """--dp_devices N + direct mode: every coalesced request batch pads
    to a multiple of the mesh axis and shards across it (virtual
    8-device CPU mesh). Single and concurrent requests must match the
    single-device service byte-for-byte — multi-chip direct serving."""
    model, ckpt = _ckpt(tmp_path)
    plain = serve.build_service(_args(ckpt), list(TINY))
    svc = serve.build_service(
        _args(ckpt, dp_devices=4, dynamic_batch=1), list(TINY))
    assert svc.dynamic_batch == 4 and svc._multiple == 4
    assert svc._buckets == [4]
    svc.warmup(8, 8)
    httpd, url = _spin_server(svc)
    try:
        rng = np.random.default_rng(11)
        imgs = [rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)
                for _ in range(6)]
        pngs = [serve.chw_to_png(im) for im in imgs]
        # pixel comparison: the server encodes at --png_level 1, so raw
        # PNG bytes differ from a default-level client encode
        expect = [plain.upscale_chw(serve.png_to_chw(p)) for p in pngs]

        # single request: pads 1 -> 4 across the mesh, exact
        code, body = _post(url + "/upscale", pngs[0])
        assert code == 200
        np.testing.assert_array_equal(serve.png_to_chw(body), expect[0])

        # concurrent burst: coalesced into mesh-divisible batches
        results = {}

        def client(i):
            results[i] = _post(url + "/upscale", pngs[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (code, body) in results.items():
            assert code == 200
            np.testing.assert_array_equal(serve.png_to_chw(body), expect[i])
        assert svc.info()["batch_multiple"] == 4
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_uint8_input_push_byte_equal(tmp_path):
    """The uint8 LR push (default): frames decoded as uint8 cross H2D at
    1 byte/px and cast to f32 ON DEVICE — responses must byte-match the
    f32-decode service on identical pixels; /info reports the mode; non-
    direct modes and models without upscale_device stay f32."""
    _, ckpt = _ckpt(tmp_path)
    svc_u8 = serve.build_service(_args(ckpt), list(TINY))
    svc_f32 = serve.build_service(_args(ckpt, uint8_input=0), list(TINY))
    assert svc_u8.input_dtype == np.uint8
    assert svc_u8.info()["uint8_input"] is True
    assert svc_f32.input_dtype == np.float32
    rng = np.random.default_rng(3)
    png = serve.chw_to_png(
        rng.uniform(0, 255, (3, 10, 12)).astype(np.float32))
    img_u8 = serve.png_to_chw(png, np.uint8)
    img_f32 = serve.png_to_chw(png)
    assert img_u8.dtype == np.uint8 and img_f32.dtype == np.float32
    out_u8 = svc_u8.upscale_chw(img_u8)
    out_f32 = svc_f32.upscale_chw(img_f32)
    np.testing.assert_array_equal(
        out_u8, np.clip(np.round(out_f32), 0, 255).astype(np.uint8)
        if out_f32.dtype != np.uint8 else out_f32)
    # chop mode keeps the f32 decode (tiling arithmetic contract)
    svc_chop = serve.build_service(
        _args(ckpt, chop_forward=True), list(TINY))
    assert svc_chop.input_dtype == np.float32
    # duck-typed models without upscale_device stay f32 too
    stub = serve.SRService(_RecordingModel(hold_s=0.0), 4, "direct")
    assert stub.input_dtype == np.float32


def test_pipeline_depth_reported_and_clamped(tmp_path):
    """Real models pipeline the D2H pull (depth from --pipeline_depth);
    duck-typed models without upscale_device clamp to 1 (their forward
    is synchronous under the dispatch lock)."""
    _, ckpt = _ckpt(tmp_path)
    svc = serve.build_service(_args(ckpt, pipeline_depth=3), list(TINY))
    assert svc.info()["pipeline_depth"] == 3
    stub = serve.SRService(_RecordingModel(hold_s=0.0), 4, "direct",
                           pipeline_depth=4)
    assert stub.info()["pipeline_depth"] == 1


def test_dynamic_batch_rejects_non_direct_modes(tmp_path):
    _, ckpt = _ckpt(tmp_path)
    with pytest.raises(SystemExit, match="dynamic_batch"):
        serve.build_service(
            _args(ckpt, tile_forward=True, dynamic_batch=4), list(TINY))
    with pytest.raises(SystemExit, match="dynamic_batch"):
        serve.main(["--artifact", "x.lvt", "--dynamic_batch", "4"])


# ---------------------------------------------------------------------------
# graceful drain + HTTP/1.1 keep-alive
# ---------------------------------------------------------------------------

def test_graceful_drain_finishes_inflight_and_sheds_new():
    """drain(): in-flight requests complete (200), new ones shed with a
    'draining' 503, healthz flips to 503 (LB removal), drain returns
    True once the device is idle."""
    service = serve.SRService(_SlowModel(hold_s=0.6), 4, "direct")
    service.ready = True
    httpd = serve.make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    png = serve.chw_to_png(np.zeros((3, 4, 4), np.float32))
    try:
        inflight = {}

        def client():
            inflight["r"] = _post(url + "/upscale", png)

        t = threading.Thread(target=client)
        t.start()
        import time
        time.sleep(0.15)           # let it reach the device section

        drained = {}
        dt = threading.Thread(
            target=lambda: drained.setdefault("ok", service.drain(timeout=5)))
        dt.start()
        time.sleep(0.05)           # drain flag set, device still busy
        assert service.draining
        code, body = _post(url + "/upscale", png)
        assert code == 503 and b"draining" in body
        assert _get(url + "/healthz") == (503, b"draining")
        t.join()
        dt.join()
        assert inflight["r"][0] == 200   # in-flight request finished
        assert drained["ok"] is True
    finally:
        httpd.shutdown()
        httpd.server_close()


@pytest.mark.slow
def test_sigterm_graceful_exit(tmp_path):
    """cli/serve.py main(): SIGTERM drains and the process exits 0 with
    the drain banner (the orchestrator-rollout path, end to end)."""
    import re
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    _, ckpt = _ckpt(tmp_path)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from larvanet_tpu.cli import serve\n"
        "serve.main(%r)\n"
        % (["--model", "edsr", "--restore_path", ckpt, "--port", "0",
            "--warmup_size", "8x8", "--drain_timeout", "10"] + list(TINY)))
    proc = subprocess.Popen([sys.executable, "-u", "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        port, banner = None, ""
        deadline = time.time() + 240
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            banner += line
            m = re.search(r"on http://[^:]+:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, banner
        with urllib.request.urlopen(
                "http://127.0.0.1:%d/healthz" % port, timeout=10) as r:
            assert r.status == 200
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        assert proc.wait(timeout=30) == 0, out
        assert "draining" in out and "drained" in out, out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_http11_keepalive_reuses_connection():
    """Two requests over ONE persistent connection: the server speaks
    HTTP/1.1 with Content-Length, so the socket stays open."""
    import http.client

    service = serve.SRService(_SlowModel(hold_s=0.01), 4, "direct")
    service.ready = True
    httpd = serve.make_server(service, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    png = serve.chw_to_png(np.zeros((3, 4, 4), np.float32))
    conn = http.client.HTTPConnection("127.0.0.1", httpd.server_address[1])
    try:
        for _ in range(2):  # same socket both times
            conn.request("POST", "/upscale", body=png,
                         headers={"Content-Type": "image/png"})
            r = conn.getresponse()
            body = r.read()
            assert r.status == 200 and body
            assert r.headers.get("Connection", "").lower() != "close"
    finally:
        conn.close()
        httpd.shutdown()
        httpd.server_close()


# ---------------------------------------------------------------------------
# artifact serving (--artifact): no model zoo, no restore
# ---------------------------------------------------------------------------

def _export_artifact(tmp_path, shape=(1, 16, 16, 3)):
    from larvanet_tpu.utils import aot

    model = get_model("edsr")
    model.parse_args(list(TINY))
    model.prepare(is_training=False, scales=[4])
    exported, header = aot.export_serving(model, shape)
    path = str(tmp_path / "serve.lvt")
    aot.save_artifact(path, exported, header)
    return model, path


def test_artifact_service_direct(tmp_path):
    model, path = _export_artifact(tmp_path)
    service = serve.ArtifactService(path, tile=False)
    service.warmup(16, 16)
    assert service.ready
    rng = np.random.default_rng(0)
    img = np.asarray(rng.uniform(0, 255, (3, 16, 16)), np.float32)
    out = service.upscale_chw(img)
    assert out.shape == (3, 64, 64)
    # equal to the live model's routed forward on the same input
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.ops.fastpath import build_fast_forward

    fwd, _ = build_fast_forward(model, jnp.float32)
    live = np.asarray(jax.jit(
        lambda p, v: fwd(p, v).astype(jnp.float32))(
            model.params, img.transpose(1, 2, 0)[None]))[0]
    np.testing.assert_array_equal(out, live.transpose(2, 0, 1))
    # wrong geometry must explain itself
    with pytest.raises(ValueError, match="tile_forward"):
        service.upscale_chw(np.zeros((3, 16, 18), np.float32))
    assert service.info()["mode"] == "artifact-direct"


def test_artifact_service_tiled_any_size(tmp_path):
    _, path = _export_artifact(tmp_path, shape=(2, 16, 16, 3))
    service = serve.ArtifactService(path, tile=True, tile_overlap=4)
    service.warmup(16, 16)
    rng = np.random.default_rng(1)
    img = np.asarray(rng.uniform(0, 255, (3, 21, 27)), np.float32)
    out = service.upscale_chw(img)  # odd size, > tile -> tiled path
    assert out.shape == (3, 84, 108)
    assert np.isfinite(out).all()


def test_artifact_batchN_coalesces_requests(tmp_path):
    """A batch-4 artifact pays 4 frames of compute per execution no
    matter what; direct serving must share that across queued clients:
    fewer forwards than requests, every client gets its own frame."""
    _, path = _export_artifact(tmp_path, shape=(4, 16, 16, 3))
    service = serve.ArtifactService(path, tile=False)
    assert service.dynamic_batch == 4 and service._multiple == 4
    service.warmup(16, 16)
    httpd, url = _spin_server(service)
    try:
        rng = np.random.default_rng(2)
        imgs = [rng.uniform(0, 255, (3, 16, 16)).astype(np.float32)
                for _ in range(8)]
        pngs = [serve.chw_to_png(im) for im in imgs]
        # expected = the same artifact graph, one request at a time
        # (each lone request pads 1 -> 4 through the baked batch)
        expect = [np.clip(np.round(service.upscale_chw(
            serve.png_to_chw(p))), 0, 255) for p in pngs]
        fwd_sequential = service.info()["num_forwards"]
        assert fwd_sequential == 8

        results = {}

        def client(i):
            results[i] = _post(url + "/upscale", pngs[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (code, body) in results.items():
            assert code == 200
            np.testing.assert_array_equal(serve.png_to_chw(body), expect[i])
        info = service.info()
        assert info["num_requests"] == 16
        # concurrent executions are shared across clients under load
        assert info["num_forwards"] - fwd_sequential <= 8
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_artifact_tiled_rejects_subtile_frames(tmp_path):
    _, path = _export_artifact(tmp_path, shape=(1, 16, 16, 3))
    service = serve.ArtifactService(path, tile=True, tile_overlap=4)
    service.warmup(8, 8)  # clamped up to the exported tile internally
    assert service.ready
    with pytest.raises(ValueError, match="smaller than the exported"):
        service.upscale_chw(np.zeros((3, 8, 8), np.float32))


def test_serving_dtype_bf16_cli(tmp_path):
    """--serving_dtype bf16 routes the packed inference graphs through
    bfloat16 (throughput config): service output close to f32's."""
    model, ckpt = _ckpt(tmp_path)
    outs = {}
    for d in ("f32", "bf16"):
        # compare the raw f32 contract frames: device_uint8 quantization
        # would (correctly) round both dtypes to the same bytes here
        service = serve.build_service(
            _args(ckpt, serving_dtype=d, device_uint8=0), list(TINY))
        img = np.linspace(0, 255, 3 * 16 * 16, dtype=np.float32).reshape(3, 16, 16)
        outs[d] = service.upscale_chw(img)
    diff = float(np.max(np.abs(outs["f32"] - outs["bf16"])))
    assert 0 < diff < 2.0, diff
