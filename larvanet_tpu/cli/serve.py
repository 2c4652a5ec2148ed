"""Production serving: a persistent HTTP SR server over the TPU fast path.

The reference's deployment story ends at batch scripts (get_sr.py reads
a directory and exits, paying model build + first-compile per run); for
production serving the expensive parts — checkpoint restore, packed/
collapsed/int8 graph builds, XLA compiles — must be paid ONCE, then
amortized over requests. This server does that with only stdlib HTTP:

    python -m larvanet_tpu.cli.serve --model edsr --restore_path ckpt \
        --port 8080 [--tile_forward --int8_trunk 1 --dp_devices N]

Endpoints:
    GET  /healthz   -> 200 "ok" once warmup compile has finished
    GET  /info      -> JSON: model, scale, enabled fast paths, request
                       count + mean device latency
    POST /upscale   -> PNG body in, SR PNG out (the same forward routing
                       as cli/get_sr.py:100-105: chop / tiled / direct)

Concurrency: ThreadingHTTPServer; PNG decode/encode run concurrently,
the device forward is serialized by a lock (one accelerator). The lock
queue is BOUNDED (--max_queue): once that many requests are already
waiting on the device, new ones get an immediate 503 + Retry-After
instead of stretching the tail — a loaded SR server should shed, not
queue, because every queued frame waits a full device pass. /info
reports p50/p95/p99 device and queue-wait latencies over a sliding
window (docs/SERVING.md "Concurrency and tail latency"). Large or
variable frame sizes should use --tile_forward so every request reuses
the single compiled tile shape. --dynamic_batch N coalesces queued
same-geometry requests into one batched forward (direct mode): under
load the device queue becomes MXU batch dimension instead of serial
launches, with zero added latency when idle.
"""

from __future__ import annotations

import argparse
import collections
import io as _stdio
import json
import sys
import threading
import time

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.data import io
from larvanet_tpu.eval.tiling import TiledUpscaler, upscale_with_chop_forward


class ServerBusy(RuntimeError):
    """Raised when --max_queue requests are already waiting on the device."""


def _percentiles(values, qs=(50, 95, 99)):
    if not values:
        return {("p%d" % q): 0.0 for q in qs}
    s = sorted(values)
    out = {}
    for q in qs:
        idx = min(len(s) - 1, max(0, int(round(q / 100.0 * (len(s) - 1)))))
        out["p%d" % q] = round(s[idx], 6)
    return out


class SRService:
    """Checkpoint-loaded model + routed forward, shared by HTTP threads.

    One device => one in-flight forward (self._lock). The queue of
    threads waiting on that lock is bounded by max_queue: beyond it,
    upscale_chw raises ServerBusy, which the HTTP layer turns into an
    immediate 503 + Retry-After (load shedding beats unbounded queueing
    for tail latency — each queued frame waits a full device pass).
    Per-request device and queue-wait latencies land in a sliding
    window for the /info percentiles."""

    def __init__(self, model, scale: int, mode: str, tiler=None,
                 chop_overlap: int = 20, max_queue: int = 32,
                 latency_window: int = 1024, dynamic_batch: int = 1,
                 device_uint8: bool = True, batch_multiple: int = 1,
                 pipeline_depth: int = 2, uint8_input: bool = True):
        self.model = model
        self.scale = scale
        self.mode = mode  # "direct" | "tile" | "chop"
        # quantize to uint8 ON DEVICE before the D2H pull (4x less SR
        # transfer; byte-exact vs host quantization — base.upscale_uint8)
        self.device_uint8 = bool(device_uint8) and mode == "direct" \
            and hasattr(model, "upscale_uint8")
        # push the LR frame as uint8 too (4x less H2D; PNG decodes ARE
        # uint8, the device-side f32 cast is exact — base._input_to_device)
        self.input_dtype = np.uint8 if (
            bool(uint8_input) and mode == "direct"
            and hasattr(model, "upscale_device")) else np.float32
        self.tiler = tiler
        self.chop_overlap = chop_overlap
        self.max_queue = int(max_queue)
        # batch_multiple = the dp-eval mesh axis size: every forwarded
        # batch must divide it (parallel/mesh.use_data_parallel_eval), so
        # buckets are multiples of it and short batches PAD up to it —
        # wall-clock free, the pad frames ride otherwise-idle devices
        self._multiple = max(1, int(batch_multiple))
        self.dynamic_batch = max(self._multiple, int(dynamic_batch))
        # batch-size buckets bound the compile count: at most
        # len(buckets) graphs exist per LR geometry
        cap = -(-self.dynamic_batch // self._multiple) * self._multiple
        self._buckets = []
        b = self._multiple
        while b < cap:
            self._buckets.append(b)
            b *= 2
        self._buckets.append(cap)
        self._pending = []                    # coalescing queue (under _stats)
        self._lock = threading.Lock()         # serializes device DISPATCH
        self._stats = threading.Lock()        # guards counters + window
        # transfer/compute pipeline: the device->host pull of a finished
        # frame runs OUTSIDE the dispatch lock, so the next request's
        # compute overlaps it (JAX dispatch is async). The semaphore
        # bounds dispatched-but-unpulled outputs — the HBM backpressure.
        self._pipeline = max(1, int(pipeline_depth)) \
            if mode == "direct" and hasattr(model, "upscale_device") else 1
        self._pull_sem = threading.Semaphore(self._pipeline)
        self._waiting = 0
        self.num_requests = 0
        self.num_rejected = 0
        self.num_forwards = 0
        self.total_device_s = 0.0
        self._lat_device = collections.deque(maxlen=latency_window)
        self._lat_wait = collections.deque(maxlen=latency_window)
        self.ready = False
        self.draining = False

    def _forward(self, img_chw: np.ndarray) -> np.ndarray:
        if self.mode == "chop":
            return upscale_with_chop_forward(
                self.model, img_chw, self.scale, self.chop_overlap)
        if self.mode == "tile":
            return self.tiler.upscale_chw(img_chw)
        if self.device_uint8:
            return self.model.upscale_uint8(
                input_list=[img_chw], scale=self.scale)[0]
        return self.model.upscale(input_list=[img_chw], scale=self.scale)[0]

    def upscale_chw(self, img_chw: np.ndarray) -> np.ndarray:
        if self.mode == "direct" and (self.dynamic_batch > 1
                                      or self._multiple > 1
                                      or self._pipeline > 1):
            return self._upscale_coalesced(img_chw)
        with self._stats:
            if self._waiting >= self.max_queue:
                self.num_rejected += 1
                raise ServerBusy(
                    "%d requests already queued on the device (--max_queue)"
                    % self._waiting)
            self._waiting += 1
        try:
            t_q = time.perf_counter()
            with self._lock:
                wait_s = time.perf_counter() - t_q
                t0 = time.perf_counter()
                out = self._forward(img_chw)
                dev_s = time.perf_counter() - t0
            with self._stats:
                self.total_device_s += dev_s
                self.num_requests += 1
                self.num_forwards += 1
                self._lat_device.append(dev_s)
                self._lat_wait.append(wait_s)
            return out
        finally:
            with self._stats:
                self._waiting -= 1

    # ---- dynamic request batching (direct mode) ----------------------------
    #
    # A loaded single-accelerator SR server spends most of each small-frame
    # pass on per-call launch overhead, not MXU time; coalescing the
    # requests that pile up behind the device lock into ONE batched forward
    # (model.upscale already stacks same-shape frames into a single NHWC
    # batch) converts that queue into MXU batch dimension. Leader/follower:
    # every request enqueues an entry, then blocks on the device lock;
    # whichever thread holds the lock first serves its own entry plus up to
    # --dynamic_batch-1 same-geometry pending entries in one forward.
    # Under no load a lone request runs immediately at batch 1 — coalescing
    # adds no linger latency; batches only form while the device is busy.

    def _dispatch_batch(self, imgs):
        """Pad to the next batch bucket (bounded compile count), dispatch
        the forward, and return a zero-arg `pull()` yielding the list of
        CHW outputs. With upscale_device the dispatch is asynchronous —
        pull() does the device->host transfer, padded frames sliced off
        ON DEVICE; legacy duck-typed models (stubs, artifacts) run their
        sync forward here and pull() is trivial."""
        n = len(imgs)
        bucket = next((b for b in self._buckets if b >= n), n)
        if bucket > n:
            imgs = list(imgs) + [imgs[0]] * (bucket - n)
        if hasattr(self.model, "upscale_device"):
            dev = self.model.upscale_device(
                imgs, self.scale, uint8=self.device_uint8, keep=n)

            def pull():
                arr = np.asarray(dev).transpose(0, 3, 1, 2)
                return [arr[i] for i in range(n)]

            return pull
        if self.device_uint8:
            outs = self.model.upscale_uint8(
                input_list=imgs, scale=self.scale)[:n]
        else:
            outs = self.model.upscale(input_list=imgs, scale=self.scale)[:n]
        return lambda: outs

    def _upscale_coalesced(self, img_chw: np.ndarray) -> np.ndarray:
        entry = {"img": img_chw, "shape": tuple(img_chw.shape),
                 "event": threading.Event(), "t_q": time.perf_counter(),
                 "out": None, "err": None}
        with self._stats:
            if self._waiting >= self.max_queue:
                self.num_rejected += 1
                raise ServerBusy(
                    "%d requests already queued on the device (--max_queue)"
                    % self._waiting)
            self._waiting += 1
            self._pending.append(entry)
        try:
            while not entry["event"].is_set():
                with self._stats:
                    mine = any(e is entry for e in self._pending)
                if not mine:
                    # a leader took our entry; its event fires when the
                    # batch's pull completes (or fails)
                    entry["event"].wait()
                    break
                # leader-elect: a pull slot bounds dispatched-but-unpulled
                # outputs (HBM backpressure); timed so we re-check whether
                # another leader served us meanwhile
                if not self._pull_sem.acquire(timeout=0.1):
                    continue
                batch = None
                pull = None
                err = None
                with self._lock:
                    # identity-based list surgery throughout: entries hold
                    # numpy arrays, so == comparisons are ill-defined
                    with self._stats:
                        if any(e is entry for e in self._pending):
                            cand = [e for e in self._pending
                                    if e["shape"] == entry["shape"]]
                            # largest bucket <= queue depth: never pad
                            # (padded frames cost full compute; remainder
                            # gets its own leader next). Exception: under
                            # a batch multiple (dp mesh / baked artifact
                            # batch) short batches take everything and
                            # pad up — those pad frames are free there.
                            fit = [b for b in self._buckets
                                   if b <= len(cand)]
                            k = fit[-1] if fit else len(cand)
                            batch = cand[:k]
                            if not any(e is entry for e in batch):
                                batch = cand[: k - 1] + [entry]
                            taken = set(map(id, batch))
                            self._pending = [e for e in self._pending
                                             if id(e) not in taken]
                    if batch is not None:
                        t0 = time.perf_counter()
                        try:
                            pull = self._dispatch_batch(
                                [e["img"] for e in batch])
                        except Exception as exc:
                            err = exc
                if batch is None:
                    # someone served us between the pending check and the
                    # lock; loop back — the not-mine branch will wait
                    self._pull_sem.release()
                    continue
                if err is not None:
                    self._pull_sem.release()
                    for e in batch:
                        e["err"] = err
                        e["event"].set()
                    break
                # the pull runs OUTSIDE the dispatch lock: the next
                # request's compute overlaps this transfer
                try:
                    outs = pull()
                except Exception as exc:
                    for e in batch:
                        e["err"] = exc
                        e["event"].set()
                    break
                finally:
                    self._pull_sem.release()
                dev_s = time.perf_counter() - t0
                with self._stats:
                    for e in batch:
                        self.total_device_s += dev_s
                        self.num_requests += 1
                        self._lat_device.append(dev_s)
                        self._lat_wait.append(t0 - e["t_q"])
                    self.num_forwards += 1
                for e, o in zip(batch, outs):
                    e["out"] = o
                    e["event"].set()
                break
            if entry["err"] is not None:
                raise entry["err"]
            return entry["out"]
        finally:
            with self._stats:
                self._waiting -= 1
                if any(e is entry for e in self._pending):  # unreachable; safe
                    self._pending = [e for e in self._pending if e is not entry]

    def drain(self, timeout=None, poll_s=0.05) -> bool:
        """Graceful shutdown: stop admitting requests (the HTTP layer
        sheds with 503 once self.draining is set) and wait for in-flight
        ones to finish. Returns False if they didn't within `timeout`."""
        self.draining = True
        t0 = time.perf_counter()
        while True:
            with self._stats:
                if self._waiting == 0:
                    return True
            if timeout is not None and time.perf_counter() - t0 > timeout:
                return False
            time.sleep(poll_s)

    def warmup(self, height: int, width: int) -> None:
        """Pay the XLA compile before accepting traffic."""
        dummy = np.zeros((3, height, width), self.input_dtype)
        self.upscale_chw(dummy)
        if self.dynamic_batch > 1 and self.mode == "direct":
            # precompile every batch bucket at the warmup geometry so a
            # traffic burst never pays a compile mid-request (through the
            # same routed forward the live batches use, incl. uint8)
            for b in self._buckets[1:]:
                self._dispatch_batch([dummy] * b)()
        with self._stats:
            self.num_requests = 0
            self.num_rejected = 0
            self.num_forwards = 0
            self.total_device_s = 0.0
            self._lat_device.clear()
            self._lat_wait.clear()
        self.ready = True

    def info(self) -> dict:
        with self._stats:
            n = self.num_requests
            fwd = self.num_forwards
            mean_s = self.total_device_s / n if n else 0.0
            dev = _percentiles(self._lat_device)
            wait = _percentiles(self._lat_wait)
            waiting = self._waiting
            rejected = self.num_rejected
        return {
            "model": self.model.registry_name,
            "scale": self.scale,
            "mode": self.mode,
            "ready": self.ready,
            "draining": self.draining,
            "num_requests": n,
            "num_rejected": rejected,
            "queue_depth": waiting,
            "max_queue": self.max_queue,
            "dynamic_batch": self.dynamic_batch,
            "batch_multiple": self._multiple,
            "pipeline_depth": self._pipeline,
            "device_uint8": self.device_uint8,
            "uint8_input": self.input_dtype == np.uint8,
            "num_forwards": fwd,
            "mean_batch_size": round(n / fwd, 3) if fwd else 0.0,
            "mean_device_seconds": round(mean_s, 6),
            "device_seconds": dev,
            "queue_wait_seconds": wait,
            "host_rss_mb": host_rss_mb(),
            "device_memory_mb": device_memory_mb(),
        }


class ArtifactService(SRService):
    """Serve from a StableHLO artifact (cli/export.py --stablehlo): no
    model zoo, no checkpoint restore, no graph build — load_artifact +
    one compile. Direct mode requires requests of exactly the exported
    LR geometry; --tile_forward serves any frame size >= the exported
    tile through fixed-shape tiles (the artifact's batch is padded/
    chunked). Sub-tile frames are rejected with a clear error in both
    modes: spatially padding them into the fixed canvas would NOT be
    exact for these models (mean-shift turns pad zeros into nonzero
    border taps; the interpolated bases resample the padded canvas), so
    export a smaller artifact for small inputs instead."""

    def __init__(self, path: str, tile: bool, tile_overlap: int = 24,
                 max_queue: int = 32):
        from larvanet_tpu.utils.aot import ArtifactModel

        model = ArtifactModel(path)
        self.header = model.header
        tiler = None
        if tile:
            h, w = model.height, model.width
            if h != w:
                raise ValueError("--tile_forward over an artifact needs a "
                                 "square exported geometry, got %dx%d" % (h, w))
            tiler = TiledUpscaler(model.fwd_runtime, scale=model.scale,
                                  tile_size=h, overlap=tile_overlap,
                                  max_batch=max(model.batch, 16))
        # ArtifactModel duck-types the SRModel serving surface, so the
        # lock/counters/request plumbing is SRService's, not a copy.
        # A batch-N artifact pays its full baked batch per call (the
        # graph shape is frozen), so direct mode coalesces up to N
        # queued requests into each execution — the padding that a lone
        # request would burn becomes other clients' frames.
        dyn = model.batch if (not tile and model.batch > 1) else 1
        super().__init__(model, model.scale, "tile" if tile else "direct",
                         tiler=tiler, max_queue=max_queue,
                         dynamic_batch=dyn, batch_multiple=dyn)

    def warmup(self, height: int, width: int) -> None:
        # warm with the exported geometry regardless of --warmup_size: the
        # artifact has exactly one compiled shape (and the tiler's
        # small-frame path must never see a sub-tile canvas)
        if self.mode == "direct":
            height, width = self.model.height, self.model.width
        else:
            height = max(height, self.model.height)
            width = max(width, self.model.width)
        super().warmup(height, width)

    def info(self) -> dict:
        out = super().info()
        out.update(
            mode="artifact-" + self.mode,
            path_desc=self.header.get("path_desc", ""),
            input_shape=self.header.get("input_shape"),
        )
        return out


def host_rss_mb():
    """Server-process resident set (MB) — the endurance-soak leak signal
    (tools/serve_soak.py watches its trend over >=30 min of load)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024.0, 1)
    except (OSError, ValueError, IndexError):
        return None
    return None


def device_memory_mb():
    """Bytes in use on device 0, if the backend exposes memory_stats
    (the axon tunnel may not — None is an honest answer, not an error)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return round(stats["bytes_in_use"] / 1e6, 1)
    except Exception:
        return None
    return None


def prometheus_metrics(info: dict) -> bytes:
    """Render /info as Prometheus text exposition (counters + summary
    quantiles) so a standard scraper can watch the server without a
    custom exporter."""
    lines = [
        "# TYPE lvt_requests_total counter",
        "lvt_requests_total %d" % info.get("num_requests", 0),
        "# TYPE lvt_rejected_total counter",
        "lvt_rejected_total %d" % info.get("num_rejected", 0),
        "# TYPE lvt_forwards_total counter",
        "lvt_forwards_total %d" % info.get("num_forwards", 0),
        "# TYPE lvt_queue_depth gauge",
        "lvt_queue_depth %d" % info.get("queue_depth", 0),
        "# TYPE lvt_ready gauge",
        "lvt_ready %d" % (1 if info.get("ready") else 0),
        "# TYPE lvt_draining gauge",
        "lvt_draining %d" % (1 if info.get("draining") else 0),
        "# TYPE lvt_mean_batch_size gauge",
        "lvt_mean_batch_size %s" % info.get("mean_batch_size", 0.0),
    ]
    for gauge, key in (("lvt_host_rss_mb", "host_rss_mb"),
                       ("lvt_device_memory_mb", "device_memory_mb")):
        if info.get(key) is not None:
            lines += ["# TYPE %s gauge" % gauge,
                      "%s %s" % (gauge, info[key])]
    for name, key in (("lvt_device_seconds", "device_seconds"),
                      ("lvt_queue_wait_seconds", "queue_wait_seconds")):
        lines.append("# TYPE %s summary" % name)
        for q, v in sorted(info.get(key, {}).items()):
            lines.append('%s{quantile="0.%s"} %s' % (name, q[1:], v))
    return ("\n".join(lines) + "\n").encode()


def png_to_chw(data: bytes, dtype=np.float32) -> np.ndarray:
    """Decode a request PNG to CHW. dtype=np.uint8 skips the host f32
    conversion so the frame crosses the host->device link at 1 byte/px
    (direct-mode services with upscale_device cast on device — exact)."""
    from PIL import Image

    with Image.open(_stdio.BytesIO(data)) as im:
        arr = np.asarray(im.convert("RGB"), dtype)
    return arr.transpose(2, 0, 1)


def chw_to_png(img_chw: np.ndarray, compress_level: int = 6) -> bytes:
    """PNG-encode a CHW frame. compress_level follows zlib (0-9):
    responses default to the server's --png_level (1 = ~3-4x faster
    encode than PIL's default 6 at a modestly larger payload — encode
    time is client-visible latency, not device throughput)."""
    from PIL import Image

    if img_chw.dtype == np.uint8:  # already quantized on device
        arr = img_chw.transpose(1, 2, 0)
    else:
        arr = np.clip(np.round(img_chw.transpose(1, 2, 0)),
                      0, 255).astype(np.uint8)
    buf = _stdio.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG", compress_level=compress_level)
    return buf.getvalue()


def make_server(service: SRService, host: str, port: int,
                max_body_mb: int = 64, png_level: int = 1):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    max_body = int(max_body_mb) * 1024 * 1024
    png_level = int(png_level)

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response carries Content-Length, so
        # persistent connections are safe — clients skip a TCP handshake
        # per frame (HTTP/1.0, the BaseHTTPRequestHandler default, closes
        # the connection after every request)
        protocol_version = "HTTP/1.1"

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if getattr(service, "draining", False):
                    self._send(503, b"draining", "text/plain")
                elif service.ready:
                    self._send(200, b"ok", "text/plain")
                else:
                    self._send(503, b"warming up", "text/plain")
            elif self.path == "/info":
                self._send(200, json.dumps(service.info()).encode(),
                           "application/json")
            elif self.path == "/metrics":
                self._send(200, prometheus_metrics(service.info()),
                           "text/plain; version=0.0.4")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.rstrip("/") != "/upscale":
                self._send(404, b"not found", "text/plain")
                return
            if getattr(service, "draining", False):
                # graceful shutdown in progress: shed so the LB retries
                # elsewhere; in-flight requests still finish
                self.send_response(503)
                body = b"server draining, retry elsewhere"
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._send(400, b"bad request", "text/plain")
                return
            if length > max_body:
                # don't trust a client-declared size into one read()
                # (advisor r2: memory exhaustion from a single request)
                self._send(413, ("request body exceeds %d MiB limit"
                                 % max_body_mb).encode(), "text/plain")
                return
            try:
                img = png_to_chw(self.rfile.read(length),
                                 service.input_dtype)
                out = service.upscale_chw(img)
                self._send(200, chw_to_png(out, png_level), "image/png")
            except ServerBusy:
                # shed load instead of stretching the tail: the client
                # should back off and retry (docs/SERVING.md)
                self.send_response(503)
                body = b"server busy: device queue full, retry later"
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
            except Exception as exc:  # malformed input must not kill the server
                # log server-side; never echo internals to the client
                print("serve: request failed: %r" % (exc,), file=sys.stderr)
                self._send(400, b"bad request: could not decode or process "
                                b"the image", "text/plain")

        def log_message(self, fmt, *a):  # quiet per-request stderr spam
            pass

    return ThreadingHTTPServer((host, port), Handler)


def build_service(args, remaining) -> SRService:
    """Model + fast-path routing identical to cli/get_sr.py:60-94."""
    scale_list = common.scales_of(args)
    scale = scale_list[0]
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False)
    common.warn_leftovers(remaining)
    model.restore(ckpt_path=args.restore_path, target=args.restore_target)
    common.maybe_use_ema(model, args)
    common.apply_serving_dtype(model, args)
    print("restored the model")
    common.maybe_collapse_tail(model, args)

    if getattr(args, "int8_trunk", 0):
        if args.int8_calib_path:
            names = io.list_pngs(args.int8_calib_path)[:4]
            calib = [io.load_image_chw(
                "%s/%s.png" % (args.int8_calib_path, n)).transpose(1, 2, 0)
                for n in names]
            h = min(a.shape[0] for a in calib)
            w = min(a.shape[1] for a in calib)
            batch = np.stack([a[:h, :w] for a in calib])
            common.maybe_int8_trunk(model, args, lambda: batch)
        else:
            print("WARNING: --int8_trunk without --int8_calib_path calibrates "
                  "on noise; pass a directory of representative PNGs")
            rng = np.random.default_rng(0)
            common.maybe_int8_trunk(
                model, args,
                lambda: rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32))
    common.maybe_plain_full_frame(model, args)
    common.maybe_spatial_shard(model, args, scale)

    if args.dp_devices > 1:
        import jax

        from larvanet_tpu.parallel.mesh import make_mesh, use_data_parallel_eval

        mesh = make_mesh((args.dp_devices,), ("data",),
                         devices=jax.devices()[: args.dp_devices])
        use_data_parallel_eval(model, mesh)
        print("serving: tile batches sharded over %d devices" % (args.dp_devices,))

    tiler = None
    mode = "direct"
    if args.chop_forward:
        mode = "chop"
    elif args.tile_forward:
        mode = "tile"
        tiler = TiledUpscaler(
            lambda batch: model.fwd_runtime(np.asarray(batch, np.float32)),
            scale=scale, tile_size=args.tile_size, overlap=args.tile_overlap,
            min_batch=max(1, args.dp_devices),
        )
    dyn = int(getattr(args, "dynamic_batch", 1) or 1)
    if dyn > 1 and mode != "direct":
        raise SystemExit("--dynamic_batch coalesces same-geometry direct "
                         "forwards; it does not compose with --%s_forward "
                         "(the tiler already batches tiles within a request)"
                         % mode)
    multiple = 1
    if args.dp_devices > 1 and mode == "direct":
        # dp-eval forwards must divide the mesh axis: coalesce every
        # request batch and pad up to a multiple of it (pad frames ride
        # otherwise-idle devices — multi-chip direct serving)
        multiple = int(args.dp_devices)
        if dyn < multiple:
            dyn = multiple
            print("serving: --dynamic_batch raised to %d (= --dp_devices) "
                  "so request batches shard across the mesh" % multiple)
    return SRService(model, scale, mode, tiler=tiler,
                     chop_overlap=args.chop_overlap_size,
                     max_queue=getattr(args, "max_queue", 32),
                     dynamic_batch=dyn, batch_multiple=multiple,
                     pipeline_depth=int(getattr(args, "pipeline_depth", 2)
                                        or 1),
                     device_uint8=bool(int(
                         getattr(args, "device_uint8", 1) or 0)),
                     uint8_input=bool(int(
                         getattr(args, "uint8_input", 1) or 0)))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="edsr", help="Name of the model.")
    parser.add_argument("--scales", type=str, default="4")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored.")
    parser.add_argument("--restore_path", type=str, default=None)
    parser.add_argument("--artifact", type=str, default=None,
                        help="Serve from a StableHLO artifact "
                             "(cli/export.py --stablehlo) instead of a "
                             "checkpoint — no model build or restore.")
    parser.add_argument("--restore_target", type=str)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080,
                        help="0 picks an ephemeral port (printed at startup).")
    parser.add_argument("--max_body_mb", type=int, default=64,
                        help="Reject request bodies above this size with 413.")
    parser.add_argument("--drain_timeout", type=float, default=30.0,
                        help="On SIGTERM: stop admitting requests (healthz "
                             "503s, POSTs shed) and wait up to this many "
                             "seconds for in-flight ones before exiting.")
    parser.add_argument("--png_level", type=int, default=1,
                        help="zlib compress level for response PNGs (0-9). "
                             "1 (default) encodes ~3-4x faster than PIL's 6 "
                             "at a modestly larger payload; pixels identical.")
    parser.add_argument("--max_queue", type=int, default=32,
                        help="Max requests waiting on the device before new "
                             "ones get an immediate 503 (load shedding).")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="Overlap the SR frame's device->host pull with "
                             "the next request's compute: up to N forwards "
                             "may be dispatched-but-unpulled (direct mode; "
                             "1 = the pull holds the device lock).")
    parser.add_argument("--uint8_input", type=int, default=1,
                        help="Push the LR request frame to the device as "
                             "uint8 and cast to f32 there (direct mode): 4x "
                             "less host->device traffic, exact (PNG decodes "
                             "are uint8; every uint8 is f32-representable).")
    parser.add_argument("--device_uint8", type=int, default=1,
                        help="Quantize SR frames to uint8 ON DEVICE before "
                             "the device->host pull (direct mode): 4x less "
                             "transfer, byte-exact vs host quantization. "
                             "0 pulls the f32 contract frames.")
    parser.add_argument("--dynamic_batch", type=int, default=1,
                        help="Coalesce up to N queued same-geometry requests "
                             "into one batched forward (direct mode). Batches "
                             "form only while the device is busy — a lone "
                             "request still runs immediately at batch 1.")
    parser.add_argument("--warmup_size", type=str, default="128x128",
                        help="WxH compiled + executed before serving traffic.")
    parser.add_argument("--chop_forward", action="store_true")
    parser.add_argument("--chop_overlap_size", type=int, default=20)
    parser.add_argument("--tile_forward", action="store_true",
                        help="Batched fixed-shape tiles: one compile serves every frame size.")
    parser.add_argument("--tile_size", type=int, default=128)
    parser.add_argument("--tile_overlap", type=int, default=24)
    parser.add_argument("--spatial_shard", type=int, default=0)
    parser.add_argument("--spatial_halo", type=int, default=32)
    parser.add_argument("--collapsed_tail", type=int, default=1)
    parser.add_argument("--packed_trunk", type=int, default=1)
    parser.add_argument("--int8_trunk", type=int, default=0)
    parser.add_argument("--int8_calib_path", type=str, default=None,
                        help="Directory of PNGs for int8 calibration.")
    parser.add_argument("--dp_devices", type=int, default=0)
    parser.add_argument("--ema", type=int, default=0,
                        help="Serve the EMA weights from a --ema_decay checkpoint.")
    common.add_serving_dtype_flag(parser)
    common.add_plain_frame_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    if args.artifact:
        if args.dynamic_batch > 1:
            raise SystemExit("--dynamic_batch does not apply to --artifact "
                             "serving: the batch dimension was baked at "
                             "export, and a batch-N artifact already "
                             "coalesces up to N queued requests per "
                             "execution automatically")
        for flag in ("chop_forward", "int8_trunk", "spatial_shard",
                     "dp_devices", "ema"):
            if getattr(args, flag, 0):
                raise SystemExit("--%s does not apply to --artifact serving "
                                 "(the graph and weights are baked into the "
                                 "file; re-export with the right options)"
                                 % flag)
        if getattr(args, "serving_dtype", "f32") != "f32":
            raise SystemExit("--serving_dtype does not apply to --artifact "
                             "serving (the compute dtype was baked at export "
                             "— use cli/export.py --export_dtype)")
        if args.restore_path:
            raise SystemExit("pass --restore_path OR --artifact, not both")
        common.warn_leftovers(remaining)
        service = ArtifactService(args.artifact, tile=args.tile_forward,
                                  tile_overlap=args.tile_overlap,
                                  max_queue=args.max_queue)
        print("serving artifact %s (%s)"
              % (args.artifact, service.header.get("path_desc", "")))
    elif args.restore_path:
        service = build_service(args, remaining)
    else:
        raise SystemExit("pass --restore_path (checkpoint) or --artifact "
                         "(StableHLO serving artifact)")
    w, h = (int(v) for v in args.warmup_size.split("x"))
    print("warmup %dx%d (compiling)..." % (w, h))
    service.warmup(h, w)
    print("ready")

    httpd = make_server(service, args.host, args.port,
                        max_body_mb=args.max_body_mb,
                        png_level=args.png_level)

    # SIGTERM = graceful rollout (what an orchestrator sends): flip to
    # draining (healthz 503 pulls us from the LB, new POSTs shed), let
    # in-flight frames finish, then stop. SIGINT/Ctrl-C stays immediate.
    import signal

    def _graceful(signum, _frame):
        print("serve: SIGTERM — draining (up to %.0fs)..." % args.drain_timeout)

        def _stop():
            clean = service.drain(timeout=args.drain_timeout)
            print("serve: drained" if clean
                  else "serve: drain timed out with requests in flight")
            httpd.shutdown()

        threading.Thread(target=_stop, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _graceful)
    except ValueError:
        pass  # not the main thread (embedded use); skip the handler

    print("serving %s on http://%s:%d" % (
        service.info().get("model") or args.model,
        httpd.server_address[0], httpd.server_address[1]))
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


if __name__ == "__main__":
    main()
