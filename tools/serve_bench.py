"""Measured serving latency percentiles on the TPU (VERDICT r3 next#6/#4).

docs/SERVING.md round-3 designed the serving observability (sliding
/info p50/p95/p99, bounded queue + 503 shedding, capacity formulas) and
tested it on CPU, but shipped no measured v5e numbers. This tool drives
cli/serve.py — the REAL server subprocess over HTTP — on the TPU and
records, per configuration and offered load level:

  * client-side end-to-end latency percentiles (per level, isolated),
  * the server's /info device/queue-wait percentiles + request counters,
  * 200 vs 503 split -> the shedding onset vs offered concurrency.

Configurations: direct vs --tile_forward vs --int8_trunk vs
LarvaNet_w64, at 270p/540p/1080p LR frames. Results -> SERVE_BENCH.json
and the measured table in docs/SERVING.md.

Tunnel honesty: /info's device_seconds is timed around the forward
UNDER the device lock, which on this host includes pulling the full SR
frame back through the axon tunnel (~34 MB/s bulk D2H) and is therefore
an upper bound on what a PCIe-attached TPU host would see; the JSON
records the SR payload size so the tunnel share is attributable.

The model checkpoints are seeded random inits built in a forced-CPU
subprocess (weights don't affect latency); the server subprocess runs
on the real TPU. Startup, warmup, and every request loop are bounded —
a wedged server yields a structured {"ok": false} row (tools/resilience
contract), never a hang.

Usage (repo root, TPU):  python -m tools.serve_bench [--configs a,b,...]
"""

from __future__ import annotations

import argparse
import io as _stdio
import json
import os
import re
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

from tools.resilience import REPO, run_measured

FRAMES = {"270p": (270, 480), "540p": (540, 960), "1080p": (1080, 1920),
          "tiny": (64, 96)}

# (name, model, model_flags, server_flags, frame, n_requests, levels)
CONFIGS = [
    ("edsr_direct_270p", "edsr", [], [], "270p", 12, (1, 2, 4)),
    ("edsr_direct_540p", "edsr", [], [], "540p", 8, (1, 2, 4)),
    ("edsr_int8_270p", "edsr", [], ["--int8_trunk", "1"], "270p", 12, (1, 2, 4)),
    ("edsr_tile_1080p", "edsr", [],
     ["--tile_forward", "--tile_size", "192", "--tile_overlap", "24"],
     "1080p", 4, (1, 2)),
    ("w64_direct_270p", "LarvaNet_w64",
     ["--num_blocks", "9,9"], [], "270p", 12, (1, 2, 4)),
    # round-4 serving optimizations, isolated:
    #  - f32pull: --device_uint8 0 == the round-3 behavior (f32 D2H pull);
    #    the direct arms above now default to the uint8 device pull
    #  - batch8: --dynamic_batch coalesces queued same-geometry requests
    #    into one batched forward; wins show at offered concurrency > 1
    ("edsr_f32pull_270p", "edsr", [], ["--device_uint8", "0"],
     "270p", 12, (1, 2, 4)),
    #  - f32push: --uint8_input 0 isolates the uint8 LR H2D push (the
    #    direct arms above default to pushing the request frame as uint8)
    ("edsr_f32push_270p", "edsr", [], ["--uint8_input", "0"],
     "270p", 12, (1, 2, 4)),
    ("edsr_direct_1080p", "edsr", [], [], "1080p", 6, (1, 2)),
    ("edsr_batch8_270p", "edsr", [], ["--dynamic_batch", "8"],
     "270p", 16, (1, 4, 8)),
    ("w64_batch8_270p", "LarvaNet_w64", ["--num_blocks", "9,9"],
     ["--dynamic_batch", "8"], "270p", 16, (1, 4, 8)),
    ("w64_int8_270p", "LarvaNet_w64", ["--num_blocks", "9,9"],
     ["--int8_trunk", "1"], "270p", 12, (1, 2, 4)),
    # shedding onset: a tiny queue bound + offered load past it
    ("edsr_shed_270p", "edsr", [], ["--max_queue", "2"], "270p", 16,
     (2, 4, 8)),
    # early-exit serving (reference LarvaLeg.py:289-299): leg 1 runs one
    # of the two body modules; leg 2 is the full forward — the serving
    # side of the anytime-inference frontier (tools/leg_frontier.py)
    ("larvaleg_leg1_270p", "LarvaLeg",
     ["--num_modules", "2", "--num_blocks", "16,16", "--leg", "1"], [],
     "270p", 12, (1, 2, 4)),
    ("larvaleg_leg2_270p", "LarvaLeg",
     ["--num_modules", "2", "--num_blocks", "16,16", "--leg", "2"], [],
     "270p", 12, (1, 2, 4)),
    # smoke_*: excluded from the default sweep; CPU-sized config for the
    # tool's own test (tests/test_serve_bench.py with LVT_PLATFORM=cpu)
    ("smoke_tiny", "edsr",
     ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"],
     ["--max_queue", "1"], "tiny", 6, (1, 4)),
]

_CKPT_BUILDER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from larvanet_tpu.core.registry import get_model
m = get_model(sys.argv[1])
m.parse_args(sys.argv[3:])
m.prepare(is_training=True, scales=[4])
m.global_step = 1
print("CKPT", m.save(sys.argv[2]))
"""


def build_ckpt(model, flags, outdir):
    r = run_measured([sys.executable, "-c", _CKPT_BUILDER, model, outdir]
                     + list(flags), timeout=300, retries=1)
    if not r["ok"]:
        return r
    m = re.search(r"^CKPT (.+)$", r["stdout"], re.M)
    if not m:
        return {"ok": False, "error": "no CKPT line: " + r["stdout"][-200:]}
    return {"ok": True, "path": m.group(1).strip()}


def make_frame_png(h, w, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    # low-frequency + noise: compresses like a real frame, not like
    # white noise (PNG size affects the HTTP path being measured)
    base = rng.integers(0, 255, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    img = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
    img = np.clip(img.astype(np.int16)
                  + rng.integers(-12, 12, img.shape), 0, 255).astype(np.uint8)
    buf = _stdio.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


class Server:
    """cli/serve.py subprocess: spawn, await health, query, kill."""

    def __init__(self, argv, log_path, startup_timeout=900.0):
        # truncate: the banner scan below reads from offset 0, and a
        # stale banner from a previous run would yield a dead port
        self.log = open(log_path, "wb")
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        self.proc = subprocess.Popen(
            [sys.executable, "-u", "-m", "larvanet_tpu.cli.serve"] + argv,
            cwd=REPO, env=env, stdout=self.log, stderr=subprocess.STDOUT)
        self.port = None
        self.error = None
        deadline = time.time() + startup_timeout
        log_read = open(log_path, "r")
        banner = ""  # accumulate: the banner line can split across read()s
        while time.time() < deadline and self.port is None:
            if self.proc.poll() is not None:
                self.error = "server exited rc=%d during startup" % self.proc.returncode
                return
            banner += log_read.read()
            # require the trailing newline so a mid-line read can't parse
            # a truncated port number
            m = re.search(r"serving .* on http://[^:]+:(\d+)[^\n]*\n", banner)
            if m:
                self.port = int(m.group(1))
                break
            time.sleep(2)
        log_read.close()
        if self.port is None:
            self.error = "server not serving after %.0fs" % startup_timeout
            self.stop()
            return
        # health (warmup already done by the time the port prints)
        try:
            code, _ = self.get("/healthz")
            if code != 200:
                self.error = "healthz=%d" % code
        except Exception as exc:
            self.error = "healthz failed: %r" % exc

    def get(self, path, timeout=120):
        with urllib.request.urlopen(
                "http://127.0.0.1:%d%s" % (self.port, path),
                timeout=timeout) as r:
            return r.status, r.read()

    def post_upscale(self, png, timeout=600):
        req = urllib.request.Request(
            "http://127.0.0.1:%d/upscale" % self.port, data=png,
            headers={"Content-Type": "image/png"})
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                body = r.read()
                return r.status, time.perf_counter() - t0, len(body)
        except urllib.error.HTTPError as e:
            e.read()
            return e.code, time.perf_counter() - t0, 0

    def info(self):
        code, body = self.get("/info")
        return json.loads(body) if code == 200 else {"error": code}

    def stop(self):
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait()
        self.log.close()


def _pcts(vals, qs=(50, 95, 99)):
    if not vals:
        return {("p%d" % q): None for q in qs}
    return {("p%d" % q): round(float(np.percentile(vals, q)), 4) for q in qs}


def drive_level(server, png, concurrency, n_requests, timeout=600):
    """Offered load: `concurrency` client threads splitting n_requests."""
    lat_ok, n_503, n_err, sr_bytes = [], 0, 0, 0
    lock = threading.Lock()
    counter = {"left": n_requests}

    def worker():
        nonlocal n_503, n_err, sr_bytes
        while True:
            with lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
            try:
                code, dt, nbytes = server.post_upscale(png, timeout=timeout)
            except Exception:
                with lock:
                    n_err += 1
                continue
            with lock:
                if code == 200:
                    lat_ok.append(dt)
                    sr_bytes = max(sr_bytes, nbytes)
                elif code == 503:
                    n_503 += 1
                else:
                    n_err += 1

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return {
        "offered_concurrency": concurrency,
        "requests": n_requests,
        "ok": len(lat_ok), "shed_503": n_503, "errors": n_err,
        "client_e2e_seconds": _pcts(lat_ok),
        "throughput_rps": round(len(lat_ok) / wall, 3) if wall else None,
        "sr_png_bytes": sr_bytes,
    }


def run_config(name, model, model_flags, server_flags, frame, n_requests,
               levels, workdir, startup_timeout):
    h, w = FRAMES[frame]
    ck = build_ckpt(model, model_flags, os.path.join(workdir, name))
    if not ck["ok"]:
        return {"ok": False, "stage": "ckpt", **ck}
    calib_dir = os.path.join(workdir, name + "_calib")
    if "--int8_trunk" in server_flags:
        os.makedirs(calib_dir, exist_ok=True)
        from PIL import Image

        png = make_frame_png(h, w, seed=7)
        with open(os.path.join(calib_dir, "calib0.png"), "wb") as f:
            f.write(png)
        server_flags = list(server_flags) + ["--int8_calib_path", calib_dir]

    argv = (["--model", model, "--restore_path", ck["path"],
             "--port", "0", "--warmup_size", "%dx%d" % (w, h)]
            + list(server_flags) + list(model_flags))
    t0 = time.time()
    srv = Server(argv, os.path.join(workdir, name + ".log"),
                 startup_timeout=startup_timeout)
    if srv.error:
        srv.stop()
        return {"ok": False, "stage": "startup", "error": srv.error}
    startup_s = round(time.time() - t0, 1)

    png = make_frame_png(h, w)
    out = {"ok": True, "model": model, "frame": frame,
           "lr_size": [h, w], "lr_png_bytes": len(png),
           "server_flags": server_flags + model_flags,
           "startup_plus_warmup_seconds": startup_s, "levels": []}
    try:
        for c in levels:
            lvl = drive_level(srv, png, c, n_requests)
            # NOTE: /info's sliding window is cumulative across levels —
            # each level's percentiles include earlier levels' samples.
            lvl["info_after"] = {
                k: v for k, v in srv.info().items()
                if k in ("device_seconds", "queue_wait_seconds",
                         "mean_device_seconds", "num_requests",
                         "num_rejected", "mode", "max_queue",
                         "dynamic_batch", "device_uint8", "pipeline_depth",
                         "uint8_input",
                         "num_forwards", "mean_batch_size")}
            out["levels"].append(lvl)
            # a dropped /info must not void the client percentiles already
            # collected for this config (round-4 review finding)
            dev_p50 = lvl["info_after"].get(
                "device_seconds", {}).get("p50", "n/a")
            print("  %s c=%d: ok=%d 503=%d e2e_p50=%s dev_p50=%s"
                  % (name, c, lvl["ok"], lvl["shed_503"],
                     lvl["client_e2e_seconds"]["p50"], dev_p50), flush=True)
    finally:
        srv.stop()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--configs", default="",
                    help="Comma list of config names (default: all).")
    ap.add_argument("--out", default=os.path.join(REPO, "SERVE_BENCH.json"))
    ap.add_argument("--workdir", default=os.path.join(REPO, "runs", "serve_bench"))
    ap.add_argument("--startup_timeout", type=float, default=900.0,
                    help="Server import + restore + warmup compile bound.")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    want = {c.strip() for c in args.configs.split(",") if c.strip()}
    report = {"tunnel_note":
              "device_seconds includes pulling the full SR frame through "
              "the axon tunnel (~34 MB/s bulk D2H) — an upper bound vs a "
              "PCIe TPU host; sr_png_bytes sizes that share.",
              "configs": {}}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
            report["configs"].update(prev.get("configs", {}))
    for name, model, mflags, sflags, frame, n, levels in CONFIGS:
        if (want and name not in want) or (not want and name.startswith("smoke")):
            continue
        print("== %s ==" % name, flush=True)
        try:
            report["configs"][name] = run_config(
                name, model, mflags, sflags, frame, n, levels,
                args.workdir, args.startup_timeout)
        except Exception as exc:  # never lose the partial report
            report["configs"][name] = {"ok": False, "error": repr(exc)}
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
