"""Serving endurance soak (VERDICT r4 weak#6 / next#7).

SERVE_BENCH.json measures short windows; production cares about
stability over TIME. This tool drives cli/serve.py — the real server
subprocess over HTTP — under sustained closed-loop load for a
configurable duration (default 3 segments x >=10 min: direct uint8,
dynamic-batch, int8 trunk) and records, per 5-minute window:

  * client p50/p99 end-to-end latency (drift across windows),
  * server /info host RSS + device bytes-in-use (leak trend),
  * throughput rps per window,

plus, per segment:

  * /metrics counter consistency vs the client's own counts
    (lvt_requests_total == client ok + 503; rejected == 503),
  * a final SIGTERM **drain under load**: clients still in flight when
    the signal lands; in-flight requests must complete 200, the server
    must exit 0 within the grace period, and new requests must shed 503
    (cli/serve.py drain contract — production extension of reference
    get_sr.py:62-97).

Results -> SERVE_SOAK.json and the stability section in docs/SERVING.md.

Usage (repo root, TPU):
  python -m tools.serve_soak                      # full ~35 min soak
  python -m tools.serve_soak --seg_seconds 60     # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import threading
import time

import numpy as np

from tools.resilience import REPO
from tools.serve_bench import FRAMES, Server, build_ckpt, make_frame_png, _pcts

# (name, model, model_flags, server_flags, frame, concurrency)
SEGMENTS = [
    ("edsr_direct_270p", "edsr", [], [], "270p", 2),
    ("edsr_batch8_270p", "edsr", [], ["--dynamic_batch", "8"], "270p", 4),
    ("edsr_int8_270p", "edsr", [], ["--int8_trunk", "1"], "270p", 2),
    # smoke_*: excluded from the default soak; CPU-sized segment for the
    # tool's own test (tests/test_serve_soak.py)
    ("smoke_tiny", "edsr",
     ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"], [],
     "tiny", 2),
]


def _scrape_metrics(server):
    code, body = server.get("/metrics")
    if code != 200:
        return {"error": code}
    out = {}
    for m in re.finditer(r"^(lvt_\w+)(?:\{[^}]*\})? ([0-9.eE+-]+)$",
                         body.decode(), re.M):
        out.setdefault(m.group(1), float(m.group(2)))
    return out


def soak_segment(name, model, model_flags, server_flags, frame, concurrency,
                 seg_seconds, window_seconds, workdir, startup_timeout):
    h, w = FRAMES[frame]
    ck = build_ckpt(model, model_flags, os.path.join(workdir, name))
    if not ck["ok"]:
        return {"ok": False, "stage": "ckpt", **ck}
    if "--int8_trunk" in server_flags:
        calib_dir = os.path.join(workdir, name + "_calib")
        os.makedirs(calib_dir, exist_ok=True)
        with open(os.path.join(calib_dir, "calib0.png"), "wb") as f:
            f.write(make_frame_png(h, w, seed=7))
        server_flags = list(server_flags) + ["--int8_calib_path", calib_dir]

    argv = (["--model", model, "--restore_path", ck["path"],
             "--port", "0", "--warmup_size", "%dx%d" % (w, h)]
            + list(server_flags) + list(model_flags))
    srv = Server(argv, os.path.join(workdir, name + ".log"),
                 startup_timeout=startup_timeout)
    if srv.error:
        srv.stop()
        return {"ok": False, "stage": "startup", "error": srv.error}

    pngs = [make_frame_png(h, w, seed=s) for s in range(4)]  # mixed content
    stop_flag = threading.Event()
    lock = threading.Lock()
    samples = []  # (t, latency) for 200s
    counts = {"ok": 0, "shed": 0, "err": 0, "drain_ok": 0, "drain_shed": 0,
              "drain_err": 0}
    draining = threading.Event()

    def worker(wid):
        i = 0
        while not stop_flag.is_set():
            i += 1
            try:
                code, dt, _ = srv.post_upscale(pngs[(wid + i) % len(pngs)],
                                               timeout=600)
            except Exception:
                code, dt = -1, 0.0
            in_drain = draining.is_set()
            with lock:
                if code == 200:
                    if in_drain:
                        counts["drain_ok"] += 1
                    else:
                        counts["ok"] += 1
                        samples.append((time.perf_counter(), dt))
                elif code == 503:
                    counts["drain_shed" if in_drain else "shed"] += 1
                else:
                    counts["drain_err" if in_drain else "err"] += 1
            if in_drain:
                return  # one observation per worker post-signal is enough

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(k,))
               for k in range(concurrency)]
    for t in threads:
        t.start()

    windows, infos = [], []
    win_start, win_t0 = 0, t0
    while time.perf_counter() - t0 < seg_seconds:
        time.sleep(min(window_seconds,
                       max(1.0, seg_seconds - (time.perf_counter() - t0))))
        try:
            inf = srv.info()
        except Exception as exc:
            inf = {"error": repr(exc)}
        now = time.perf_counter()
        with lock:
            cur = samples[win_start:]
            win_start = len(samples)
        lats = [d for _, d in cur]
        windows.append({
            "t_end_s": round(now - t0, 1),
            "requests": len(lats),
            "rps": round(len(lats) / max(now - win_t0, 1e-9), 3),
            "latency_s": _pcts(lats, qs=(50, 99)),
            "host_rss_mb": inf.get("host_rss_mb"),
            "device_memory_mb": inf.get("device_memory_mb"),
            "queue_depth": inf.get("queue_depth"),
        })
        infos.append(inf)
        win_t0 = now
        print("  %s window %d: %d req, rps %.2f, p50 %s, rss %s MB"
              % (name, len(windows), len(lats), windows[-1]["rps"],
                 windows[-1]["latency_s"]["p50"],
                 windows[-1]["host_rss_mb"]), flush=True)

    # counter consistency BEFORE the drain mutates the totals
    metrics_scrape = _scrape_metrics(srv)
    with lock:
        client_ok, client_shed = counts["ok"], counts["shed"]
    consistency = {
        "client_ok": client_ok, "client_503": client_shed,
        "lvt_requests_total": metrics_scrape.get("lvt_requests_total"),
        "lvt_rejected_total": metrics_scrape.get("lvt_rejected_total"),
        # accepted requests the server counted vs the client's 200s;
        # in-flight requests at scrape time allow a small skew
        "requests_match": (
            metrics_scrape.get("lvt_requests_total") is not None
            and abs(metrics_scrape["lvt_requests_total"] - client_ok)
            <= concurrency),
        "rejected_match": (
            metrics_scrape.get("lvt_rejected_total") is not None
            and abs(metrics_scrape["lvt_rejected_total"] - client_shed)
            <= concurrency),
    }

    # SIGTERM drain under load: workers are mid-request when it lands
    draining.set()
    srv.proc.send_signal(signal.SIGTERM)
    stop_flag.set()
    for t in threads:
        t.join(timeout=120)
    try:
        srv.proc.wait(timeout=60)
        drain_rc = srv.proc.returncode
    except Exception:
        srv.proc.kill()
        drain_rc = "killed"
    srv.stop()

    lat_all = [d for _, d in samples]
    rss_series = [w["host_rss_mb"] for w in windows
                  if w["host_rss_mb"] is not None]
    result = {
        "ok": True, "model": model, "frame": frame,
        "concurrency": concurrency,
        "server_flags": list(server_flags) + list(model_flags),
        "duration_s": round(time.perf_counter() - t0, 1),
        "total_requests_200": len(lat_all),
        "counts": counts,
        "latency_overall_s": _pcts(lat_all, qs=(50, 95, 99)),
        "windows": windows,
        "rss_mb_first_last": [rss_series[0], rss_series[-1]]
        if rss_series else None,
        "rss_growth_mb": round(rss_series[-1] - rss_series[0], 1)
        if len(rss_series) >= 2 else None,
        "metrics_consistency": consistency,
        "drain": {
            "rc": drain_rc,
            "inflight_completed_200": counts["drain_ok"],
            "shed_503_during_drain": counts["drain_shed"],
            "errors_during_drain": counts["drain_err"],
            "clean": drain_rc == 0 and counts["drain_err"] == 0,
        },
    }
    # p50 drift: last window vs first full window
    p50s = [w["latency_s"]["p50"] for w in windows
            if w["latency_s"]["p50"] is not None]
    if len(p50s) >= 2:
        result["p50_drift_pct"] = round(100.0 * (p50s[-1] - p50s[0])
                                        / max(p50s[0], 1e-9), 1)
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--segments", default="",
                    help="Comma list of segment names (default: all).")
    ap.add_argument("--seg_seconds", type=float, default=700.0,
                    help="Sustained-load duration per segment (default "
                         "~12 min x 3 segments ≈ 35 min of load).")
    ap.add_argument("--window_seconds", type=float, default=300.0,
                    help="Reporting window (default 5 min).")
    ap.add_argument("--out", default=os.path.join(REPO, "SERVE_SOAK.json"))
    ap.add_argument("--workdir", default=os.path.join(REPO, "runs", "serve_soak"))
    ap.add_argument("--startup_timeout", type=float, default=900.0)
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    want = {s.strip() for s in args.segments.split(",") if s.strip()}
    report = {"method": "closed-loop sustained load; 5-min windows; "
                        "SIGTERM drain fired while clients in flight; "
                        "counter consistency vs client-side counts",
              "segments": {}}
    for name, model, mflags, sflags, frame, conc in SEGMENTS:
        if (want and name not in want) or (not want and name.startswith("smoke")):
            continue
        print("== soak %s (%.0fs) ==" % (name, args.seg_seconds), flush=True)
        try:
            report["segments"][name] = soak_segment(
                name, model, mflags, sflags, frame, conc,
                args.seg_seconds, args.window_seconds, args.workdir,
                args.startup_timeout)
        except Exception as exc:
            report["segments"][name] = {"ok": False, "error": repr(exc)}
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
