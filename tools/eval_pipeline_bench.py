"""Pin the dispatch-ahead eval-pipeline speedup with repetitions
(VERDICT r4 weak#4 / next#8).

Round 4's EVAL_PIPELINE.json ran each arm twice and the two serial runs
differed 2.5x (133.5 vs 330.0 s for 24 frames — the tunnel's serial
pull latency is that noisy), making the honest "2.9-6.7x" claim wide.
This tool drives the REAL cli/validate.py over the uniform realistic
val set with >= --reps runs per arm, ALTERNATING serial/pipelined so
slow tunnel epochs hit both arms equally, and reports per-arm medians
+ spread and the median-over-median speedup. Exactness is already
pinned byte-for-byte by tests/test_eval_pipeline.py; this artifact pins
the magnitude.

Usage (repo root, TPU):
  python -m tools.eval_pipeline_bench [--reps 3] [--depth 4]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

from tools.recipe_full import VAL_DIR, ensure_uniform_val
from tools.resilience import REPO, run_measured


def run_validate(depth, ckpt, extra_flags=(), timeout=1800):
    cmd = [sys.executable, "-m", "larvanet_tpu.cli.validate",
           "--dataloader", "basic_loader", "--model", "edsr",
           "--restore_path", ckpt, "--scales", "4",
           "--data_input_path", os.path.join(VAL_DIR, "input"),
           "--data_truth_path", os.path.join(VAL_DIR, "truth"),
           "--pipeline_depth", str(depth)] + list(extra_flags)

    def parse(stdout):
        m = re.search(r"^x4, psnr=([0-9.]+), duration=([0-9.]+)",
                      stdout, re.M)
        if not m:
            raise ValueError("no summary line")
        n = len(re.findall(r"^x4, \d+/\d+, psnr=", stdout, re.M))
        mean = float(m.group(2))
        # the summary duration is the MEAN per-frame dt; per-frame dts sum
        # to the eval loop's wall in both serial and pipelined modes
        # (eval/pipeline.py dt semantics), so mean*n = loop wall
        return {"mean_psnr": float(m.group(1)), "n_frames": n,
                "mean_s_per_frame": mean,
                "sum_frame_s": round(mean * n, 2)}

    r = run_measured(cmd, timeout=timeout, retries=0, parse=parse)
    return r


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--ckpt", default="",
                    help="EDSR checkpoint (default: runs/recipe_edsr's "
                         "final, falling back to a fresh-init save).")
    ap.add_argument("--out", default=os.path.join(REPO, "EVAL_PIPELINE.json"))
    args = ap.parse_args(argv)

    ensure_uniform_val()
    ckpt = args.ckpt
    if not ckpt:
        edsr_dir = os.path.join(REPO, "runs", "recipe_edsr")
        cands = []
        if os.path.isdir(edsr_dir):
            cands = [c for c in os.listdir(edsr_dir)
                     if re.match(r"model_\d+\.ckpt$", c)]
        if cands:
            ckpt = os.path.join(
                edsr_dir,
                max(cands, key=lambda c: int(re.findall(r"\d+", c)[0])))
        else:
            # weights don't affect timing; build a fresh init on CPU
            from tools.serve_bench import build_ckpt

            ck = build_ckpt("edsr", [], os.path.join(REPO, "runs", "eval_pipe_ck"))
            if not ck["ok"]:
                raise SystemExit("ckpt build failed: %s" % ck)
            ckpt = ck["path"]

    import time as _time

    arms = {1: [], args.depth: []}
    # warm the compile cache once so neither arm pays the AOT compile
    print("warmup run (compile)...", flush=True)
    run_validate(1, ckpt)
    # alternate serial/pipelined so tunnel-latency epochs hit both arms
    for rep in range(args.reps):
        for depth in (1, args.depth):
            print("rep %d depth %d..." % (rep + 1, depth), flush=True)
            t0 = _time.time()
            r = run_validate(depth, ckpt)
            row = {"rep": rep + 1, "ok": r["ok"],
                   "subprocess_wall_s": round(_time.time() - t0, 1)}
            if r["ok"]:
                # sum_frame_s = the eval loop's own wall (per-frame dt
                # semantics sum to loop wall, eval/pipeline.py) — excludes
                # interpreter startup + restore, the honest loop metric
                row.update(r)
                row.pop("attempts", None)
            else:
                row["error"] = r.get("error")
            arms[depth].append(row)
            print("  -> %s" % row, flush=True)

    def summarize(rows):
        walls = [r["sum_frame_s"] for r in rows if r.get("ok")]
        return {"runs": rows,
                "median_wall_s": float(np.median(walls)) if walls else None,
                "min_wall_s": min(walls) if walls else None,
                "max_wall_s": max(walls) if walls else None}

    serial, piped = summarize(arms[1]), summarize(arms[args.depth])
    psnrs = {round(r["mean_psnr"], 4) for rows in arms.values()
             for r in rows if r.get("ok")}
    report = {
        "what": "dispatch-ahead eval pipeline through cli/validate.py on "
                "the uniform realistic val set (%d frames, 72x110 LR), "
                "EDSR x4, %d reps per arm, arms interleaved"
                % (16, args.reps),
        "ckpt": ckpt,
        "serial": serial,
        "pipelined_depth_%d" % args.depth: piped,
        "speedup_median": round(serial["median_wall_s"]
                                / piped["median_wall_s"], 2)
        if serial["median_wall_s"] and piped["median_wall_s"] else None,
        "speedup_range": [
            round(serial["min_wall_s"] / piped["max_wall_s"], 2),
            round(serial["max_wall_s"] / piped["min_wall_s"], 2)]
        if serial["median_wall_s"] and piped["median_wall_s"] else None,
        "psnr_identical_across_all_runs": len(psnrs) == 1,
        "exactness": "byte-exactness pinned by tests/test_eval_pipeline.py "
                     "(pipelined vs serial: identical PNGs and reports)",
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in report.items()
                      if "runs" not in str(type(v))}, default=str)[:400])
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
