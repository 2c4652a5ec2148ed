"""One-command paper-protocol benchmark table (VERDICT r3 next#7).

Takes a dataset root laid out in the docs/DATASETS.md directory
contract (`<root>/test_LR/<dataset>/`, `<root>/test_HR/<dataset>/` —
what tools/fetch_datasets.py produces on a networked host) plus one or
more model checkpoints, runs the reference test.py protocol over every
benchmark suite (shave=scale Y-of-YCbCr PSNR + SSIM; DIV2K_val scored
RGB — reference test.py:91-98,152-170 via cli/test.py), and emits the
full benchmark table in one shot: PAPER_TABLE.json + a markdown table
on stdout. Optional --ema and --int8_trunk add those serving variants
as extra rows per model.

Each scoring run is a bounded, retried subprocess under the
tools/resilience contract: a wedged tunnel or a crashed family yields a
structured {"ok": false} cell, never a traceback or a lost table.

Usage (repo root):
  python -m tools.paper_table --root data \
      --entry "edsr model_300000.ckpt" \
      --entry "LarvaNet ckpt.pth --num_modules 2 --num_blocks 8,8" \
      [--ema] [--int8_trunk] [--datasets Set5,Set14,...]
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import sys
import tempfile

from tools.resilience import REPO, run_measured

# canonical paper-suite order (reference test.py:91-98)
CANONICAL = ("Set5", "Set14", "BSD100", "Urban100", "Manga109", "DIV2K_val")


def detect_datasets(root, requested=""):
    """The suites present under <root>/test_LR, canonical order first;
    anything requested-but-absent is reported, not silently dropped."""
    lr_root = os.path.join(root, "test_LR")
    present = set(os.listdir(lr_root)) if os.path.isdir(lr_root) else set()
    if requested:
        want = [d for d in requested.split(",") if d]
    else:
        extra = sorted(present - set(CANONICAL))
        want = [d for d in CANONICAL if d in present] + extra
    have = [d for d in want if d in present]
    missing = [d for d in want if d not in present]
    return have, missing


def score_entry(root, model, ckpt, model_flags, datasets, scale=4,
                variant_flags=(), timeout=3600, retries=1):
    """One cli/test.py run -> {dataset: {mean_psnr, mean_ssim}}."""
    with tempfile.TemporaryDirectory() as td:
        rj = os.path.join(td, "report.json")
        cmd = [sys.executable, "-m", "larvanet_tpu.cli.test",
               "--model", model, "--restore_path", ckpt,
               "--scales", str(scale),
               "--input_root_path", os.path.join(root, "test_LR"),
               "--truth_root_path", os.path.join(root, "test_HR"),
               "--output_root_path", os.path.join(td, "sr"),
               "--datasets", ",".join(datasets),
               "--report_json", rj] + list(variant_flags) + list(model_flags)
        r = run_measured(cmd, timeout=timeout, retries=retries)
        if not r["ok"]:
            return r
        with open(rj) as f:
            report = json.load(f)
    return {"ok": True, "attempts": r["attempts"],
            "results": {ds: {"mean_psnr": v["mean_psnr"],
                             "mean_ssim": v["mean_ssim"]}
                        for ds, v in report.items()}}


def markdown_table(datasets, rows):
    head = "| model | " + " | ".join(datasets) + " |"
    sep = "|---" * (len(datasets) + 1) + "|"
    lines = [head, sep]
    for row in rows:
        label = row["model"] + (" (%s)" % row["variant"]
                                if row["variant"] != "exact" else "")
        cells = []
        for ds in datasets:
            res = row.get("results", {}).get(ds)
            if res is None:
                cells.append("ERROR" if not row.get("ok", True) else "—")
            else:
                cells.append("%.2f / %.4f" % (res["mean_psnr"], res["mean_ssim"]))
        lines.append("| %s | %s |" % (label, " | ".join(cells)))
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default="data",
                    help="Dataset root in the docs/DATASETS.md contract "
                         "(test_LR/<dataset>, test_HR/<dataset>).")
    ap.add_argument("--entry", action="append", required=True,
                    help="'MODEL CKPT [model flags...]' (shell-quoted; "
                         "repeat per model).")
    ap.add_argument("--datasets", default="",
                    help="Comma list; default = every canonical suite "
                         "present under <root>/test_LR.")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--ema", action="store_true",
                    help="Add an EMA-weights row per model (--ema 1).")
    ap.add_argument("--int8_trunk", action="store_true",
                    help="Add an int8 (W8A8) trunk row per model.")
    ap.add_argument("--timeout", type=float, default=3600,
                    help="Per-run wall timeout (full suites are large).")
    ap.add_argument("--out", default=os.path.join(REPO, "PAPER_TABLE.json"))
    args = ap.parse_args(argv)

    datasets, missing = detect_datasets(args.root, args.datasets)
    if missing:
        print("MISSING under %s/test_LR (not scored): %s"
              % (args.root, ",".join(missing)))
    if not datasets:
        print("no benchmark suites found under %s/test_LR"
              % args.root)
        report = {"root": args.root, "datasets": [], "missing": missing,
                  "rows": []}
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")
        return report

    variants = [("exact", [])]
    if args.ema:
        variants.append(("ema", ["--ema", "1"]))
    if args.int8_trunk:
        variants.append(("int8", ["--int8_trunk", "1"]))

    rows = []
    for entry in args.entry:
        parts = shlex.split(entry)
        if len(parts) < 2:
            rows.append({"model": entry, "variant": "exact", "ok": False,
                         "error": "entry needs 'MODEL CKPT [flags...]'"})
            continue
        model, ckpt, flags = parts[0], parts[1], parts[2:]
        for variant, vflags in variants:
            print("== scoring %s (%s) on %s ==" % (model, variant,
                                                   ",".join(datasets)),
                  flush=True)
            r = score_entry(args.root, model, ckpt, flags, datasets,
                            scale=args.scale, variant_flags=vflags,
                            timeout=args.timeout)
            rows.append({"model": model, "ckpt": ckpt, "flags": flags,
                         "variant": variant, **r})

    report = {"root": args.root, "scale": args.scale, "datasets": datasets,
              "missing": missing, "protocol":
                  "reference test.py:118-170 (shave=scale Y-PSNR/SSIM; "
                  "DIV2K_val RGB)", "rows": rows}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(markdown_table(datasets, rows))
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
