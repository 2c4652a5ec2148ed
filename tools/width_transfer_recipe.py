"""Width transfer at recipe scale (VERDICT r4 weak — next#5).

docs/SERVING.md's recommendation — train 48ch, widen, serve w64 — was
evidenced only by a CPU smoke. This tool runs the real experiment on
the TPU through the shipped CLIs:

  1. `--widen_from` the trained flagship LarvaNet 2x16 checkpoint
     (runs/recipe_larva, tools/recipe_full.py phase B) into
     LarvaNet_w64 2x16 (width transfer preserves topology —
     utils/width_transfer.py — so the w64 arm keeps num_blocks 16,16)
     and fine-tune --finetune_steps through cli/train_larva,
  2. train a COLD w64 2x16 for the same step budget (the control),
  3. score source / widened / cold on the uniform realistic val set
     via cli/validate (challenge protocol), and
  4. measure the serving throughput both widths realize end-to-end
     (chained-fori LR-MP/s, packed bf16 + int8 — bench.py methodology).

Report -> WIDTH_TRANSFER.json: PSNR retention vs the 48ch source, the
advantage over the cold control at equal budget, and the MP/s delta the
widening buys. (Reference counterpart: none — TPU-native extension;
SURVEY §7 stretch.)

Usage (repo root, TPU; after tools/recipe_full.py):
  python -m tools.width_transfer_recipe [--finetune_steps 6000]
"""

from __future__ import annotations

import argparse
import json
import os

from tools.qat_converged import _newest_vol_ckpt
from tools.recipe_full import (FIXTURE, VAL_DIR, _eval_ckpt, _rate_summary,
                               ensure_uniform_val, stream_cli)
from tools.resilience import REPO

W64_FLAGS = ["--num_modules", "2", "--num_blocks", "16,16"]


def train_w64(train_path, log, steps, val_every, widen_from=None,
              timeout=3600.0):
    os.makedirs(train_path, exist_ok=True)
    val_volume = val_every * 110592
    argv = ["larvanet_tpu.cli.train_larva",
            "--dataloader", "basic_loader",
            "--data_input_path", os.path.join(FIXTURE, "x4", "input"),
            "--data_truth_path", os.path.join(FIXTURE, "x4", "truth"),
            "--val_dataloader", "basic_loader",
            "--val_data_input_path", os.path.join(VAL_DIR, "input"),
            "--val_data_truth_path", os.path.join(VAL_DIR, "truth"),
            "--train_path", train_path,
            "--model", "LarvaNet_w64"] + W64_FLAGS + [
            "--device_pipeline", str(val_every),
            "--val_volume", str(val_volume),
            "--async_checkpoint", "1",
            "--max_steps", str(steps)]
    if widen_from:
        argv += ["--widen_from", widen_from]
    run = stream_cli(argv, log, timeout=timeout)
    ckpts = [c for c in sorted(os.listdir(train_path)) if c.endswith(".ckpt")]
    newest = _newest_vol_ckpt(train_path) if ckpts else None
    return {
        "run": {k: v for k, v in run.items() if k != "chunks"},
        "validations": run["validations"],
        "steps_per_sec": _rate_summary(run["chunks"]),
        "final_ckpt": newest,
        "ok": run["ok"] and newest is not None,
    }


def measure_throughput(model_name, flags, ckpt):
    """Serving LR-MP/s (packed bf16 + int8) from the trained weights."""
    from tools.leg_frontier import _restore_leg_model, bench_leg
    from larvanet_tpu.core.registry import get_model

    model = get_model(model_name)
    model.parse_args(list(flags))
    model.prepare(is_training=False, scales=[4])
    model.restore(ckpt_path=ckpt, strict=False)
    out = {}
    for mode in ("bf16", "int8"):
        try:
            out[mode] = bench_leg(model, -1, mode)
        except Exception as exc:
            out[mode] = {"error": str(exc)}
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--finetune_steps", type=int, default=6000)
    ap.add_argument("--val_every", type=int, default=2000)
    ap.add_argument("--source_ckpt", default="",
                    help="Trained 48ch flagship checkpoint (default: "
                         "newest under runs/recipe_larva).")
    ap.add_argument("--skip_throughput", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "WIDTH_TRANSFER.json"))
    args = ap.parse_args(argv)

    ensure_uniform_val()
    src = args.source_ckpt or _newest_vol_ckpt(
        os.path.join(REPO, "runs", "recipe_larva"))
    report = {"source_ckpt": src, "finetune_steps": args.finetune_steps,
              "design": "widened (warm) vs cold w64 2x16 at the identical "
                        "step budget through the real cli/train_larva; "
                        "scored on the uniform realistic val set"}

    print("== source (48ch flagship) eval ==", flush=True)
    report["source_eval"] = _eval_ckpt(
        "LarvaNet", W64_FLAGS, src, VAL_DIR)

    print("== widened w64 fine-tune (%d steps) ==" % args.finetune_steps,
          flush=True)
    report["widened"] = train_w64(
        os.path.join(REPO, "runs", "wt_widened"),
        os.path.join(REPO, "runs", "wt_widened.log"),
        args.finetune_steps, args.val_every, widen_from=src)
    if report["widened"]["ok"]:
        report["widened"]["eval"] = _eval_ckpt(
            "LarvaNet_w64", W64_FLAGS, report["widened"]["final_ckpt"],
            VAL_DIR)

    print("== cold w64 control (%d steps) ==" % args.finetune_steps,
          flush=True)
    report["cold"] = train_w64(
        os.path.join(REPO, "runs", "wt_cold"),
        os.path.join(REPO, "runs", "wt_cold.log"),
        args.finetune_steps, args.val_every)
    if report["cold"]["ok"]:
        report["cold"]["eval"] = _eval_ckpt(
            "LarvaNet_w64", W64_FLAGS, report["cold"]["final_ckpt"], VAL_DIR)

    def psnr(d):
        return d.get("eval", d).get("mean_psnr") if isinstance(d, dict) else None

    s, w, c = (psnr(report["source_eval"]), psnr(report["widened"]),
               psnr(report["cold"]))
    if None not in (s, w, c):
        report["summary"] = {
            "source_48ch_psnr": s,
            "widened_w64_psnr": w,
            "cold_w64_psnr": c,
            "retention_vs_source_db": round(w - s, 4),
            "advantage_vs_cold_db": round(w - c, 4),
        }

    if not args.skip_throughput and report["widened"].get("ok"):
        print("== serving throughput (48ch vs w64, trained weights) ==",
              flush=True)
        report["throughput"] = {
            "source_48ch": measure_throughput("LarvaNet", W64_FLAGS, src),
            "widened_w64": measure_throughput(
                "LarvaNet_w64", W64_FLAGS, report["widened"]["final_ckpt"]),
        }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote %s" % args.out)
    if "summary" in report:
        print(json.dumps(report["summary"]))
    return report


if __name__ == "__main__":
    main()
