"""Close the int8 serving guardrail at RECIPE CONVERGENCE (VERDICT r4
weak#2 / next#2).

The shipped per-family int8 deltas (INT8_REAL.json) were measured on
2000-step checkpoints; the round-4 PAPER_TABLE measured 2-20x larger
deltas on the converged 300k/vol-8G recipe checkpoints (-0.044 dB EDSR)
— exactly the convergence-dependent growth BASELINE.md predicted. This
tool applies the documented production recipe (converge EXACT, then a
brief fake-quant fine-tune — the scheme that closed ebrn_rm
-0.044 -> -0.012 at 2000 steps) to the converged recipe checkpoints:

  1. restore the recipe checkpoint (full opt/scheduler state),
  2. measure the exact and int8 PSNR on the realistic eval crop (the
     pre-QAT delta at convergence),
  3. fine-tune --finetune_steps through the fake-quant graph at the
     checkpoint's own (converged, decayed) learning rate,
  4. re-measure both paths, save the QAT checkpoint under
     runs/qat_<model>/ for tools/paper_table.py,

and writes QAT_CONVERGED.json: per-model pre/post deltas plus the exact
PSNR the fine-tune itself cost (the honest trade). Protocol matches
reference test.py / validate.py quantize-first uint8 scoring via
eval_family (tools/int8_family_report.py).

Usage (repo root, on the TPU):
  python -m tools.qat_converged [--finetune_steps 2000] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time

import numpy as np

from tools.int8_family_report import REAL_EVAL_CROP, _fixture_images, eval_family
from tools.resilience import REPO

FIXTURE = "data/fixture_real"


def _newest_vol_ckpt(train_dir):
    ckpts = [c for c in os.listdir(train_dir) if c.endswith(".ckpt")]

    def step_of(name):
        m = re.match(r"model_step(\d+)_", name)
        return int(m.group(1)) if m else -1

    return os.path.join(train_dir, max(ckpts, key=step_of))


def default_entries():
    """(label, model, flags, ckpt) for the two converged recipe
    checkpoints recipe_full.py produces."""
    out = []
    edsr_dir = os.path.join(REPO, "runs", "recipe_edsr")
    if os.path.isdir(edsr_dir):
        steps = [re.match(r"model_(\d+)\.ckpt$", c)
                 for c in os.listdir(edsr_dir)]
        steps = [int(m.group(1)) for m in steps if m]
        if steps:
            out.append(("edsr_300k", "edsr", [],
                        os.path.join(edsr_dir, "model_%d.ckpt" % max(steps))))
    larva_dir = os.path.join(REPO, "runs", "recipe_larva")
    if os.path.isdir(larva_dir) and any(
            c.endswith(".ckpt") for c in os.listdir(larva_dir)):
        out.append(("larva_vol", "LarvaNet",
                    ["--num_modules", "2", "--num_blocks", "16,16"],
                    _newest_vol_ckpt(larva_dir)))
    return out


def qat_finetune_converged(model_name, flags, ckpt, lrs, hrs, finetune_steps,
                           scale=4, batch=16, patch=48, chunk_steps=250,
                           save_dir=None):
    import jax

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.data.device_pipeline import (
        BucketedDevicePipeline, make_device_train_fn)

    model = get_model(model_name)
    model.parse_args(list(flags))
    model.prepare(is_training=True, scales=[scale])
    model.restore(ckpt_path=ckpt)
    lr_now = float(model.get_learning_rate())
    print("  restored %s at step %d (lr %.2e)"
          % (ckpt, model.global_step, lr_now))

    report = {"ckpt": ckpt, "restored_step": model.global_step,
              "finetune_lr": lr_now, "finetune_steps": finetune_steps}
    report["pre"] = eval_family(model, model_name, lrs, hrs,
                                crop=REAL_EVAL_CROP)
    report["pre"].pop("images", None)
    print("  pre-QAT:  exact %.4f dB | int8 delta mean %+.4f, worst %+.4f"
          % (report["pre"]["mean_exact_psnr"],
             report["pre"]["mean_delta_db"], report["pre"]["worst_delta_db"]))

    # fake-quant fine-tune at the converged LR (the exact-then-finetune
    # recipe: int8_family_report.train_family's qat_finetune path)
    model.args.qat = 1
    for attr in ("_packed_train", "_packed_all", "_qat_cache"):
        if getattr(model, attr, None) is not None:
            setattr(model, attr, None)
    pipe = BucketedDevicePipeline.from_arrays(
        [a.astype(np.uint8) for a in lrs],
        [h[: l.shape[0] * scale, : l.shape[1] * scale]
         for l, h in zip(lrs, hrs)], scale)
    key = jax.random.PRNGKey(model.global_step)
    t0, done = time.time(), 0
    fns = {}
    while done < finetune_steps:
        todo = min(chunk_steps, finetune_steps - done)
        if todo not in fns:
            fns[todo] = make_device_train_fn(
                model, pipe, batch_size=batch, patch=patch,
                steps_per_call=todo)
        key, sub = jax.random.split(key)
        model.params, model.opt_state, loss = fns[todo](
            model.params, model.opt_state, lr_now, sub)
        done += todo
        model.global_step += todo
    # stop the clock only after a scalar readback forces the chained
    # chunks to completion — dispatch returns early and block_until_ready
    # acks before execution on this tunnel (CLAUDE.md timing methodology)
    float(loss)
    report["finetune_wall_s"] = round(time.time() - t0, 1)
    report["finetune_wall_note"] = ("includes first-chunk compile unless "
                                    "the persistent XLA cache was warm")
    print("  QAT fine-tune %d steps in %.1fs, final chunk loss %.3f"
          % (done, report["finetune_wall_s"], float(loss)))

    report["post"] = eval_family(model, model_name, lrs, hrs,
                                 crop=REAL_EVAL_CROP)
    report["post"].pop("images", None)
    print("  post-QAT: exact %.4f dB | int8 delta mean %+.4f, worst %+.4f"
          % (report["post"]["mean_exact_psnr"],
             report["post"]["mean_delta_db"],
             report["post"]["worst_delta_db"]))
    report["exact_cost_db"] = (report["post"]["mean_exact_psnr"]
                               - report["pre"]["mean_exact_psnr"])
    report["int8_gain_db"] = (report["post"]["mean_delta_db"]
                              - report["pre"]["mean_delta_db"])
    # net int8 quality vs the pre-QAT EXACT path — the serving question
    report["net_int8_vs_pre_exact_db"] = (
        report["post"]["mean_exact_psnr"] + report["post"]["mean_delta_db"]
        - report["pre"]["mean_exact_psnr"])
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        report["qat_ckpt"] = model.save(base_path=save_dir)
        print("  saved QAT checkpoint %s" % report["qat_ckpt"])
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--finetune_steps", type=int, default=2000)
    ap.add_argument("--entry", action="append", default=None,
                    help="'LABEL MODEL CKPT [flags...]' (default: the two "
                         "recipe checkpoints under runs/).")
    ap.add_argument("--out", default=os.path.join(REPO, "QAT_CONVERGED.json"))
    args = ap.parse_args(argv)

    if args.entry:
        import shlex

        entries = []
        for e in args.entry:
            parts = shlex.split(e)
            entries.append((parts[0], parts[1], parts[3:], parts[2]))
    else:
        entries = default_entries()
    if not entries:
        raise SystemExit("no recipe checkpoints under runs/ — run "
                         "tools/recipe_full.py first")

    lrs, hrs = _fixture_images(FIXTURE, realistic=True)
    report = {"protocol": "uint8 RGB PSNR on the realistic %dx%d LR crop "
                          "(eval_family); recipe: converge exact, then "
                          "fake-quant fine-tune at the converged LR"
                          % REAL_EVAL_CROP,
              "entries": {}}
    for label, model_name, flags, ckpt in entries:
        print("=== %s (%s) ===" % (label, model_name))
        try:
            report["entries"][label] = qat_finetune_converged(
                model_name, flags, ckpt, lrs, hrs, args.finetune_steps,
                save_dir=os.path.join(REPO, "runs", "qat_%s" % label))
            report["entries"][label]["model"] = model_name
            report["entries"][label]["flags"] = list(flags)
        except Exception as exc:
            print("  FAILED: %s" % (exc,))
            report["entries"][label] = {"error": str(exc)}
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
