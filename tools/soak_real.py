"""Realistic-geometry training soaks (VERDICT r2 weak#2 / next#4).

The round-2 soak tables ran on the tiny (25-40 px) fixture, where the
plateau-LR machinery never fired a real LR drop and the EMA horizon
never mattered. This tool re-runs the full training machinery on the
realistic fixture (data/fixture_real: 48 natural-statistics images at
~320x480 HR, hash-pinned):

  Phase A — plateau staircase: hrsr (the reference's plateau-scheduled
    family, reference hrsr.py:91 patience=1) trains on the realistic
    set; every --val_every steps the challenge-protocol PSNR steps the
    model's ReduceLROnPlateau (mode=max, abs threshold) exactly as
    cli/train_schedule.py does. The run continues until >= --want_drops
    genuine LR reductions have fired (or --max_steps). The staircase
    (step, psnr, lr) is printed and recorded.

  Phase B — EMA horizon: EDSR trains with --ema_decay on the same data
    long enough that the averaging window holds converged weights; the
    final eval scores raw vs EMA params through the same protocol.

Writes SOAK_REAL.json. Run on the TPU (`python -m tools.soak_real`);
`--quick` is the CPU smoke configuration the test tier pins (tiny
model, forced-drop threshold — machinery coverage, not science).

Usage:
  python -m tools.soak_real [--max_steps 6000] [--out SOAK_REAL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _load_realistic(root, scale=4, eval_n=16):
    from larvanet_tpu.data import fixture, io

    fixture.ensure_realistic(root)
    names = sorted(os.listdir(os.path.join(root, "x%d" % scale, "input")))
    lrs, hrs = [], []
    for f in names:
        lrs.append(io.load_image_u8(os.path.join(root, "x%d" % scale, "input", f)))
        hrs.append(io.load_image_u8(os.path.join(root, "x%d" % scale, "truth", f)))
    return lrs, hrs, min(eval_n, len(lrs))


def _make_eval(model, lrs, hrs, scale, eval_n, crop):
    """One-compile challenge-protocol eval on fixed crops of eval_n images.

    The PSNR reduction runs ON DEVICE (metrics.psnr_rgb_jax — the same
    round/clip-to-uint8 protocol) and only eval_n scalars come back:
    bulk D2H over the axon tunnel runs ~200 KB/s (CLAUDE.md), so
    fetching the full HR outputs (~24 MB at the default geometry) would
    dominate every soak eval."""
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.eval import metrics

    ch, cw = crop
    xs = np.stack([lr[:ch, :cw].astype(np.float32) for lr in lrs[:eval_n]])
    ts = np.stack([hr[: ch * scale, : cw * scale].astype(np.float32)
                   for hr in hrs[:eval_n]])

    @jax.jit
    def fwd_psnr(p, v, t):
        return jnp.mean(metrics.psnr_rgb_jax(model._fwd_jit(p, v), t))

    ts_dev = jax.device_put(ts)

    def evaluate(params):
        return float(fwd_psnr(params, xs, ts_dev))

    return evaluate


def _pipeline(model, lrs, hrs, scale, batch, patch, chunk):
    from larvanet_tpu.data.device_pipeline import (
        BucketedDevicePipeline, make_device_train_fn)

    pipe = BucketedDevicePipeline.from_arrays(
        [a.astype(np.uint8) for a in lrs],
        [h[: l.shape[0] * scale, : l.shape[1] * scale]
         for l, h in zip(lrs, hrs)], scale)
    return make_device_train_fn(model, pipe, batch_size=batch, patch=patch,
                                steps_per_call=chunk)


def phase_a_plateau(args, lrs, hrs):
    """hrsr plateau staircase until >= want_drops LR reductions."""
    import jax

    from larvanet_tpu.core.registry import get_model

    model = get_model(args.model_a)
    model.parse_args(list(args.model_a_flags.split()) if args.model_a_flags else [])
    model.prepare(is_training=True, scales=[args.scale])
    if model.lr_scheduler is None:
        raise SystemExit("model %r has no plateau scheduler" % args.model_a)

    fn = _pipeline(model, lrs, hrs, args.scale, args.batch, args.patch,
                   args.val_every)
    evaluate = _make_eval(model, lrs, hrs, args.scale, args.eval_n,
                          (args.eval_crop_h, args.eval_crop_w))
    key = jax.random.PRNGKey(0)
    staircase, drops = [], 0
    lr_prev = model.get_learning_rate()
    t0 = time.time()
    while model.global_step < args.max_steps:
        key, sub = jax.random.split(key)
        model.params, model.opt_state, loss = fn(
            model.params, model.opt_state, model.get_learning_rate(), sub)
        model.global_step += args.val_every
        psnr = evaluate(model.params)
        lr = model.lr_scheduler.step(psnr)  # the train_schedule.py contract
        if lr < lr_prev * 0.999:
            drops += 1
        lr_prev = lr
        staircase.append({"step": int(model.global_step),
                          "psnr": round(psnr, 4), "lr": lr,
                          "loss": round(float(loss), 3)})
        print("  A step %6d  psnr %7.3f  lr %.3e  loss %8.3f  (drops %d)"
              % (model.global_step, psnr, lr, float(loss), drops))
        if drops >= args.want_drops:
            break
    return {
        "model": args.model_a,
        "staircase": staircase,
        "lr_drops": drops,
        "final_psnr": staircase[-1]["psnr"] if staircase else None,
        "seconds": round(time.time() - t0, 1),
        "steps": int(model.global_step),
    }


def phase_b_ema(args, lrs, hrs):
    """EDSR + --ema_decay: raw vs EMA weights at a converged horizon."""
    import jax

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.models.base import find_ema

    model = get_model(args.model_b)
    flags = list(args.model_b_flags.split()) if args.model_b_flags else []
    model.parse_args(flags)
    model.ema_decay = args.ema_decay
    model.prepare(is_training=True, scales=[args.scale])
    fn = _pipeline(model, lrs, hrs, args.scale, args.batch, args.patch,
                   min(args.chunk, args.steps_b))
    evaluate = _make_eval(model, lrs, hrs, args.scale, args.eval_n,
                          (args.eval_crop_h, args.eval_crop_w))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    while model.global_step < args.steps_b:
        key, sub = jax.random.split(key)
        model.params, model.opt_state, loss = fn(
            model.params, model.opt_state, model.get_learning_rate(), sub)
        model.global_step += min(args.chunk, args.steps_b)
    raw_psnr = evaluate(model.params)
    ema_params = find_ema(model.opt_state)
    if ema_params is None:
        raise SystemExit("EMA state missing from opt_state")
    ema_psnr = evaluate(ema_params)
    print("  B raw %.3f dB  ema(%.3g) %.3f dB  delta %+0.3f dB"
          % (raw_psnr, args.ema_decay, ema_psnr, ema_psnr - raw_psnr))
    return {
        "model": args.model_b,
        "ema_decay": args.ema_decay,
        "steps": int(model.global_step),
        "raw_psnr": round(raw_psnr, 4),
        "ema_psnr": round(ema_psnr, 4),
        "ema_delta_db": round(ema_psnr - raw_psnr, 4),
        "seconds": round(time.time() - t0, 1),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--fixture", default="data/fixture_real")
    parser.add_argument("--out", default="SOAK_REAL.json")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--patch", type=int, default=48)
    parser.add_argument("--eval_n", type=int, default=16)
    parser.add_argument("--eval_crop_h", type=int, default=72)
    parser.add_argument("--eval_crop_w", type=int, default=110)
    parser.add_argument("--model_a", default="hrsr")
    parser.add_argument("--model_a_flags", default="")
    parser.add_argument("--val_every", type=int, default=250)
    parser.add_argument("--max_steps", type=int, default=8000)
    parser.add_argument("--want_drops", type=int, default=2)
    parser.add_argument("--model_b", default="edsr")
    parser.add_argument("--model_b_flags", default="")
    parser.add_argument("--ema_decay", type=float, default=0.999)
    parser.add_argument("--steps_b", type=int, default=6000)
    parser.add_argument("--chunk", type=int, default=250)
    parser.add_argument("--skip_a", action="store_true")
    parser.add_argument("--skip_b", action="store_true")
    parser.add_argument("--quick", action="store_true",
                        help="CPU smoke: tiny configs, forced plateau drops "
                             "(machinery coverage, not measurement).")
    args = parser.parse_args(argv)

    if args.quick:
        args.batch, args.patch = 4, 16
        args.eval_n, args.eval_crop_h, args.eval_crop_w = 2, 24, 24
        args.val_every, args.max_steps, args.want_drops = 10, 60, 2
        args.steps_b, args.chunk = 20, 10
        # threshold 100 dB: no validation ever counts as an improvement,
        # so patience=1 fires a drop every other validation — exercises
        # the staircase plumbing deterministically on CPU
        args.model_a_flags = ((args.model_a_flags + " ") if args.model_a_flags
                              else "") + ("--num_lr_blocks 1 --num_hr_blocks 0 "
                                          "--threshold 100.0")
        args.model_b_flags = ((args.model_b_flags + " ") if args.model_b_flags
                              else "") + ("--edsr_res_blocks 1 "
                                          "--edsr_conv_features 8")
        args.ema_decay = 0.9

    lrs, hrs, args.eval_n = _load_realistic(args.fixture, args.scale,
                                            args.eval_n)
    report = {"fixture": args.fixture, "quick": bool(args.quick)}
    if not args.skip_a:
        print("phase A: plateau staircase (%s)" % args.model_a)
        report["plateau"] = phase_a_plateau(args, lrs, hrs)
    if not args.skip_b:
        print("phase B: EMA horizon (%s, decay %g)"
              % (args.model_b, args.ema_decay))
        report["ema"] = phase_b_ema(args, lrs, hrs)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
