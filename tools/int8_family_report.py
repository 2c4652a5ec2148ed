"""Per-family int8-vs-exact accuracy deltas on TRAINED models.

Round 1 shipped int8 serving for every packed family but measured its
accuracy on exactly one model (-0.056 dB, LarvaNet 2x8). This tool
closes VERDICT r1 item 4: for each int8-capable family it

  1. trains the model on the frozen fixture (larvanet_tpu/data/fixture)
     with the on-device pipeline (dataset resident in HBM — the only
     non-transfer-bound way to train through this TPU tunnel, CLAUDE.md),
  2. builds the exact packed forward and the int8 forward from the SAME
     trained params (cli/common.int8_and_exact_forwards — the identical
     routing the serving CLIs use, calibrated on a fixture batch),
  3. evaluates both on a fixed crop of the fixture's even-width eval
     images (ONE shape -> one remote compile per path) with the
     challenge protocol (uint8 RGB PSNR vs truth),

and reports per-family mean/worst dB deltas plus the exact-path PSNR vs
the bicubic base (the learning-validation soak VERDICT r1 item 2 asked
to re-run against the frozen fixture). Results land in
INT8_REPORT.json and are tabulated in docs/SERVING.md / BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

FAMILIES = [
    # (model name, flags, train steps) — default (paper) configs
    ("edsr", [], 2000),
    ("LarvaNet", ["--num_blocks", "8,8"], 2000),
    # MXU-native width extension, iso-capacity with the row above:
    # 9 blocks x 64ch = 16 blocks x 48ch trunk params/FLOPs exactly
    ("LarvaNet_w64", ["--num_blocks", "4,5"], 2000),
    ("TreeNet", [], 2000),
    ("REGO-Net", [], 2000),
    ("hrsr_c3", [], 2000),
    ("ebrn_rm", [], 2000),
    ("msrr_reduced", [], 2000),
    ("mamnet", [], 2000),
]

EVAL_CROP = (32, 28)  # one LR shape for every eval image -> one compile/path
REAL_EVAL_CROP = (72, 110)  # realistic fixture (~320x480 HR): soak_real's crop


def _fixture_images(root, scale=4, realistic=False):
    from larvanet_tpu.data import fixture, io

    (fixture.ensure_realistic if realistic else fixture.ensure)(root)
    lrs, hrs = [], []
    names = sorted(os.listdir(os.path.join(root, "x%d" % scale, "input")))
    for f in names:
        lr = io.load_image_u8(os.path.join(root, "x%d" % scale, "input", f))
        hr = io.load_image_u8(os.path.join(root, "x%d" % scale, "truth", f))
        lrs.append(lr)
        hrs.append(hr)
    return lrs, hrs


def train_family(name, flags, steps, lrs, hrs, scale=4, batch=16, patch=24,
                 chunk_steps=250, qat=False, qat_finetune_steps=0):
    import jax

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.data.device_pipeline import (
        BucketedDevicePipeline, make_device_train_fn)

    chunk_steps = min(chunk_steps, steps)
    model = get_model(name)
    model.parse_args(list(flags) + (["--qat", "1"] if qat else []))
    model.prepare(is_training=True, scales=[scale])
    pipe = BucketedDevicePipeline.from_arrays(
        [a.astype(np.uint8) for a in lrs],
        [h[: l.shape[0] * scale, : l.shape[1] * scale] for l, h in zip(lrs, hrs)],
        scale)
    if qat and qat_finetune_steps:
        # the exact-then-finetune recipe: converge exactly first, then a
        # fake-quant fine-tune. Flip the flag BEFORE building the train fn
        # so phase 1 is exact by construction, not by jit's lazy-trace
        # timing. (Measured: from-scratch QAT costs real exact PSNR —
        # LarvaNet -0.73 dB at 2000 steps; fine-tunes are delta-neutral —
        # BASELINE.md QAT table.)
        model.args.qat = 0
    fn = make_device_train_fn(model, pipe, batch_size=batch, patch=patch,
                              steps_per_call=chunk_steps)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    loss = None
    while model.global_step < steps:
        key, sub = jax.random.split(key)
        model.params, model.opt_state, loss = fn(
            model.params, model.opt_state, model.get_learning_rate(), sub)
        model.global_step += chunk_steps
    print("  trained %d steps in %.1fs, final chunk loss %.3f"
          % (steps, time.time() - t0, float(loss)))
    if qat and qat_finetune_steps:
        model.args.qat = 1
        for attr in ("_packed_train", "_packed_all", "_qat_cache"):
            if getattr(model, attr, None) is not None:
                setattr(model, attr, None)
        ft_chunk = min(chunk_steps, qat_finetune_steps)
        fn_ft = make_device_train_fn(model, pipe, batch_size=batch,
                                     patch=patch, steps_per_call=ft_chunk)
        t0, done = time.time(), 0
        while done < qat_finetune_steps:
            todo = min(ft_chunk, qat_finetune_steps - done)
            if todo != ft_chunk:  # remainder: one extra (smaller) compile
                fn_ft = make_device_train_fn(model, pipe, batch_size=batch,
                                             patch=patch, steps_per_call=todo)
            key, sub = jax.random.split(key)
            model.params, model.opt_state, loss = fn_ft(
                model.params, model.opt_state, model.get_learning_rate(), sub)
            done += todo
            model.global_step += todo
        print("  QAT fine-tune %d steps in %.1fs, final chunk loss %.3f"
              % (done, time.time() - t0, float(loss)))
    return model


def eval_family(model, name, lrs, hrs, scale=4, crop=EVAL_CROP):
    import jax

    from larvanet_tpu.cli.common import int8_and_exact_forwards
    from larvanet_tpu.eval import metrics
    from larvanet_tpu.models.layers import interpolated_base

    ch, cw = crop
    xs, ts = [], []
    for lr, hr in zip(lrs, hrs):
        if lr.shape[0] < ch or lr.shape[1] < cw:
            continue
        xs.append(lr[:ch, :cw].astype(np.float32))
        ts.append(hr[: ch * scale, : cw * scale])
    x = np.stack(xs)  # (N, ch, cw, 3)

    calib = x[:4]
    int8_fwd, exact_fwd = int8_and_exact_forwards(model, name, calib)
    # per-image PSNRs reduce ON DEVICE (psnr_rgb_jax = the same
    # round/clip-to-uint8 protocol): fetching full HR outputs at the
    # realistic geometry is ~70 MB per forward over the ~200 KB/s axon
    # tunnel D2H (CLAUDE.md) — scalars come back instead.
    t_dev = jax.device_put(np.stack(ts).astype(np.float32))
    pe_v = np.asarray(jax.jit(
        lambda p, v, t: metrics.psnr_rgb_jax(exact_fwd(p, v), t))(
            model.params, x, t_dev))
    pq_v = np.asarray(jax.jit(
        lambda p, v, t: metrics.psnr_rgb_jax(int8_fwd(p, v), t))(
            model.params, x, t_dev))
    pb_v = np.asarray(jax.jit(
        lambda v, t: metrics.psnr_rgb_jax(
            interpolated_base(v, scale, "bicubic"), t))(x, t_dev))

    rows = []
    for i in range(len(ts)):
        pe, pq, pb = float(pe_v[i]), float(pq_v[i]), float(pb_v[i])
        rows.append({"exact_psnr": pe, "int8_psnr": pq, "bicubic_psnr": pb,
                     "delta": pq - pe})
    deltas = [r["delta"] for r in rows]
    return {
        "images": rows,
        "mean_exact_psnr": float(np.mean([r["exact_psnr"] for r in rows])),
        "mean_bicubic_psnr": float(np.mean([r["bicubic_psnr"] for r in rows])),
        "mean_delta_db": float(np.mean(deltas)),
        "worst_delta_db": float(np.min(deltas)),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--fixture", default="data/fixture")
    parser.add_argument("--families", default=",".join(n for n, _, _ in FAMILIES))
    parser.add_argument("--steps", type=int, default=0,
                        help="Override training steps for every family (0 = per-family default).")
    parser.add_argument("--qat_finetune", type=int, default=0,
                        help="With --qat: train exactly for the full step "
                             "budget, then fine-tune THIS many steps through "
                             "the fake-quant graph (the production recipe).")
    parser.add_argument("--qat", type=int, default=0,
                        help="Train with quantization-aware fake-quant (--qat 1 "
                             "on the model) so the reported int8 delta measures "
                             "the QAT-closed gap; compare against the plain run "
                             "(INT8_REPORT.json vs QAT_REPORT.json).")
    parser.add_argument("--realistic", action="store_true",
                        help="Use the realistic fixture (data/fixture_real, 48 "
                             "natural-statistics images at ~320x480 HR) with a "
                             "%dx%d LR eval crop and patch-48 training — the "
                             "VERDICT r2 #4 geometry. Default --fixture becomes "
                             "data/fixture_real; write to INT8_REAL.json."
                             % REAL_EVAL_CROP)
    parser.add_argument("--patch", type=int, default=0,
                        help="Training patch size override (0 = 24, or 48 with "
                             "--realistic).")
    parser.add_argument("--out", default="")
    args = parser.parse_args(argv)
    if args.realistic and args.fixture == "data/fixture":
        args.fixture = "data/fixture_real"
    out_path = args.out or ("INT8_REAL.json" if args.realistic
                            else "INT8_REPORT.json")
    crop = REAL_EVAL_CROP if args.realistic else EVAL_CROP
    patch = args.patch or (48 if args.realistic else 24)

    lrs, hrs = _fixture_images(args.fixture, realistic=args.realistic)
    want = set(args.families.split(","))
    report = {}
    for name, flags, steps in FAMILIES:
        if name not in want:
            continue
        if args.qat and name == "mamnet":
            # mamnet trains through the PLAIN trunk (the fully packed
            # training graph is a measured 5.7x regression, BASELINE.md),
            # so there is no packed pair to fake-quantize; its int8
            # serving keeps the post-training calibration + --int8_report
            # guardrail.
            print("=== %s === skipped under --qat (plain-trunk training)" % name)
            continue
        print("=== %s ===" % name)
        try:
            model = train_family(name, flags, args.steps or steps, lrs, hrs,
                                 patch=patch, qat=bool(args.qat),
                                 qat_finetune_steps=args.qat_finetune)
            rep = eval_family(model, name, lrs, hrs, crop=crop)
        except Exception as exc:
            print("  FAILED: %s" % (exc,))
            report[name] = {"error": str(exc)}
            continue
        report[name] = rep
        print("  exact %.3f dB (bicubic %.3f) | int8 delta mean %+.4f dB, "
              "worst %+.4f dB"
              % (rep["mean_exact_psnr"], rep["mean_bicubic_psnr"],
                 rep["mean_delta_db"], rep["worst_delta_db"]))
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print("wrote %s" % out_path)
    return report


if __name__ == "__main__":
    main()
