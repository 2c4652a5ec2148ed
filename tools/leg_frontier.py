"""The early-exit ("anytime inference") frontier, measured (VERDICT r4
missing#2 / next#3).

The LarvaLeg mechanism (reference LarvaLeg.py:275,289-299: `--leg k`
runs k body modules and exits through leg k-1; k=0 is the pure
interpolated base) is routed through the packed and int8 fast paths
(ops/fastpath.py, ops/packed/larvanet.py) but had zero measured
evidence. This tool restores a TRAINED checkpoint into the early-exit
preset (LarvaLeg shares LarvaNet's param tree; LarvaLeg_w64 shares
LarvaNet_w64's) and, for every exit k = 0..M and both precisions
(packed bf16, int8 trunk):

  * quality — uint8 RGB PSNR on the realistic eval crop via the same
    int8_and_exact_forwards routing the serving CLIs use
    (tools/int8_family_report.eval_family protocol), and
  * throughput — chained-fori_loop LR-MP/s at the bench.py geometry
    (batch 16 x 192^2 patches, differenced loop lengths — naive timing
    lies on this tunnel, CLAUDE.md),

yielding the PSNR-vs-throughput trade per exit. Results land in
LEG_FRONTIER.json and BASELINE.md's anytime-inference table.

Usage (repo root, on the TPU; after tools/recipe_full.py):
  python -m tools.leg_frontier [--entry "LABEL MODEL CKPT [flags...]"]
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import time

import numpy as np

from tools.int8_family_report import REAL_EVAL_CROP, _fixture_images, eval_family
from tools.qat_converged import _newest_vol_ckpt
from tools.resilience import REPO

FIXTURE = "data/fixture_real"


def default_entries():
    out = []
    larva_dir = os.path.join(REPO, "runs", "recipe_larva")
    if os.path.isdir(larva_dir) and any(
            c.endswith(".ckpt") for c in os.listdir(larva_dir)):
        out.append(("flagship", "LarvaLeg",
                    ["--num_modules", "2", "--num_blocks", "16,16"],
                    _newest_vol_ckpt(larva_dir)))
    w64_dir = os.path.join(REPO, "runs", "recipe_LarvaNet_w64")
    if os.path.isdir(w64_dir):
        ckpts = sorted(c for c in os.listdir(w64_dir) if c.endswith(".ckpt"))
        if ckpts:
            out.append(("w64", "LarvaLeg_w64",
                        ["--num_modules", "2", "--num_blocks", "9,9"],
                        os.path.join(w64_dir, ckpts[-1])))
    return out


def _restore_leg_model(model_name, flags, ckpt, leg, scale=4):
    from larvanet_tpu.core.registry import get_model

    model = get_model(model_name)
    model.parse_args(list(flags) + ["--leg", str(leg)])
    model.prepare(is_training=False, scales=[scale])
    # LarvaNet checkpoints restore into the LarvaLeg presets directly:
    # identical param tree (the legs exist for every module either way).
    # strict=False because an is_training=True checkpoint carries opt
    # state this inference model doesn't own.
    model.restore(ckpt_path=ckpt, strict=False)
    return model


def bench_leg(model, leg, mode, batch=16, tile=192, iters=32, base_iters=8,
              repeats=3):
    """Chained-fori LR-MP/s of the leg-k forward (bench.py methodology)."""
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.ops.fastpath import build_fast_forward

    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), model.params)
    calib = None
    if mode == "int8":
        calib = np.random.default_rng(1).uniform(
            0, 255, (4, tile, tile, 3)).astype(np.float32)
    fast, desc = build_fast_forward(
        model, dtype, packed_trunk=True, collapsed_tail=True,
        int8_trunk=(mode == "int8"), calib=calib)
    if fast is None:
        raise RuntimeError("no fast path (leg=%d, %s)" % (leg, mode))

    def chained(p, x, n):
        def body(i, acc):
            xi = jnp.maximum(x, (acc * jnp.float32(1e-35)).astype(dtype)
                             - jnp.asarray(3e4, dtype))
            out = fast(p, xi)
            return acc + jnp.mean(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run = jax.jit(chained, static_argnums=(2,))
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (batch, tile, tile, 3)).astype(np.float32),
        dtype=dtype), dev)
    p = jax.device_put(params, dev)
    t0 = time.perf_counter()
    float(run(p, x, base_iters))
    compile_s = time.perf_counter() - t0
    float(run(p, x, iters))

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(p, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_large = timed(base_iters), timed(iters)
    per_iter = (t_large - t_small) / (iters - base_iters)
    if per_iter <= 0:
        per_iter = t_large / iters
    mps = batch * tile * tile / 1e6 / per_iter
    return {"lr_mps": round(mps, 2), "s_per_iter": round(per_iter, 6),
            "graph": desc, "compile_s": round(compile_s, 1)}


def frontier_entry(label, model_name, flags, ckpt, lrs, hrs, scale=4):
    from larvanet_tpu.core.registry import get_model

    probe = get_model(model_name)
    probe.parse_args(list(flags))
    n_modules = int(probe.args.num_modules)
    legs = list(range(0, n_modules + 1))
    rows = []
    for leg in legs:
        model = _restore_leg_model(model_name, flags, ckpt, leg, scale)
        row = {"leg": leg}
        try:
            q = eval_family(model, model_name, lrs, hrs, crop=REAL_EVAL_CROP)
            row["exact_psnr"] = q["mean_exact_psnr"]
            row["int8_delta_db"] = q["mean_delta_db"]
            row["bicubic_psnr"] = q["mean_bicubic_psnr"]
        except Exception as exc:
            row["psnr_error"] = str(exc)
        for mode in ("bf16", "int8"):
            try:
                row[mode] = bench_leg(model, leg, mode)
            except Exception as exc:
                row[mode] = {"error": str(exc)}
        print("  leg %d: psnr %s | bf16 %s MP/s | int8 %s MP/s"
              % (leg, row.get("exact_psnr"),
                 row.get("bf16", {}).get("lr_mps"),
                 row.get("int8", {}).get("lr_mps")), flush=True)
        rows.append(row)
    return {"model": model_name, "flags": list(flags), "ckpt": ckpt,
            "n_modules": n_modules, "rows": rows}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--entry", action="append", default=None,
                    help="'LABEL MODEL CKPT [flags...]' (default: the "
                         "trained recipe checkpoints under runs/).")
    ap.add_argument("--out", default=os.path.join(REPO, "LEG_FRONTIER.json"))
    args = ap.parse_args(argv)

    if args.entry:
        entries = []
        for e in args.entry:
            parts = shlex.split(e)
            entries.append((parts[0], parts[1], parts[3:], parts[2]))
    else:
        entries = default_entries()
    if not entries:
        raise SystemExit("no trained checkpoints under runs/ — run "
                         "tools/recipe_full.py first")

    lrs, hrs = _fixture_images(FIXTURE, realistic=True)
    report = {"protocol": "uint8 RGB PSNR at the realistic %dx%d crop; "
                          "throughput = chained fori_loop, batch 16 x "
                          "192^2, differenced (bench.py methodology); "
                          "leg semantics per reference LarvaLeg.py:289-299"
                          % REAL_EVAL_CROP,
              "entries": {}}
    for label, model_name, flags, ckpt in entries:
        print("=== %s (%s from %s) ===" % (label, model_name, ckpt),
              flush=True)
        try:
            report["entries"][label] = frontier_entry(
                label, model_name, flags, ckpt, lrs, hrs)
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
