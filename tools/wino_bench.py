"""Measure the Winograd trunk variants against the packed baseline on
the TPU (VERDICT r2 #2: "a TPU-measured number either beating 46.2, or
a trace-backed negative result").

Variants at the bench geometry (EDSR-b x4, batch x tile², bf16):
  packed   — the shipped width-packed + collapsed-tail forward
             (BENCH_r01: 46.33 MP/s; the 1.33x-floor baseline)
  wino2    — fused Pallas H-Winograd F(2,3) x W-packed ResBlocks
             (8 C^2 slots/px, 1.5x compute ceiling; ops/wino_pallas.py)
  wino4    — fused Pallas F(4,3) (6 C^2 slots/px, 2.0x ceiling)
  wino2d   — the pure-XLA 2-D Winograd F(2x2,3x3) trunk
             (ops/winograd.py; expected bandwidth-bound — measured to
             close the loop on the naive mapping)

Timing: bench.py's chained-fori methodology (the only honest one on
this tunnel — carry-perturbed inputs, full-output consumption, scalar
readback, two loop lengths differenced). PSNR delta of each variant vs
the exact f32 forward is recorded on one fixture image so the serving
guardrail lands with the speed number.

Writes WINO_BENCH.json. Run: python -m tools.wino_bench [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _timed_mps(forward, params, x, dtype, iters, base_iters, repeats):
    import jax
    import jax.numpy as jnp

    def chained(p, xx, n):
        def body(i, acc):
            xi = jnp.maximum(
                xx, (acc * jnp.float32(1e-35)).astype(dtype)
                - jnp.asarray(3e4, dtype))
            out = forward(p, xi)
            return acc + jnp.mean(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run = jax.jit(chained, static_argnums=(2,))
    float(run(params, x, base_iters))
    float(run(params, x, iters))

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(params, x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_large = timed(base_iters), timed(iters)
    per_iter = (t_large - t_small) / (iters - base_iters)
    if per_iter <= 0:
        per_iter = t_large / iters
    mp = x.shape[0] * x.shape[1] * x.shape[2] / 1e6
    return mp / per_iter, per_iter


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tile", type=int, default=192)
    parser.add_argument("--iters", type=int, default=32)
    parser.add_argument("--base_iters", type=int, default=8)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--blocks", type=int, default=16)
    parser.add_argument("--features", type=int, default=64)
    parser.add_argument("--tile_rows2", type=int, default=8)
    parser.add_argument("--tile_rows4", type=int, default=16)
    parser.add_argument("--variants", default="packed,wino2,wino4,wino2d")
    parser.add_argument("--family", default="edsr", choices=["edsr", "larva64"],
                        help="edsr: EDSR-b (the bench headline). larva64: "
                             "LarvaNet_w64 2x[4,5] (the TPU-native serving "
                             "recommendation; wino2d not applicable).")
    parser.add_argument("--out", default="WINO_BENCH.json")
    parser.add_argument("--quick", action="store_true",
                        help="CPU smoke: tiny geometry, interpret-mode "
                             "Pallas, 1 repeat (plumbing check only).")
    args = parser.parse_args(argv)

    import numpy as np
    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.tile = 1, 16
        args.iters, args.base_iters, args.repeats = 4, 2, 1
        args.blocks, args.features = 2, 8

    import jax.numpy as jnp

    import larvanet_tpu.cli.common  # noqa: F401  (compile cache)
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.fastpath import build_fast_forward
    from larvanet_tpu.ops.wino_pallas import (
        make_wino_pallas_edsr_forward, make_wino_pallas_larvanet_forward)
    from larvanet_tpu.ops.winograd import make_winograd_edsr_forward

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    interp = bool(args.quick)

    if args.family == "edsr":
        model = get_model("edsr")
        model.parse_args(["--edsr_res_blocks", str(args.blocks),
                          "--edsr_conv_features", str(args.features)])
        make_wino = make_wino_pallas_edsr_forward
    else:
        model = get_model("LarvaNet_w64")
        blocks = "1,1" if args.quick else "4,5"
        model.parse_args(["--num_blocks", blocks, "--num_features",
                          "16" if args.quick else "64"])
        make_wino = make_wino_pallas_larvanet_forward
        args.variants = ",".join(v for v in args.variants.split(",")
                                 if v.strip() != "wino2d")
    model.prepare(is_training=False, scales=[4])
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), model.params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (args.batch, args.tile, args.tile, 3))
                    .astype(np.float32), dtype=dtype)

    builders = {
        "packed": lambda: build_fast_forward(model, dtype)[0],
        "wino2": lambda: make_wino(
            model, dtype, tile_rows=args.tile_rows2, interpret=interp, m=2),
        "wino4": lambda: make_wino(
            model, dtype, tile_rows=args.tile_rows4, interpret=interp, m=4),
        "wino2d": lambda: make_winograd_edsr_forward(model, dtype=dtype),
    }

    # PSNR-delta reference: the exact f32 packed forward on one frame
    xr = jnp.asarray(rng.uniform(0, 255, (1, args.tile, args.tile, 3))
                     .astype(np.float32))
    exact = np.asarray(jax.jit(build_fast_forward(model, jnp.float32)[0])(
        model.params, xr), np.float64)

    def psnr_vs_exact(fwd):
        out = np.asarray(jax.jit(lambda p, v: fwd(p, v.astype(dtype))
                                 .astype(jnp.float32))(params, xr), np.float64)
        mse = float(np.mean((np.clip(np.round(out), 0, 255)
                             - np.clip(np.round(exact), 0, 255)) ** 2))
        return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    report = {"geometry": {"family": args.family, "batch": args.batch,
                           "tile": args.tile, "blocks": args.blocks,
                           "features": args.features, "dtype": args.dtype},
              "quick": bool(args.quick), "variants": {}}
    for name in args.variants.split(","):
        name = name.strip()
        try:
            fwd = builders[name]()
            mps, per_iter = _timed_mps(fwd, params, x, dtype, args.iters,
                                       args.base_iters, args.repeats)
            entry = {"mps": round(mps, 3), "s_per_iter": round(per_iter, 6),
                     "psnr_vs_exact_db": round(psnr_vs_exact(fwd), 2)}
            print("%-8s %9.3f MP/s  %.4f s/iter  psnr-vs-exact %.2f dB"
                  % (name, mps, per_iter, entry["psnr_vs_exact_db"]))
        except Exception as exc:  # record per-variant failures, keep going
            entry = {"error": "%s: %s" % (type(exc).__name__, exc)}
            print("%-8s FAILED: %s" % (name, entry["error"]), file=sys.stderr)
        report["variants"][name] = entry

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
