"""Full-frame production serving benchmark (device-resident frames).

bench.py's headline number is batched 192² PATCH throughput; a video /
still-image deployment serves whole frames. This tool measures the
single-chip compute throughput of the shipped fast-path graphs on
production frame geometries (default 1080p -> x4 = 8K output), using
the same tunnel-proof methodology as bench.py (chained lax.fori_loop
with a non-linear carry dependency + scalar readback, two loop lengths
differenced — CLAUDE.md: naive timing lies on this tunnel).

The frame stays RESIDENT in HBM across iterations — this measures the
device compute rate a pipelined server achieves when transfers overlap
compute (on real TPU hosts the PCIe link sustains this easily; this
box's tunnel does not, which is a property of the tunnel, not the
chip — see CLAUDE.md H2D/D2H notes).

Usage:
  python -m tools.frame_bench                       # default sweep
  python -m tools.frame_bench --frames 1920x1080 \
      --specs edsr:bf16,edsr:int8,LarvaNet_w64:bf16 --out FRAME_BENCH.json

Writes one JSON report (also printed) with MP/s and fps per
(model, dtype, frame) row. Counterpart of reference get_sr.py /
runtime.py:61-73 at deployment geometry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _model_flags(name):
    if name.startswith("LarvaNet") and name != "LarvaNet_w64":
        return ["--num_blocks", "16,16"]
    if name == "LarvaNet_w64":
        # iso-capacity serving config (BASELINE.md: 2x[9,9])
        return ["--num_blocks", "9,9"]
    return []


def bench_spec(name, mode, frame_hw, scale, iters, base_iters, repeats):
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.fastpath import build_fast_forward

    h, w = frame_hw
    model = get_model(name)
    model.parse_args(_model_flags(name))
    model.prepare(is_training=False, scales=[scale])

    dtype = jnp.bfloat16
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), model.params)
    calib = None
    if mode == "plain":
        # the UNPACKED module graph in bf16 — the measured winner at
        # monolithic full-frame shapes (BASELINE.md round-4 full-frame
        # routing); this arm locates the packed<->plain crossover
        from larvanet_tpu.ops.fastpath import make_plain_forward

        fast, desc = make_plain_forward(model, dtype), "plain module graph"
    else:
        if mode == "int8":
            calib = np.random.default_rng(1).uniform(
                0, 255, (4, 192, 192, 3)).astype(np.float32)
        fast, desc = build_fast_forward(
            model, dtype, packed_trunk=True, collapsed_tail=True,
            int8_trunk=(mode == "int8"), calib=calib)
        if fast is None:
            raise RuntimeError("no fast path for %s/%s" % (name, mode))
    print("  %s %s %dx%d: %s" % (name, mode, w, h, desc), file=sys.stderr)

    def chained(p, x, n):
        def body(i, acc):
            # non-linear carry dependency + full-output consumption:
            # the two rules that keep XLA from hoisting or slicing the
            # work out of the loop (bench.py methodology)
            xi = jnp.maximum(
                x, (acc * jnp.float32(1e-35)).astype(dtype)
                - jnp.asarray(3e4, dtype))
            out = fast(p, xi)
            return acc + jnp.mean(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run = jax.jit(chained, static_argnums=(2,))
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32), dtype=dtype), dev)
    p = jax.device_put(params, dev)

    t0 = time.perf_counter()
    float(run(p, x, base_iters))
    print("  compiled in %.1fs" % (time.perf_counter() - t0), file=sys.stderr)
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
    mp = h * w / 1e6
    return {
        "model": name, "dtype": mode, "frame": "%dx%d" % (w, h),
        "scale": scale, "s_per_frame": round(per_iter, 5),
        "lr_mps": round(mp / per_iter, 2),
        "fps": round(1.0 / per_iter, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", default="1920x1080",
                        help="comma-separated WxH LR frame sizes")
    parser.add_argument("--specs",
                        default="edsr:bf16,edsr:int8,LarvaNet:bf16,"
                                "LarvaNet_w64:bf16,LarvaNet_w64:int8",
                        help="comma-separated model:dtype entries "
                             "(dtype bf16 | int8 | plain = unpacked module "
                             "graph in bf16, the monolithic-frame winner)")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--base_iters", type=int, default=4)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--out", default="FRAME_BENCH.json")
    parser.add_argument("--force_cpu", action="store_true",
                        help="Hermetic test hook: force the CPU backend "
                             "before init (the axon plugin ignores "
                             "JAX_PLATFORMS — CLAUDE.md gotcha).")
    args = parser.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import larvanet_tpu.cli.common  # noqa: F401  (compile cache on)

    frames = []
    for f in args.frames.split(","):
        w, h = f.lower().split("x")
        frames.append((int(h), int(w)))

    rows = []
    for spec in args.specs.split(","):
        name, mode = spec.split(":")
        for hw in frames:
            try:
                rows.append(bench_spec(name, mode, hw, args.scale,
                                       args.iters, args.base_iters,
                                       args.repeats))
                print("  -> %s" % json.dumps(rows[-1]), file=sys.stderr)
            except Exception as e:  # keep the sweep alive per-spec
                rows.append({"model": name, "dtype": mode,
                             "frame": "%dx%d" % (hw[1], hw[0]),
                             "error": "%s: %s" % (type(e).__name__, e)})
                print("  FAILED %s" % rows[-1], file=sys.stderr)

    report = {"scale": args.scale, "method": "chained fori_loop, "
              "device-resident frame, differenced loop lengths",
              "rows": rows}
    print(json.dumps(report, indent=1, sort_keys=True))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
