"""Conv-shape microbenchmark for the trunk-packing experiment.

Compares, on the real device, the useful-FLOP throughput of:
  a) the status-quo trunk conv: 3x3, 64->64, (B, T, T) spatial;
  b) the width-packed equivalent: 3x2, 128->128, (B, T, T/2) spatial
     (same useful work as (a): kernel is 25% structural zeros, so its
     raw FLOPs are 1.33x of (a) — we report both raw and useful);
  c) a both-dims packed variant: 2x2, 256->256, (B, T/2, T/2)
     (raw FLOPs 1.78x of (a));
  d) the pure-matmul ceiling at the packed shape: (B*T*T/2, 768)x(768,128).

Timing uses bench.py's hardened methodology (chained fori_loop, nonlinear
carry perturbation, full-output reduction, two-length differencing) —
see BASELINE.md for why anything weaker lies on this tunnel.
"""

import sys
import time

import numpy as np


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tile", type=int, default=192)
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--base_iters", type=int, default=16)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    B, T = args.batch, args.tile
    rng = np.random.default_rng(0)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = {}

    def add_case(name, x_shape, w_shape, fn, raw_flops):
        x = jnp.asarray(rng.normal(0, 1, x_shape).astype(np.float32), dtype)
        w = jnp.asarray(rng.normal(0, 0.05, w_shape).astype(np.float32), dtype)
        cases[name] = (jax.device_put(x, dev), jax.device_put(w, dev), fn, raw_flops)

    # (a) status quo
    add_case("3x3_c64", (B, T, T, 64), (3, 3, 64, 64), conv,
             2 * B * T * T * 9 * 64 * 64)
    # (b) width-packed
    add_case("3x2_c128_halfW", (B, T, T // 2, 128), (3, 2, 128, 128), conv,
             2 * B * T * (T // 2) * 6 * 128 * 128)
    # (c) both-dims packed
    add_case("2x2_c256_quarter", (B, T // 2, T // 2, 256), (2, 2, 256, 256), conv,
             2 * B * (T // 2) * (T // 2) * 4 * 256 * 256)
    # (d) matmul ceiling at packed shape
    M, K, N = B * T * (T // 2), 768, 128
    add_case("matmul_768x128", (M, K), (K, N), lambda x, w: x @ w, 2 * M * K * N)
    # (e) matmul ceiling at status-quo im2col shape
    M2, K2, N2 = B * T * T, 576, 64
    add_case("matmul_576x64", (M2, K2), (K2, N2), lambda x, w: x @ w, 2 * M2 * K2 * N2)

    useful = 2 * B * T * T * 9 * 64 * 64  # one trunk conv's real work

    for name, (x, w, fn, raw_flops) in cases.items():
        def chained(xx, ww, n, fn=fn):
            def body(i, acc):
                xi = jnp.maximum(xx, (acc * jnp.float32(1e-35)).astype(dtype)
                                 - jnp.asarray(3e4, dtype))
                return acc + jnp.mean(fn(xi, ww)).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        run = jax.jit(chained, static_argnums=(2,))
        float(run(x, w, args.base_iters))
        float(run(x, w, args.iters))

        def timed(n):
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(run(x, w, n))
                best = min(best, time.perf_counter() - t0)
            return best

        per = (timed(args.iters) - timed(args.base_iters)) / (args.iters - args.base_iters)
        print("%-18s %.3f ms  raw %6.1f TF/s  useful %6.1f TF/s" % (
            name, per * 1e3, raw_flops / per / 1e12,
            (useful if "matmul" not in name else raw_flops) / per / 1e12))


if __name__ == "__main__":
    main()
