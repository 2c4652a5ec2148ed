"""On-TPU validation + microbenchmark for ops/pallas_conv.

Run on real hardware (tests/ force CPU where Mosaic cannot compile):

    python tools/pallas_check.py            # correctness sweep
    python tools/pallas_check.py perf       # chained-loop benchmark

Last measured on v5e (2026-08-16) with the HARDENED methodology
(nonlinear carry dependency + full-output reduction; earlier numbers
taken with weaker harnesses were artifacts — see BASELINE.md):
    XLA lax.conv          0.66 ms/conv  (65.6 TFLOP/s)
    pallas mode='im2col'  3.07 ms/conv  (14.2 TFLOP/s)  -> 4.6x SLOWER
The VMEM im2col concatenation is VPU-bound; XLA's conv at C=64 runs at
its structural MXU ceiling (~18% peak). The kernel remains as an
educational/opt-in path, NOT a performance path; trunk-speedup work
should target a Mosaic kernel without the lane-dim concat.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from larvanet_tpu.ops.pallas_conv import conv3x3_bias_act_pallas, _xla_conv3x3


def correctness():
    rng = np.random.default_rng(0)
    for shape, f in [((2, 48, 48, 64), 64), ((1, 33, 48, 32), 16), ((1, 8, 8, 8), 8)]:
        n, h, w, c = shape
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((3, 3, c, f)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal((f,)).astype(np.float32))
        for act in (None, "relu", "leaky_relu"):
            ours = np.asarray(jax.jit(
                lambda x, k, b: conv3x3_bias_act_pallas(x, k, b, act))(x, k, b))
            ref = np.asarray(_xla_conv3x3(x, k, b, act))
            err = float(np.abs(ours - ref).max())
            print(shape, f, act, "max_err", err, flush=True)
            assert err < 2e-4, err
    print("CORRECT")


def perf():
    rng = np.random.default_rng(0)
    n, h, w, c, f = 16, 192, 192, 64, 64
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)).astype(np.float32) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((f,)).astype(np.float32))
    gflops = 2 * n * h * w * 9 * c * f / 1e9

    def bench(name, fn, iters=16, base=4):
        def chain(n_iter):
            def body(i, acc):
                # nonlinear carry dependency + full-output reduction: see
                # bench.py for why anything weaker gets optimized away
                xi = jnp.maximum(x, (acc * 1e-35).astype(jnp.bfloat16) - 3e4)
                return acc + jnp.mean(fn(xi, k, b)).astype(jnp.float32)
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))
        run = jax.jit(chain, static_argnums=0)
        float(run(base)); float(run(iters))
        t0 = time.perf_counter(); float(run(base)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(iters)); tl = time.perf_counter() - t0
        per = (tl - ts) / (iters - base)
        print("%s: %.3f ms/conv, %.1f TFLOP/s" % (name, per * 1e3, gflops / per / 1e3), flush=True)

    bench("xla", lambda x, k, b: _xla_conv3x3(x, k, b, "relu"))
    bench("pallas_im2col", lambda x, k, b: conv3x3_bias_act_pallas(x, k, b, "relu", mode="im2col"))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "perf":
        perf()
    else:
        correctness()
