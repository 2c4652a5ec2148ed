"""On-TPU validation + microbenchmark for ops/pallas_conv.

Run on real hardware (tests/ force CPU where Mosaic cannot compile):

    python tools/pallas_check.py            # correctness sweep
    python tools/pallas_check.py perf       # chained-loop benchmark

Last measured on v5e (2026-08-16), batch 16 x 192^2 x 64->64 bf16,
conv+bias+relu, chained fori_loop timing (see bench.py docstring for why):
    XLA lax.conv          3.66 ms/conv  (11.9 TFLOP/s)
    pallas mode='im2col'  2.99 ms/conv  (14.5 TFLOP/s)  -> 1.22x
    pallas mode='dots'    compile did not finish in 9 min (tunnel AOT)
Caveat recorded in BASELINE.md: inside a full conv *chain* XLA amortizes
layout transforms and reaches ~46 TFLOP/s equivalent, so per-conv
swapping into models is kept behind a flag until a fused multi-conv
(ResBlock-granularity) kernel lands.
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
                xi = (x.astype(jnp.float32) + acc * 1e-20).astype(jnp.bfloat16)
                return acc + jnp.sum(fn(xi, k, b)[..., :1, :1, :]).astype(jnp.float32)
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
