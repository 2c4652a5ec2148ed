"""Headline benchmark: EDSR-baseline x4 inference megapixels/sec/chip.

Runs on whatever jax.devices() provides (the real TPU under the driver).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol: batched 192x192 LR tiles (the batched-tile full-frame engine's
steady-state shape), bf16 compute, timing excludes compilation, device-
synced via block_until_ready — the TPU analog of the reference's
cuda-synchronized runtime.py:61-73.

vs_baseline divides by the frozen PyTorch-GPU estimate in BASELINE.md
(1.5 LR-MP/s for EDSR-b x4 on a V100-class card; the reference repo
publishes no numbers — BASELINE.md documents the derivation).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_GPU_MPS = 1.5  # see BASELINE.md "reference throughput estimate"


def log(*a):
    print(*a, file=sys.stderr)


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="edsr")
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--tile", type=int, default=192)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from larvanet_tpu.core.registry import get_model

    dev = jax.devices()[0]
    log("device:", dev)

    model = get_model(args.model)
    model.parse_args([])
    model.prepare(is_training=False, scales=[4])

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), model.params)

    @jax.jit
    def fwd(p, x):
        return model.module.apply({"params": p}, x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(0, 255, (args.batch, args.tile, args.tile, 3)).astype(np.float32),
        dtype=dtype,
    )
    x = jax.device_put(x, dev)
    params = jax.device_put(params, dev)

    for _ in range(args.warmup):
        jax.block_until_ready(fwd(params, x))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mp = args.batch * args.tile * args.tile * args.iters / 1e6
    mps = mp / dt
    log("%.2f LR-MP in %.3fs" % (mp, dt))
    print(json.dumps({
        "metric": "%s_x4_inference_throughput" % args.model,
        "value": round(mps, 3),
        "unit": "LR_megapixels/sec/chip",
        "vs_baseline": round(mps / BASELINE_GPU_MPS, 2),
    }))


if __name__ == "__main__":
    main()
