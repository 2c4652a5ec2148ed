"""Stretch config 5 (BASELINE.json): 4K -> 8K streaming SR demo.

Upscales a synthetic 4K frame (2160x3840 LR -> 4320x7680 at x2... here
x4: 1920x1080 LR -> 4K/8K HR) using the full TPU-native stack:
  * spatially-sharded SPMD forward: the frame's height is split across
    the mesh with halo exchange over ICI (parallel/halo.py), so no
    single device ever holds the full HR activation;
  * optionally a batched checkpoint ensemble averaged on device.

Runs anywhere: on the single-TPU dev box it uses a 1-device mesh; with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu it
demonstrates the 8-way sharding (the driver's virtual-mesh trick).

    python tools/stream_8k_demo.py --devices 8 --height 1080 --width 1920
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_requested = os.environ.get("JAX_PLATFORMS")
if _requested:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _requested)
    except Exception:
        pass

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=0, help="spatial shards (0 = all devices)")
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--halo", type=int, default=16)
    parser.add_argument("--model", default="LarvaNet")
    parser.add_argument(
        "--num_blocks", default="4,4",
        help="TOY demo default (fast compile). Flagship serving configs are "
        "'16,16' (LarvaNet) and '9,9' (--model LarvaNet_w64) — measured 8K "
        "rows in BASELINE.md use those, not this default.")
    parser.add_argument("--ensemble", type=int, default=1,
                        help="average N differently-seeded checkpoints on device")
    parser.add_argument("--int8", type=int, default=0,
                        help="W8A8 quantized trunk (opt-in, NOT float-exact; ops/packed_trunk.py). "
                             "NOTE: measured SLOWER than bf16 at batch-1 full-frame (0.300 vs "
                             "0.265 s/frame) — the f32 dequant intermediates dominate without "
                             "batch amortization; int8 wins at batched-tile inference. In "
                             "--strips mode int8 also measured slower than bf16 strips "
                             "(TILE8K_flagship.json).")
    parser.add_argument("--strips", type=int, default=0,
                        help="Device-resident strip processing (eval/tiling."
                             "make_strip_batched_forward): cut the frame into N "
                             "uniform halo windows scanned chunk-at-a-time on "
                             "one chip. MEASURED SLOWER than the plain "
                             "full-frame forward at 1080p flagship/w64 (best "
                             "strips arm 2.0 vs 2.14 fps bf16 — the halo "
                             "duplication eats the per-pixel gain; "
                             "TILE8K_*.json, BASELINE.md round-4): a documented "
                             "negative result kept for frames too tall for "
                             "HBM. Bit-exact when --strip_halo >= the model's "
                             "receptive radius; smaller halos are the standard "
                             "tiled-SR seam approximation (dB measured on a "
                             "trained flagship in TILE8K_flagship.json). "
                             "0 = full-frame (default, fastest).")
    parser.add_argument("--strip_halo", type=int, default=32,
                        help="context rows per strip side in --strips mode")
    parser.add_argument("--strip_chunk", type=int, default=1,
                        help="strips per scan step in --strips mode (1 = "
                             "sequential, memory-bounded; must divide --strips)")
    parser.add_argument("--serving_dtype", default="f32", choices=["f32", "bf16"],
                        help="compute dtype of the serving graph "
                             "(bf16 = the throughput configuration BASELINE.md "
                             "measures; not bit-identical to f32)")
    parser.add_argument("--graph", default="auto",
                        choices=["auto", "packed", "plain"],
                        help="single-chip full-frame graph: 'plain' = the "
                             "unpacked module graph — the MEASURED winner at "
                             "monolithic frame shapes (~1.5x the packed trunk "
                             "at 1080p flagship: XLA stops fusing the packed "
                             "pairs' elementwise epilogues there; TILE8K_"
                             "flagship_v2.json, BASELINE.md round-4); 'packed' "
                             "= the batched-patch fast path; 'auto' picks "
                             "plain at >= the family-aware measured crossover "
                             "(ops/fastpath.plain_frame_crossover_px; full-"
                             "tile trunks like LarvaNet_w64 stay packed — "
                             "measured faster at every size).")
    args = parser.parse_args()

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.parallel.halo import spatial_sharded_forward
    from larvanet_tpu.parallel.mesh import make_mesh

    n = args.devices or len(jax.devices())
    n = min(n, len(jax.devices()))
    mesh = make_mesh((n,), ("spatial",), devices=jax.devices()[:n])
    print("mesh: %d spatial shards on %s" % (n, jax.devices()[0].platform))

    models = []
    for seed in range(max(1, args.ensemble)):
        m = get_model(args.model)
        m.parse_args(["--num_blocks", args.num_blocks])
        m.prepare(is_training=False, scales=[4], seed=seed)
        models.append(m)
    model = models[0]
    scale = 4

    if args.ensemble > 1:
        from larvanet_tpu.eval.ensemble import stack_params

        stacked = stack_params([m.params for m in models])

        def apply_fn(params, x):
            outs = jax.vmap(lambda p: model.module.apply({"params": p}, x))(params)
            return outs.mean(axis=0)

        params = stacked
    elif args.int8 and args.model.startswith("LarvaNet"):
        from larvanet_tpu.ops.packed_trunk import make_int8_larvanet_forward

        calib = np.random.default_rng(2).uniform(
            0, 255, (1, 128, 256, 3)).astype(np.float32)
        apply_fn = make_int8_larvanet_forward(model, calib)
        params = model.params
        print("int8 (W8A8) trunk enabled (not float-exact)")
    else:
        import jax.numpy as jnp

        from larvanet_tpu.ops.fastpath import (make_plain_forward,
                                               plain_frame_crossover_px)

        model.serving_dtype = args.serving_dtype  # packed + plain honor it
        crossover = plain_frame_crossover_px(model)
        use_plain = args.graph == "plain" or (
            args.graph == "auto" and crossover
            and args.height * args.width >= crossover)
        if use_plain:
            dtype = jnp.bfloat16 if args.serving_dtype == "bf16" else jnp.float32
            apply_fn = make_plain_forward(model, dtype)
            print("plain module graph (monolithic-frame winner, "
                  "BASELINE.md round-4)")
        else:
            apply_fn = model._forward_impl
        params = model.params

    if args.strips:
        # single-chip strip batching (eval/tiling.py); overrides the mesh
        # path — compose with --devices via per-shard strip counts if both
        # are ever needed (the mesh path alone covers multi-chip today).
        import jax.numpy as jnp

        from larvanet_tpu.eval.tiling import make_strip_batched_forward
        from larvanet_tpu.ops.fastpath import build_fast_forward

        dtype = jnp.bfloat16 if args.serving_dtype == "bf16" else jnp.float32
        if not (args.int8 or args.ensemble > 1):
            fast, desc = build_fast_forward(model, dtype)
            if fast is not None:
                apply_fn, params = fast, model.params
                print("strips fast path:", desc, args.serving_dtype)
        n = 1
        h = args.height - args.height % args.strips
        fwd = jax.jit(make_strip_batched_forward(
            apply_fn, scale, args.strips, args.strip_halo, h, args.width,
            chunk=args.strip_chunk))
        sharding = None
        print("strips: %d x (%d + 2*%d) rows" % (args.strips, h // args.strips,
                                                 args.strip_halo))
    elif n == 1:
        # no shard_map wrapper on one chip: it measurably slows the
        # monolithic forward (BASELINE.md round-4 notes tile8k_bench's
        # direct-jit numbers beating the old 8K-table rows for this
        # reason)
        fwd = jax.jit(apply_fn)
        sharding = None
        h = args.height
    else:
        fwd = spatial_sharded_forward(apply_fn, mesh, halo=args.halo, scale=scale,
                                      axis_name="spatial", spatial_axis=1)
        sharding = NamedSharding(mesh, P(None, "spatial", None, None))
        h = args.height - args.height % n  # shardable height
    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 255, (1, h, args.width, 3)).astype(np.float32)
    x = jax.device_put(frame, sharding) if sharding is not None else jax.device_put(frame)

    t0 = time.perf_counter()
    out = fwd(params, x)
    s = float(out[..., ::max(1, h // 4), ::max(1, args.width // 4), :].sum())  # fence
    compile_time = time.perf_counter() - t0
    print("first frame (incl compile): %.1fs, checksum %.3e" % (compile_time, s))

    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = fwd(params, x)
    float(out[..., :1, :1, :].sum())
    dt = (time.perf_counter() - t0) / iters
    mp = h * args.width / 1e6
    print("frame: %d x %d LR -> %d x %d HR | %.3fs/frame, %.2f LR-MP/s over %d shards%s"
          % (h, args.width, h * scale, args.width * scale, dt, mp / dt, n,
             ", ensemble=%d" % args.ensemble if args.ensemble > 1 else ""))


if __name__ == "__main__":
    main()
