"""Full-frame vs strip-batched full-frame inference on the v5e.

BASELINE.md's round-4 8K table showed the flagship running ~6x slower
per pixel at full frame (3.64 LR-MP/s) than in batched-patch serving
(22 MP/s bf16): full-frame activations blow past the working-set sizes
the packed kernels were tuned on. eval/tiling.make_strip_batched_forward
restores patch-like working sets on ONE device (the halo.py window
scheme over a batch axis instead of a mesh axis). This tool measures:

  * full-frame forward at f32 (the old 8K-demo configuration) and bf16
  * strip-batched forwards at a (n_strips, halo) grid, bf16 and int8
  * the halo-approximation cost in dB against the full-frame graph of
    the SAME dtype, on a natural-statistics mosaic frame (and a trained
    checkpoint when --restore_path is given) — halo < receptive radius
    is the standard tiled-SR boundary approximation; this quantifies it

Timing follows tools/stream_8k_demo.py (queued iterations fenced by a
scalar readback — naive per-call timing lies on this tunnel).

Run from the repo root:

    python -m tools.tile8k_bench --restore_path runs/recipe_larva/...ckpt
    python -m tools.tile8k_bench --model LarvaNet_w64 --num_blocks 9,9
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon TPU plugin ignores JAX_PLATFORMS; honor it via jax.config
# (same handling as tools/stream_8k_demo.py)
_requested = os.environ.get("JAX_PLATFORMS")
if _requested:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _requested)
    except Exception:
        pass

import numpy as np


def natural_frame(height: int, width: int, root: str = "data/fixture_real/test_HR"):
    """Mosaic fixture_real HR images into an (H, W, 3) float32 canvas —
    natural statistics for the halo-approximation measurement. Falls
    back to uniform noise when the fixture is absent."""
    paths = sorted(glob.glob(os.path.join(root, "**", "*.png"), recursive=True))
    if not paths:
        return np.random.default_rng(0).uniform(
            0, 255, (height, width, 3)).astype(np.float32)
    from PIL import Image

    canvas = np.zeros((height, width, 3), np.float32)
    y = 0
    k = 0
    while y < height:
        x = 0
        row_h = 0
        while x < width:
            im = np.asarray(Image.open(paths[k % len(paths)]).convert("RGB"),
                            np.float32)
            k += 1
            h = min(im.shape[0], height - y)
            w = min(im.shape[1], width - x)
            canvas[y:y + h, x:x + w] = im[:h, :w]
            x += w
            row_h = max(row_h, h)
        y += row_h
    return canvas


def build_forward(model, kind, dtype_name, calib):
    """(forward, desc, params) for one arm."""
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.ops.fastpath import build_fast_forward

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
             "int8": jnp.bfloat16}[dtype_name]
    if kind in ("plain", "ptiles"):
        # the UNPACKED module graph: at monolithic full-frame shapes XLA
        # refuses to fuse the packed trunk's mask/add/relu epilogues
        # (each becomes a ~200 MB memory pass — BASELINE.md round-4
        # full-frame anatomy), so plain measures FASTER there
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                        model.params)
        fwd = (lambda p, x: model.module.apply(
            {"params": p}, x.astype(dtype)))
        return fwd, "plain module graph (%s params)" % dtype_name, params
    fwd, desc = build_fast_forward(
        model, dtype, int8_trunk=(dtype_name == "int8"),
        calib=(calib if dtype_name == "int8" else None))
    if fwd is None:
        fwd, desc = model._forward_impl, "plain module graph"
    return fwd, desc, model.params


def time_forward(fwd_jit, params, x, iters):
    import jax

    t0 = time.perf_counter()
    out = fwd_jit(params, x)
    # scalar fence: force real completion through the tunnel
    float(jax.numpy.asarray(out)[..., ::271, ::509, :].astype("float32").sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd_jit(params, x)
    float(jax.numpy.asarray(out)[..., :1, :1, :].astype("float32").sum())
    per_frame = (time.perf_counter() - t0) / iters
    return compile_s, per_frame, out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="LarvaNet")
    parser.add_argument("--num_blocks", default="16,16")
    parser.add_argument("--restore_path", default="")
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument(
        "--arms",
        default="full:f32,full:bf16,strips:bf16:8:32,strips:bf16:8:64,"
                "strips:bf16:8:32:2,strips:bf16:4:64,strips:int8:8:32",
        help="comma list: full:DTYPE | plain:DTYPE (unpacked module "
             "graph) | strips:DTYPE:N:HALO[:CHUNK] | "
             "tiles:DTYPE:TH:TW:HALO (2-D tile scan over the packed "
             "forward) | ptiles:DTYPE:TH:TW:HALO (over the plain graph) "
             "(DTYPE in f32|bf16|int8; CHUNK strips per scan step, "
             "default 1)")
    parser.add_argument("--out", default="TILE8K.json")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from larvanet_tpu.cli.common import enable_compile_cache
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.eval.tiling import (make_strip_batched_forward,
                                          make_tile_scan_forward)

    enable_compile_cache()
    model = get_model(args.model)
    model.parse_args(["--num_blocks", args.num_blocks])
    model.prepare(is_training=False, scales=[4])
    if args.restore_path:
        model.restore(ckpt_path=args.restore_path)
        print("restored", args.restore_path)
    scale = 4

    frame = natural_frame(args.height, args.width)[None]
    x = jax.device_put(frame)
    calib = frame[:, :128, :256]  # natural-statistics calibration crop

    report = {
        "model": args.model, "num_blocks": args.num_blocks,
        "restore_path": args.restore_path,
        "frame": [args.height, args.width], "scale": scale,
        "platform": jax.devices()[0].platform,
        "arms": {},
    }
    mp = args.height * args.width / 1e6
    full_outs = {}

    for arm in args.arms.split(","):
        parts = arm.strip().split(":")
        kind, dtype_name = parts[0], parts[1]
        fwd, desc, params = build_forward(model, kind, dtype_name, calib)
        label = arm.strip()
        if kind == "strips":
            n, halo = int(parts[2]), int(parts[3])
            chunk = int(parts[4]) if len(parts) > 4 else 1
            fwd = make_strip_batched_forward(
                fwd, scale, n, halo, args.height, args.width, chunk=chunk)
        elif kind in ("tiles", "ptiles"):
            th, tw, halo = int(parts[2]), int(parts[3]), int(parts[4])
            fwd = make_tile_scan_forward(
                fwd, scale, th, tw, halo, args.height, args.width)
        try:
            compile_s, per_frame, out = time_forward(
                jax.jit(fwd), params, x, args.iters)
        except Exception as e:  # record, keep measuring other arms
            report["arms"][label] = {"error": "%s: %s" % (type(e).__name__, e)}
            print(label, "ERROR", e)
            continue
        entry = {
            "desc": desc, "compile_s": round(compile_s, 2),
            "s_per_frame": round(per_frame, 4),
            "lr_mp_s": round(mp / per_frame, 3),
            "fps": round(1.0 / per_frame, 2),
        }
        if kind == "full":
            full_outs[dtype_name] = out
        ref_key = dtype_name if dtype_name in full_outs else "bf16"
        if kind != "full" and ref_key in full_outs:
            a = out.astype(jnp.float32)
            b = full_outs[ref_key].astype(jnp.float32)
            mse = float(jnp.mean((a - b) ** 2))
            entry["psnr_vs_fullframe_dB"] = (
                round(10 * np.log10(255.0 ** 2 / mse), 3) if mse > 0
                else float("inf"))
            entry["max_abs_delta"] = float(jnp.max(jnp.abs(a - b)))
        report["arms"][label] = entry
        print(label, entry)

    if "f32" in full_outs and "bf16" in full_outs:
        a = full_outs["bf16"].astype(jnp.float32)
        b = full_outs["f32"]
        mse = float(jnp.mean((a - b) ** 2))
        report["bf16_vs_f32_fullframe_psnr_dB"] = round(
            10 * np.log10(255.0 ** 2 / mse), 3)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
