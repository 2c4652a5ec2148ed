"""Single-ResBlock kernel anatomy for the Winograd negative result
(VERDICT r2 #2 rigor: "trace-backed" — Mosaic kernels are opaque to the
xplane trace, so the attribution instrument is VARIANT TIMING: the same
grid/BlockSpec/DMA structure with parts of the kernel body swapped out).

Variants (one grid0 ResBlock, bench geometry 16x192x96x128 bf16):
  packed    — the shipped XLA packed_resblock (the 1.33x-floor baseline)
  wino2     — the real fused F(2,3) kernel (ops/wino_pallas.py)
  wino4     — the real fused F(4,3) kernel
  wino2_nr  — F(2,3) with NO misaligned reshapes: 3-D einsum point
              matmuls at full padded width, shifted adds after (tests
              the hypothesis that Mosaic relayouts for the
              (P,97,128)->(582,128) reshapes + offset-1 sublane slices
              dominate the runtime)
  skel_mm   — same pallas_call shell, body = the 16 point matmuls on
              ALIGNED shapes only (no transforms/slices/masks): the
              MXU + pipeline floor of this grid structure
  skel_dma  — body = copy-through (out = x tile): pure DMA/grid floor

Timing: chained-fori differenced (bench.py methodology). Run:
  python -m tools.wino_diag [--variants ...] [--tile_rows N]
Writes WINO_DIAG.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time


def _timed(forward, x, iters, base_iters, repeats):
    import jax
    import jax.numpy as jnp

    dtype = x.dtype

    def chained(xx, n):
        def body(i, acc):
            xi = jnp.maximum(
                xx, (acc * jnp.float32(1e-35)).astype(dtype)
                - jnp.asarray(3e4, dtype))
            out = forward(xi)
            return acc + jnp.mean(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run = jax.jit(chained, static_argnums=(1,))
    float(run(x, base_iters))
    float(run(x, iters))

    def t(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(iters) - t(base_iters)) / (iters - base_iters)
    return max(per, 1e-9)


def _skeleton_kernels(tile_rows, w2, c2, n_dots, aligned_m):
    """pallas_call shells matching wino_packed_resblock's grid/specs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def mm_body(a0_ref, a6_ref, u_ref, out_ref):
        tr = tile_rows
        xw = a0_ref[0]
        lhs = xw.reshape(tr * w2, c2)[:aligned_m].astype(u_ref.dtype)
        acc = jnp.zeros((aligned_m, c2), jnp.float32)
        for i in range(n_dots):
            acc = acc + jnp.dot(lhs, u_ref[i % u_ref.shape[0]],
                                preferred_element_type=jnp.float32)
        out_ref[...] = (xw + acc.reshape(tr, w2, c2)[:tr]
                        .astype(xw.dtype))[None]

    def dma_body(a0_ref, a6_ref, u_ref, out_ref):
        out_ref[...] = a0_ref[...] + jnp.asarray(1, a0_ref.dtype)

    return mm_body, dma_body


def _make_skeleton(body_kind, x, u, tile_rows, n_dots):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w2, c2 = x.shape
    tr = tile_rows
    grid_h = -(-h // tr)
    rows = grid_h * tr
    aligned_m = tr * w2
    mm_body, dma_body = _skeleton_kernels(tr, w2, c2, n_dots, aligned_m)
    body = mm_body if body_kind == "mm" else dma_body

    x_spec = pl.BlockSpec((1, tr, w2, c2), lambda ni, hi: (ni, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def forward(xx):
        xp = jnp.pad(xx, ((0, 0), (0, rows - h), (0, 0), (0, 0)))
        out = pl.pallas_call(
            body,
            grid=(n, grid_h),
            in_specs=[x_spec, x_spec, full],
            out_specs=pl.BlockSpec((1, tr, w2, c2),
                                   lambda ni, hi: (ni, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, rows, w2, c2), xx.dtype),
        )(xp, xp, u)
        return out[:, :h]

    return forward


# ---------------------------------------------------------------------------
# wino2_nr: reshape-free F(2,3) variant (3-D einsum, shift-after-matmul)

def _stage_nr(xe, xo, u, bias, w_out):
    import jax.numpy as jnp

    mm = u.dtype
    # _bt on rows (xe[p], xo[p], xe[p+1], xo[p+1]) = (d0, d1, d2, d3)
    v = (xe[:-1] - xe[1:], xo[:-1] + xe[1:], xe[1:] - xo[:-1],
         xo[:-1] - xo[1:])
    ms = []
    for b in range(4):
        vb = v[b].astype(mm)
        y0 = jnp.einsum("pwc,cd->pwd", vb, u[b, 0],
                        preferred_element_type=jnp.float32)
        y1 = jnp.einsum("pwc,cd->pwd", vb, u[b, 1],
                        preferred_element_type=jnp.float32)
        ms.append(y0[:, :w_out] + y1[:, 1:1 + w_out])
    t_even = ms[0] + ms[1] + ms[2]
    t_odd = ms[1] - ms[2] - ms[3]
    if bias is not None:
        t_even = t_even + bias
        t_odd = t_odd + bias
    return t_even, t_odd


def _nr_kernel(a0_ref, a6_ref, ua_ref, ub_ref, ba_ref, bb_ref, mask_ref,
               out_ref, *, tile_rows, w2, c2, res_weight, h_real):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    tr = tile_rows
    xw = jnp.concatenate([a0_ref[0], a6_ref[0][tr - 6:]], axis=0)
    xw = xw.astype(jnp.float32)

    xa = jnp.pad(xw, ((0, 0), (1, 1), (0, 0)))
    half = (tr + 6) // 2
    xa = xa.reshape(half, 2, w2 + 2, c2)
    xe, xo = xa[:, 0], xa[:, 1]
    t_even, t_odd = _stage_nr(xe, xo, ua_ref[...], ba_ref[...], w2 + 1)

    mask = mask_ref[...]
    t_even = jnp.maximum(t_even, 0.0) * mask
    t_odd = jnp.maximum(t_odd, 0.0) * mask
    r0 = pl.program_id(1) * tr
    pidx = jax.lax.broadcasted_iota(jnp.int32, (half - 1, 1, 1), 0)
    ge = r0 - 2 + 2 * pidx
    t_even = t_even * ((ge >= 0) & (ge < h_real)).astype(jnp.float32)
    t_odd = t_odd * ((ge + 1 >= 0) & (ge + 1 < h_real)).astype(jnp.float32)

    y_even, y_odd = _stage_nr(t_odd[:-1], t_even[1:], ub_ref[...],
                              bb_ref[...], w2)
    y = jnp.stack([y_even, y_odd], axis=1).reshape(tr, w2, c2)
    if res_weight != 1.0:
        y = y * jnp.float32(res_weight)
    out_ref[...] = (xw[3:3 + tr] + y)[None].astype(out_ref.dtype)


def _make_nr(x, ka, ba, kb, bb, mask1, tile_rows):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from larvanet_tpu.ops.wino_pallas import h_transform_kernel

    n, h, w2, c2 = x.shape
    tr = tile_rows
    grid_h = -(-h // tr)
    rows = grid_h * tr
    mm = x.dtype
    ua = h_transform_kernel(ka).astype(mm)
    ub = h_transform_kernel(kb).astype(mm)
    ba = jnp.asarray(ba, jnp.float32)
    bb = jnp.asarray(bb, jnp.float32)
    mask = jnp.asarray(mask1, jnp.float32).reshape(w2 + 1, c2)
    x_spec = pl.BlockSpec((1, tr, w2, c2), lambda ni, hi: (ni, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kern = functools.partial(_nr_kernel, tile_rows=tr, w2=w2, c2=c2,
                             res_weight=1.0, h_real=h)

    def forward(xx):
        xp = jnp.pad(xx, ((0, 0), (3, 3 + rows - h), (0, 0), (0, 0)))
        a0 = jax.lax.slice_in_dim(xp, 0, rows, axis=1)
        a6 = jax.lax.slice_in_dim(xp, 6, 6 + rows, axis=1)
        out = pl.pallas_call(
            kern, grid=(n, grid_h),
            in_specs=[x_spec, x_spec, full, full, full, full, full],
            out_specs=pl.BlockSpec((1, tr, w2, c2),
                                   lambda ni, hi: (ni, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, rows, w2, c2), xx.dtype),
        )(a0, a6, ua, ub, ba, bb, mask)
        return out[:, :h]

    return forward


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tile", type=int, default=192)
    parser.add_argument("--features", type=int, default=64)
    parser.add_argument("--iters", type=int, default=64)
    parser.add_argument("--base_iters", type=int, default=16)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--tile_rows", type=int, default=8)
    parser.add_argument("--variants",
                        default="packed,wino2,wino4,wino2_nr,skel_mm,skel_dma")
    parser.add_argument("--out", default="WINO_DIAG.json")
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    import larvanet_tpu.cli.common  # noqa: F401  (compile cache)
    from larvanet_tpu.ops.packed.core import (
        grid1_mask, pack_bias, pack_kernel_a, pack_kernel_b, packed_resblock)
    from larvanet_tpu.ops.wino_pallas import (
        wino4_packed_resblock, wino_packed_resblock)

    c = args.features
    c2 = 2 * c
    w2 = args.tile // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 30, (args.batch, args.tile, w2, c2)),
                    jnp.bfloat16)
    k1 = rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
    k2 = rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (c,)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (c,)).astype(np.float32)
    ka, kb = pack_kernel_a(k1), pack_kernel_b(k2)
    ba, bb = pack_bias(b1), pack_bias(b2)
    mask = grid1_mask(w2 + 1, c)  # grid1 width is W2+1

    u_skel = jnp.asarray(rng.normal(0, 0.05, (8, c2, c2)), jnp.bfloat16)
    tr = args.tile_rows

    builders = {
        "packed": lambda: (lambda xx: packed_resblock(
            xx, ka.astype(jnp.bfloat16), ba.astype(jnp.bfloat16),
            kb.astype(jnp.bfloat16), bb.astype(jnp.bfloat16),
            mask.astype(jnp.bfloat16))),
        "wino2": lambda: (lambda xx: wino_packed_resblock(
            xx, ka, ba, kb, bb, mask, tile_rows=tr)),
        "wino4": lambda: (lambda xx: wino4_packed_resblock(
            xx, ka, ba, kb, bb, mask, tile_rows=max(16, tr))),
        "wino2_nr": lambda: _make_nr(x, ka, ba, kb, bb, mask, tr),
        "skel_mm": lambda: _make_skeleton("mm", x, u_skel, tr, 16),
        "skel_dma": lambda: _make_skeleton("dma", x, u_skel, tr, 0),
    }

    report = {"geometry": {"batch": args.batch, "tile": args.tile,
                           "features": c, "tile_rows": tr},
              "variants": {}}
    base = None
    for name in args.variants.split(","):
        name = name.strip()
        try:
            fwd = builders[name]()
            per = _timed(jax.jit(fwd), x, args.iters, args.base_iters,
                         args.repeats)
            entry = {"s_per_iter": round(per, 7),
                     "us_per_iter": round(per * 1e6, 1)}
            if name == "packed":
                base = per
            if base:
                entry["x_vs_packed"] = round(per / base, 2)
            print("%-9s %9.1f us/iter%s" % (
                name, per * 1e6,
                "  (%.2fx packed)" % (per / base) if base else ""))
        except Exception as exc:
            entry = {"error": "%s: %s" % (type(exc).__name__, exc)}
            print("%-9s FAILED: %s" % (name, entry["error"]),
                  file=sys.stderr)
        report["variants"][name] = entry

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote %s" % args.out)
    return report


if __name__ == "__main__":
    main()
