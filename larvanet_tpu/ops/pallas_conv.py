"""Pallas TPU kernel: fused 3x3 conv + bias + activation.

Why a custom kernel: the SR zoo's convs are 64-channel 3x3s; measured
XLA efficiency on them is ~10% of v5e peak (BASELINE.md). This kernel
keeps the whole tap computation and epilogue (bias + activation) in one
VMEM-resident fusion, tiled over H, with two contraction strategies:

  * mode='dots'   — nine accumulated (M, C) x (C, F) matmuls, one per
                    spatial tap (lowest VMEM pressure);
  * mode='im2col' — the nine shifted views are concatenated in VMEM to
                    (M, 9C) and contracted in one (M, 576) x (576, F)
                    matmul, filling the 128-deep MXU K dimension 4.5x
                    instead of half-filling it nine times.

Implementation notes for Mosaic:
  * Overlapping input windows are fed via three row-shifted aliases of
    the SAME-padded input, each tiled disjointly by BlockSpec — manual
    HBM DMA of a (.., C=64) slice trips the 128-lane alignment rule
    ("Slice shape along dimension 3 must be aligned to tiling (128)").
  * Layout NHWC, kernel HWIO (3, 3, C, F), identical to the XLA path in
    models/layers.py; results match lax.conv to float tolerance.

Falls back to lax.conv on non-TPU backends.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_conv3x3(x, kernel, bias, act: Optional[str]):
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    out = out + bias
    if act == "relu":
        out = jax.nn.relu(out)
    elif act == "leaky_relu":
        out = jax.nn.leaky_relu(out, 0.1)
    return out


def _pick_tile_h(h: int, w: int, c: int, f: int, itemsize: int,
                 vmem_budget: int = 10 * 2 ** 20) -> int:
    for tile in (64, 32, 16, 8, 4, 2, 1):
        if tile > h:
            continue
        bytes_needed = (
            3 * tile * (w + 2) * c * itemsize  # three input row-windows
            + tile * w * 9 * c * itemsize      # im2col matrix (worst case)
            + tile * w * f * 4                 # f32 accumulator
        )
        if bytes_needed <= vmem_budget:
            return tile
    return 1


def conv3x3_bias_act_pallas(x, kernel, bias, act: Optional[str] = None,
                            mode: str = "im2col"):
    """Fused SAME 3x3 conv + bias + activation on TPU via Pallas.

    x: (N, H, W, C) f32/bf16; kernel: (3, 3, C, F) HWIO; bias: (F,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    f = kernel.shape[-1]
    tile_h = _pick_tile_h(h, w, c, f, x.dtype.itemsize)
    grid_h = -(-h // tile_h)
    rows = grid_h * tile_h

    kmat = kernel.reshape(9 * c, f).astype(x.dtype)
    bias = bias.astype(jnp.float32)

    # SAME halo + bottom alignment, then three row-shifted aliases so each
    # grid step's three dy-windows are disjoint BlockSpec tiles.
    xp = jnp.pad(x, ((0, 0), (1, 1 + (rows - h)), (1, 1), (0, 0)))
    shifted = [jax.lax.slice_in_dim(xp, dy, dy + rows, axis=1) for dy in range(3)]

    def kern(x0_ref, x1_ref, x2_ref, k_ref, b_ref, out_ref):
        views = (x0_ref[0], x1_ref[0], x2_ref[0])  # each (tile_h, w+2, c)
        if mode == "im2col":
            patches = []
            for dy in range(3):
                for dx in range(3):
                    sl = views[dy][:, dx : dx + w, :]
                    patches.append(sl.reshape(tile_h * w, c))
            pmat = jnp.concatenate(patches, axis=1)  # (tile_h*w, 9c)
            acc = jnp.dot(pmat, k_ref[...], preferred_element_type=jnp.float32)
        else:  # 'dots'
            acc = jnp.zeros((tile_h * w, f), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    sl = views[dy][:, dx : dx + w, :].reshape(tile_h * w, c)
                    kslice = k_ref[pl.ds((dy * 3 + dx) * c, c), :]
                    acc = acc + jnp.dot(sl, kslice, preferred_element_type=jnp.float32)
        acc = acc + b_ref[...]
        if act == "relu":
            acc = jnp.maximum(acc, 0.0)
        elif act == "leaky_relu":
            acc = jnp.where(acc >= 0, acc, acc * 0.1)
        out_ref[...] = acc.reshape(1, tile_h, w, f).astype(out_ref.dtype)

    x_spec = pl.BlockSpec(
        (1, tile_h, w + 2, c), lambda ni, hi: (ni, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(n, grid_h),
        in_specs=[
            x_spec, x_spec, x_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, f), lambda ni, hi: (ni, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, rows, w, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * f,
            bytes_accessed=(n * h * w * (3 * c + f) + 9 * c * f) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*shifted, kmat, bias)
    return out[:, :h] if rows != h else out


def conv3x3_bias_act(x, kernel, bias, act: Optional[str] = None, use_pallas: bool = True):
    """Dispatch: Pallas on TPU (flag-gated), XLA elsewhere."""
    if use_pallas and jax.default_backend() == "tpu":
        return conv3x3_bias_act_pallas(x, kernel, bias, act)
    return _xla_conv3x3(x, kernel, bias, act)
