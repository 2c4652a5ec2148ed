"""Exact collapse of linear upsample tails into a single conv + shuffle.

EDSR's tail — upsample conv(64->256) -> PixelShuffle(2) -> conv(64->256)
-> PixelShuffle(2) -> final conv(64->3) -> inverse mean-shift
(reference models/edsr.py:195-207) — contains NO nonlinearity, so the
whole chain is one linear, shift-invariant map from trunk features to
the HR image. Device traces show the PixelShuffle transposes around the
256-channel 2x/4x tensors cost ~46% of forward time (BASELINE.md); the
tail also spends 1.53 MFLOPs/LR-px where the composed map needs only
0.15.

This module collapses the chain *numerically*: the composed kernel is
extracted by probing the original tail with per-channel delta images
(64 forwards on a tiny canvas, once), giving an exact
(2R+1, 2R+1, C, 3*s*s) conv whose output pixel-shuffles (torch order)
to the HR image. Biases/mean-shifts are captured as the tail's response
to a zero input — an image-sized field that also reproduces the
reference's border truncation exactly, so the collapsed forward is
bit-equivalent (float tolerance) to the original INCLUDING borders.

Interior exactness follows from linearity + shift invariance; within
`radius` LR px of the border the stages' SAME padding cuts paths whose
endpoint taps are in-bounds, so the border frame is recomputed with the
original tail on thin halo strips (exact — a strip's outer edge IS the
image border). Collapsing linear conv compositions at inference is an
established SR trick (cf. "Collapsible Linear Blocks for Super-Efficient
Super Resolution", arXiv:2103.09404); the device-trace-driven motivation
and the exact border stitching here are specific to this TPU build.

Measured on v5e: EDSR-b x4 forward 12.0 -> 19.4 LR-MP/s (BASELINE.md);
device-time copies drop from 46% to ~23% (the rest is the final 48-ch
shuffle, whose data volume is the output image itself).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle


def extract_collapsed_kernel(
    tail_fn: Callable[[jnp.ndarray], jnp.ndarray],
    in_channels: int,
    scale: int,
    radius: int,
) -> np.ndarray:
    """Probe a linear tail with delta inputs to obtain the composed kernel.

    tail_fn: (1, H, W, C) LR features -> (1, H*s, W*s, 3) HR image.
    Returns kernel (2R+1, 2R+1, C, 3*s*s) with torch-PixelShuffle output
    channel order (c*s*s + i*s + j), suitable for SAME conv + pixel_shuffle.
    """
    k = 2 * radius + 1
    canvas = 4 * radius + 2  # delta centered, responses fully interior
    center = canvas // 2
    zero = jnp.zeros((1, canvas, canvas, in_channels), jnp.float32)
    bias_resp = np.asarray(tail_fn(zero))

    kernel = np.zeros((k, k, in_channels, 3 * scale * scale), np.float32)
    probe = jax.jit(tail_fn)
    for cin in range(in_channels):
        x = zero.at[0, center, center, cin].set(1.0)
        resp = np.asarray(probe(x)) - bias_resp  # remove bias field
        # out[s*(center-U)+i, s*(center-V)+j, c] = K[U, V, cin, (c,i,j)]
        for u in range(-radius, radius + 1):
            for v in range(-radius, radius + 1):
                block = resp[0,
                             scale * (center - u): scale * (center - u + 1),
                             scale * (center - v): scale * (center - v + 1), :]
                # block[i, j, c] -> channel c*s*s + i*s + j
                kernel[u + radius, v + radius, cin, :] = (
                    block.transpose(2, 0, 1).reshape(-1)
                )
    return kernel


def make_collapsed_tail(
    tail_fn: Callable[[jnp.ndarray], jnp.ndarray],
    in_channels: int,
    scale: int,
    radius: int,
):
    """Return fast_tail(h_lr) exactly equal to tail_fn, as one conv + shuffle.

    The bias field (which encodes all stage biases, mean shifts, and their
    border truncation) is computed lazily per input shape and cached.
    """
    kernel_np = extract_collapsed_kernel(tail_fn, in_channels, scale, radius)
    # trim all-zero outer rings (the probe radius is a safe upper bound)
    while kernel_np.shape[0] > 1 and not (
        np.any(kernel_np[0]) or np.any(kernel_np[-1])
        or np.any(kernel_np[:, 0]) or np.any(kernel_np[:, -1])
    ):
        kernel_np = kernel_np[1:-1, 1:-1]
    kernel = jnp.asarray(kernel_np)
    bias_cache = {}
    r = kernel_np.shape[0] // 2  # effective radius after trimming

    def fast_tail(h):
        """Collapsed conv for the interior + original tail stitched onto a
        (radius)-wide border frame.

        The collapse is exact only where every intermediate tap of the
        original chain is in-bounds; within `r` LR px of the border, the
        original stages' SAME padding cuts paths whose endpoint taps are
        still in-bounds, so those rows/cols are recomputed with the
        original tail on thin halo strips (strip outer edge == true
        border => identical padding; inner halo of `r` isolates it)."""
        shape = (h.shape[1], h.shape[2])
        if shape not in bias_cache:
            # concrete (non-tracer) even when fast_tail is being traced
            with jax.ensure_compile_time_eval():
                zero = jnp.zeros((1, shape[0], shape[1], in_channels), jnp.float32)
                bias_cache[shape] = np.asarray(tail_fn(zero))
        out = jax.lax.conv_general_dilated(
            h, kernel.astype(h.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = pixel_shuffle(out, scale)
        out = out + jnp.asarray(bias_cache[shape], out.dtype)

        hh, ww = shape
        b = min(r, hh, ww)  # border band width (LR px)
        halo = min(2 * r, hh - b, ww - b)
        if b <= 0:
            return out
        strip = b + max(halo, 0)
        s = scale

        def run(strip_h):
            return tail_fn(strip_h.astype(jnp.float32)).astype(out.dtype)

        top = run(h[:, :strip, :, :])[:, : b * s]
        bot = run(h[:, hh - strip :, :, :])[:, -b * s :]
        left = run(h[:, :, :strip, :])[:, :, : b * s]
        right = run(h[:, :, ww - strip :, :])[:, :, -b * s :]
        out = out.at[:, : b * s].set(top)
        out = out.at[:, -b * s :].set(bot)
        out = out.at[:, :, : b * s].set(left)
        out = out.at[:, :, -b * s :].set(right)
        return out

    return fast_tail


def make_collapsed_edsr_forward(model, dtype=jnp.float32):
    """Inference-optimized EDSR forward: trunk unchanged, tail collapsed.

    Returns fn(params, x_nhwc) -> y_nhwc, exactly equal to
    model.module.apply (float tolerance), typically ~1.5-2.5x faster on
    TPU for x4 (tail FLOPs 1.53 -> 0.15 MF/LR-px; no 256-channel
    transposes). Only valid for models whose post-trunk chain is linear
    (EDSR/MAMNet-style upsample + final conv + mean shift).
    """
    from flax import serialization

    scale = model.scale
    p = serialization.to_state_dict(model.params)
    features = p["first_conv"]["kernel"].shape[-1]

    def tail_fn(h):
        # original tail on f32 for extraction: upsample -> final conv -> -mean
        from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

        def conv(x, w, b):
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(w, jnp.float32), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, jnp.float32)

        up = p["upsample"]
        i = 0
        out = h
        while ("conv%d" % i) in up:
            stage = up["conv%d" % i]
            out = conv(out, stage["kernel"], stage["bias"])
            out = pixel_shuffle(out, 2 if scale != 3 else 3)
            i += 1
        out = conv(out, p["final_conv"]["kernel"], p["final_conv"]["bias"])
        return out - jnp.asarray(DIV2K_RGB_MEAN, jnp.float32)

    # tap radius: +1 LR per conv stage in the chain (see module docstring)
    n_stages = len([k for k in p["upsample"] if k.startswith("conv")])
    radius = 1 + n_stages  # final conv contributes <=1 LR, stages 1 each
    fast_tail = make_collapsed_tail(tail_fn, features, scale, radius)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, w.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dtype)

        from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

        h = x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h = conv(h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"])
        res = h
        res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))
        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            r = conv(res, blk["conv1"]["kernel"], blk["conv1"]["bias"])
            r = jax.nn.relu(r)
            r = conv(r, blk["conv2"]["kernel"], blk["conv2"]["bias"])
            if res_weight != 1.0:
                r = r * res_weight
            res = res + r
            i += 1
        res = conv(res, sp["after_res_conv"]["kernel"], sp["after_res_conv"]["bias"])
        h = h + res
        return fast_tail(h)

    return forward
