"""PixelShuffle (depth-to-space) with PyTorch channel semantics, NHWC.

The reference uses ``nn.PixelShuffle(r)`` after a conv that produces
``C*r*r`` channels (reference models/edsr.py:156-173,
models/LarvaNet.py:261). PyTorch's NCHW shuffle interprets the channel
axis as (C, r, r):

    out[n, c, h*r + i, w*r + j] = x[n, c*r*r + i*r + j, h, w]

A naive NHWC ``depth_to_space`` uses (r, r, C) ordering instead, which
silently permutes channels when porting weights. We keep the torch
ordering so that (a) converted ``.pth`` checkpoints line up without
re-permuting conv kernels and (b) param-count/shape parity tests match
the reference layer-for-layer.
"""

from __future__ import annotations

import jax


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle: [N,H,W,C*r*r] -> [N,H*r,W*r,C], torch channel order."""
    n, h, w, crr = x.shape
    if crr % (r * r) != 0:
        raise ValueError("channels %d not divisible by r^2=%d" % (crr, r * r))
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Inverse of `pixel_shuffle`: [N,H*r,W*r,C] -> [N,H,W,C*r*r]."""
    n, hr, wr, c = x.shape
    if hr % r or wr % r:
        raise ValueError("spatial dims (%d,%d) not divisible by r=%d" % (hr, wr, r))
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, i, j
    return x.reshape(n, h, w, c * r * r)
