"""Integer-factor image upsampling with exact PyTorch semantics.

The reference's models add an interpolated "base" image to the network
output (``F.interpolate(x, scale_factor=4, mode='bicubic'/'bilinear',
align_corners=False)``, reference models/LarvaNet.py:283-285,
models/msrr.py:246-247). Holding the 0.02 dB PSNR budget requires
bit-level agreement with PyTorch's resampler, which `jax.image.resize`
does not provide (different cubic kernel: Keys A=-0.5 vs torch A=-0.75,
and different boundary handling).

This module reimplements the resampler TPU-natively: for an integer
upscale factor ``s`` with ``align_corners=False``, every output pixel's
source coordinate is ``(o + 0.5)/s - 0.5``, so the fractional offset
depends only on the phase ``p = o mod s``. Each phase is then a fixed
K-tap weighted sum of *shifted copies* of the input — implemented as K
static slices of an edge-padded array per phase (no gathers, fully
fusible by XLA, TPU-friendly static shapes).

Edge handling: PyTorch clamps out-of-range tap indices (bicubic) and
clamps the source coordinate at zero (bilinear). Both are exactly
reproduced by edge-replication padding of width K/2, because clamped
taps only ever reach <= 2 pixels past the border (verified in tests
against torch.nn.functional.interpolate).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weight_near(t: np.ndarray, a: float) -> np.ndarray:
    # |x| <= 1 branch of the cubic convolution kernel.
    return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0


def _cubic_weight_far(t: np.ndarray, a: float) -> np.ndarray:
    # 1 < |x| < 2 branch.
    return (((a * t - 5.0 * a) * t) + 8.0 * a) * t - 4.0 * a


def bicubic_weights(scale: int, a: float = -0.75) -> Tuple[np.ndarray, np.ndarray]:
    """Per-phase 4-tap cubic weights and base offsets for upscale `scale`.

    Returns (weights [scale, 4] float32, base [scale] int64) where output
    phase p reads input indices base[p] + {0,1,2,3} - 1 relative to the
    containing input pixel.
    """
    p = np.arange(scale, dtype=np.float64)
    src = (p + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)
    f = src - base
    w = np.stack(
        [
            _cubic_weight_far(f + 1.0, a),
            _cubic_weight_near(f, a),
            _cubic_weight_near(1.0 - f, a),
            _cubic_weight_far(2.0 - f, a),
        ],
        axis=1,
    )
    return w.astype(np.float32), base


def bilinear_weights(scale: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-phase 2-tap linear weights and base offsets."""
    p = np.arange(scale, dtype=np.float64)
    src = (p + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)
    f = src - base
    w = np.stack([1.0 - f, f], axis=1)
    return w.astype(np.float32), base


def _upsample_axis(
    x: jax.Array,
    scale: int,
    axis: int,
    weights: np.ndarray,
    base: np.ndarray,
    offsets: np.ndarray,
) -> jax.Array:
    """Upsample one axis by `scale` using per-phase tap weights.

    Output phase p at block i reads input indices i + base[p] + offsets[t],
    weighted by weights[p, t]. Out-of-range taps hit the edge-replicated
    padding, matching torch's index clamping.
    """
    if scale == 1:
        return x
    k = weights.shape[1]
    pad = int(max(-offsets.min() - base.min(), offsets.max() + base.max()))
    pad = max(pad, 1)
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode="edge")
    n = x.shape[axis]

    phases = []
    for p in range(scale):
        acc = None
        for t in range(k):
            start = int(base[p]) + int(offsets[t]) + pad
            sl = jax.lax.slice_in_dim(xp, start, start + n, axis=axis)
            term = sl * weights[p, t]
            acc = term if acc is None else acc + term
        phases.append(acc)
    # Interleave phases: stack on a new axis right after `axis`, then merge.
    stacked = jnp.stack(phases, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = n * scale
    return stacked.reshape(new_shape)


@functools.partial(jax.jit, static_argnames=("scale", "method", "axes"))
def upsample(x: jax.Array, scale: int, method: str = "bicubic", axes: Tuple[int, int] = (-3, -2)) -> jax.Array:
    """Upsample spatial `axes` of `x` by integer `scale`.

    Exactly matches ``torch.nn.functional.interpolate(x, scale_factor=scale,
    mode=method, align_corners=False)`` for method in {'bicubic',
    'bilinear'}; 'nearest' is floor-index nearest like torch's default.
    Default axes are (-3, -2), i.e. H and W of an NHWC array.
    """
    axes = tuple(ax % x.ndim for ax in axes)
    if method == "bicubic":
        w, b = bicubic_weights(scale)
        offsets = np.array([-1, 0, 1, 2])
    elif method == "bilinear":
        w, b = bilinear_weights(scale)
        offsets = np.array([0, 1])
    elif method == "nearest":
        # torch 'nearest': src = floor(o / s); for integer upscale each
        # input pixel repeats s times.
        out = x
        for ax in axes:
            out = jnp.repeat(out, scale, axis=ax)
        return out
    else:
        raise ValueError("unsupported interpolation method: %r" % (method,))
    out = x
    for ax in axes:
        out = _upsample_axis(out, scale, ax, w, b, offsets)
    return out
