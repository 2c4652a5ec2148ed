"""Exact width-packed trunk: 3x3/C convs as 3x2/2C convs at half width.

Motivation (BASELINE.md conv microbenchmark): XLA's 3x3 conv at the SR
trunk width C=64 sustains only ~71 TF/s on v5e — the MXU's 128-wide
output tiling is half empty (N=64) and so is every 128-lane vector
register. Packing PAIRS OF IMAGE COLUMNS into channels fixes both:
(N,H,W,C) -> (N,H,W/2,2C) is a FREE row-major reshape in NHWC, and the
3x3 conv becomes a 3x2 conv with 2C=128 in/out channels, measured at
190 TF/s raw (97% of bf16 peak) — 2.0x faster per conv even though the
packed kernel is 25% structural zeros (1.33x raw FLOPs).

The trick that makes whole trunks run packed with ZERO layout ops
between convs: a 3x2 packed conv maps between two column groupings —
  grid0: blocks (2j, 2j+1)          width W/2     (the free reshape)
  grid1: blocks (2j-1, 2j)          width W/2+1   (includes cols -1, W)
and convs ALTERNATE grid0->grid1->grid0. SR ResBlocks contain exactly
two convs, so every block input/output lives in grid0 and all skip adds
line up. The grid1 tensor's two overhang slots (columns -1 and W)
correspond to the original conv's zero padding for the NEXT conv; they
are zeroed by a broadcast multiply that XLA fuses into the conv epilogue.

Exactness: each packed conv computes the identical taps as the original
SAME-padded 3x3 conv (kernel entries are the original weights routed by
  dx = 2*w + e - d - 1   (grid0->grid1, packed-W padding (1,1))
  dx = 2*w + e - d + ... (see _pack_kernel)               ), including
borders; verified float-exactly in tests/test_packed_trunk.py.

Requires even W (callers fall back to the plain forward otherwise; all
bench/eval tile sizes are even). Works for any channel count C: 2C=128
(EDSR) fills the MXU exactly; 2C=96 (LarvaNet) fills 75%.

This replaces the reference's trunk loops (models/edsr.py:195-207,
models/LarvaNet.py:205-267) on the inference fast path; it is a pure
reparametrization, not an approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

def pack_w(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> grid0 packed (N, H, W/2, 2C). Free reshape (NHWC
    row-major: packed channel index = d*C + c for column offset d)."""
    n, h, w, c = x.shape
    assert w % 2 == 0, "packed trunk requires even W"
    return x.reshape(n, h, w // 2, 2 * c)


def unpack_w(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_w."""
    n, h, w2, c2 = x.shape
    return x.reshape(n, h, w2 * 2, c2 // 2)


def _route(k, d_shift):
    """Build (kh, 2, 2C, 2C) packed kernel from (kh, 3, C, C) original.

    Entry [ky, w, e*C+ci, d*C+co] = k[ky, dx+1, ci, co] where
    dx = 2*w + e - d + d_shift is the original column offset; entries
    with |dx| > 1 are the structural zeros. Works on tracers (pure
    concatenation), so forwards can pack live jit arguments — the
    rearrangement is a one-off ~36 KB shuffle inside the compiled graph.
    """
    k = jnp.asarray(k)
    kh, kw, ci, co = k.shape
    assert kw == 3
    zero = jnp.zeros((kh, ci, co), k.dtype)

    def entry(w, e, d):
        dx = 2 * w + e - d + d_shift
        return k[:, dx + 1] if -1 <= dx <= 1 else zero

    planes = [
        jnp.concatenate([
            jnp.concatenate([entry(w, e, 0), entry(w, e, 1)], axis=-1)
            for e in (0, 1)
        ], axis=-2)
        for w in (0, 1)
    ]
    return jnp.stack(planes, axis=1)


def pack_kernel_a(k) -> np.ndarray:
    """grid0 -> grid1 conv kernel; use packed-W padding (1, 1).

    Output block j (cols 2j-1+d) reads input blocks j-1+w (cols
    2(j-1+w)+e), so dx = 2w + e - d - 1.
    """
    return _route(k, -1)


def pack_kernel_b(k) -> np.ndarray:
    """grid1 -> grid0 conv kernel; use packed-W padding (0, 0).

    Output block j (cols 2j+d) reads input blocks j+w (cols 2(j+w)-1+e),
    so dx = 2w + e - d - 1 as well — same routing, different padding.
    """
    return _route(k, -1)


def pack_kernel_same(k):
    """grid0 -> grid0 packed kernel for a single SAME conv of ANY odd
    width (no grid1, no masks — pad blocks ARE the original zero padding).

    Used for odd-count conv chains (e.g. the collapsed tail's 5x5 conv,
    where N=48 underfill costs 3x — BASELINE.md tail anatomy). Overhead:
    (R+2)/(2R+1) x 4/2 ... concretely 2x raw FLOPs for 3x3, 1.2x for 5x5.

    Returns (kernel (kh, R+2, 2ci, 2co), (pad_left, pad_right)) for
    packed-W padding. Entry [ky, w, e*ci+i, d*co+o] = k[ky, dx+R] with
    dx = 2w + e - d - 2*pad, |dx| <= R.
    """
    k = jnp.asarray(k)
    kh, kw, ci, co = k.shape
    assert kw % 2 == 1
    R = kw // 2
    pad = (R + 1) // 2
    kw_p = ((R + 2 * pad + 1) // 2) + 1
    zero = jnp.zeros((kh, ci, co), k.dtype)

    def entry(w, e, d):
        dx = 2 * w + e - d - 2 * pad
        return k[:, dx + R] if -R <= dx <= R else zero

    planes = [
        jnp.concatenate([
            jnp.concatenate([entry(w, e, 0), entry(w, e, 1)], axis=-1)
            for e in (0, 1)
        ], axis=-2)
        for w in range(kw_p)
    ]
    return jnp.stack(planes, axis=1), (pad, kw_p - 1 - pad)


def conv_same(x, kernel_packed, pads, bias_packed=None):
    """grid0 (N,H,W2,2C) -> grid0 (N,H,W2,2Co) single packed SAME conv."""
    kh = kernel_packed.shape[0]
    out = jax.lax.conv_general_dilated(
        x, kernel_packed, (1, 1), ((kh // 2, kh // 2), pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if bias_packed is None else out + bias_packed


def pack_bias(b):
    """(C,) -> (2C,): bias broadcasts over the column-offset axis."""
    b = jnp.asarray(b)
    return jnp.concatenate([b, b])


def grid1_mask(w_packed: int, c: int, dtype=jnp.float32,
               odd_src_width: bool = False) -> jnp.ndarray:
    """(1, 1, W/2+1, 2C) multiplicative mask zeroing the grid1 overhang
    slots (original columns -1 and >= W), which stand in for the next
    conv's zero padding. XLA fuses the multiply into the conv epilogue.

    For an odd source width W (zero-padded to W+1 before packing), the
    out-of-image column W sits at block W2, d=0 — both d slots of the
    last block must be zeroed."""
    m = np.ones((1, 1, w_packed, 2 * c), np.float32)
    m[0, 0, 0, :c] = 0.0        # block 0, d=0  -> column -1
    m[0, 0, -1, c:] = 0.0       # last block, d=1 -> column W (even) / W+1 (odd)
    if odd_src_width:
        m[0, 0, -1, :c] = 0.0   # last block, d=0 -> column W
    return jnp.asarray(m, dtype)


def conv_a(x, kernel_packed, bias_packed=None):
    """grid0 (N,H,W/2,2C) -> grid1 (N,H,W/2+1,2C)."""
    out = jax.lax.conv_general_dilated(
        x, kernel_packed, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if bias_packed is None else out + bias_packed


def conv_b(x, kernel_packed, bias_packed=None):
    """grid1 (N,H,W/2+1,2C) -> grid0 (N,H,W/2,2C). Caller must have
    zeroed the grid1 overhang slots (grid1_mask)."""
    out = jax.lax.conv_general_dilated(
        x, kernel_packed, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if bias_packed is None else out + bias_packed


def grid0_mask(w_packed: int, c: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, W2, 2C) mask zeroing the grid0 overhang slot (the padded
    column W of an odd-width image). Only needed when W was odd."""
    m = np.ones((1, 1, w_packed, 2 * c), np.float32)
    m[0, 0, -1, c:] = 0.0       # block W2-1, d=1 -> padded column W
    return jnp.asarray(m, dtype)


def packed_entry(h, dtype):
    """Shared trunk prologue: zero-pad odd widths, pack, build masks.

    h: the head conv's output (N, H, W, C). Returns
    (h0, mask1, mask0, odd) with h0 grid0-packed and already masked for
    the odd-W case; every family forward starts here.
    """
    ww = h.shape[2]
    odd = ww % 2 == 1
    if odd:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 0)))
    c = h.shape[-1]
    h0 = pack_w(h)
    w2 = h0.shape[2]
    mask1 = grid1_mask(w2 + 1, c, dtype, odd_src_width=odd)
    mask0 = grid0_mask(w2, c, dtype) if odd else None
    if odd:
        h0 = h0 * mask0
    return h0, mask1, mask0, odd


def packed_entry_head(x, kernel, bias, dtype):
    """conv3x3 head + packed_entry, with the conv itself running packed
    for even widths (pack_kernel_same: 3->F becomes 6->2F at half
    width): the unpacked F-channel head output never materializes,
    which removes the relayout copies XLA emits at the pack-entry
    boundary (~0.4 ms/iter for EDSR at 16x192² — device trace,
    BASELINE.md). Odd widths fall back to the plain conv + packed_entry.
    Drop-in: returns the same (h0, mask1, mask0, odd) tuple.
    """
    x = x.astype(dtype)
    if x.shape[2] % 2:
        h = jax.lax.conv_general_dilated(
            x, jnp.asarray(kernel, dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(bias, dtype)
        return packed_entry(h, dtype)
    kp, pads = pack_kernel_same(jnp.asarray(kernel, dtype))
    h0 = conv_same(pack_w(x), kp, pads, pack_bias(jnp.asarray(bias, dtype)))
    c = h0.shape[-1] // 2
    return h0, grid1_mask(h0.shape[2] + 1, c, dtype), None, False


def packed_exit(h0, odd, ww):
    """Inverse of packed_entry's packing: unpack and crop the pad column."""
    out = unpack_w(h0)
    return out[:, :, :ww] if odd else out


def packed_resblock(h0, ka, ba, kb, bb, mask1, mask0=None, res_weight=1.0,
                    act=jax.nn.relu):
    """One SR ResBlock (conv-act-conv + skip), fully in grid0/grid1.

    h0: grid0 tensor (overhang slot already zero if mask0 is not None);
    ka/kb: packed kernels (pack_kernel_a/b); ba/bb: packed biases;
    mask1: grid1_mask for this width (applied AFTER the activation, so
    any act works, even ones with act(0) != 0); mask0: grid0_mask for
    odd-W inputs (keeps the padded column's bias from leaking into real
    taps).
    """
    t = conv_a(h0, ka, ba)
    t = act(t) * mask1
    t = conv_b(t, kb, bb)
    if res_weight != 1.0:
        t = t * jnp.asarray(res_weight, t.dtype)
    out = h0 + t
    return out if mask0 is None else out * mask0


def packed_block(h0, blk, mask1, mask0=None, res_weight=1.0, act=jax.nn.relu,
                 dtype=jnp.float32):
    """packed_resblock from a {conv1: {kernel,bias}, conv2: ...} subtree."""
    return packed_resblock(
        h0,
        pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
        pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)),
        pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
        pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)),
        mask1, mask0, res_weight, act=act)



def conv_plain(h, p, dtype, strides=(1, 1), padding="SAME", groups=1):
    """Unpacked SAME conv from a {kernel, bias} subtree (the `def conv`
    every walker used to re-declare)."""
    return jax.lax.conv_general_dilated(
        h, jnp.asarray(p["kernel"], dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + jnp.asarray(p["bias"], dtype)


def single_same(hin, p, dtype, odd=False, perm_channels=None):
    """Single grid0->grid0 packed conv from a {kernel, bias} subtree
    (pack_kernel_same); perm_channels permutes the kernel input for
    concatenated packed sources (concat_packed_perm); odd=True masks the
    grid0 overhang slot of the output."""
    kp, pads = pack_kernel_same(jnp.asarray(p["kernel"], dtype))
    if perm_channels is not None:
        kp = concat_packed_perm(perm_channels, kp)
    o = conv_same(hin, kp, pads, pack_bias(jnp.asarray(p["bias"], dtype)))
    if odd:
        o = o * grid0_mask(o.shape[2], o.shape[-1] // 2, dtype)
    return o



def _even_calib(calib_batch):
    """Validate + convert an int8 calibration batch (even width required:
    the calibration walks run the packed graph without odd-width
    handling, and a padded column would silently inflate the recorded
    activation maxima)."""
    calib = jnp.asarray(calib_batch, jnp.float32)
    if calib.shape[2] % 2:
        raise ValueError("int8 calibration batch must have even width "
                         "(got %d); crop a column first" % calib.shape[2])
    return calib


def concat_packed_perm(src_channels, kernel_packed):
    """Fix a packed conv kernel to consume CONCATENATED packed tensors.

    concat([pack_w(a), pack_w(b)], -1) is a channel PERMUTATION of
    pack_w(concat([a, b], -1)): source s's slot (e, c) sits at
    s*2*C_s + e*C_s + c instead of e*sum(C) + offset_s + c. A conv
    absorbs any input permutation in its kernel, so REGO-style fusion
    convs stay packed with zero layout ops."""
    total = sum(src_channels)
    perm = np.empty(2 * total, np.int64)
    a = 0
    off = 0
    for cs in src_channels:
        for e in (0, 1):
            for c in range(cs):
                perm[a] = e * total + off + c
                a += 1
        off += cs
    return kernel_packed[:, :, jnp.asarray(perm), :]


def depthwise_packed(x0, kernel, dtype):
    """Exact depthwise 3x3 SAME conv in the grid0-packed domain.

    A depthwise conv maps each channel from itself, but packed slots
    (d, c) draw taps from BOTH slots of channel c; splitting by source
    slot parity gives four small grouped convs over the half-channel
    slices (dx parity must match e-d, so each pair uses either the
    center tap or the two outer taps):
      out_d0 = K[:,1] * x_e0  +  {K[:,0], K[:,2]} over x_e1 (pad left)
      out_d1 = {K[:,0], K[:,2]} over x_e0 (pad right)  +  K[:,1] * x_e1
    kernel: original (3, 3, 1, C) HWIO depthwise kernel.
    """
    c = kernel.shape[-1]
    k = jnp.asarray(kernel, dtype)
    xe0, xe1 = x0[..., :c], x0[..., c:]

    def gconv(x, kern, wpad):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((1, 1), wpad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    center = k[:, 1:2]                     # (3, 1, 1, C)
    outer = jnp.stack([k[:, 0], k[:, 2]], axis=1)  # (3, 2, 1, C)
    out_d0 = gconv(xe0, center, (0, 0)) + gconv(xe1, outer, (1, 0))
    out_d1 = gconv(xe0, outer, (0, 1)) + gconv(xe1, center, (0, 0))
    return jnp.concatenate([out_d0, out_d1], axis=-1)


def pointwise_packed(x0, kernel, bias, dtype):
    """1x1 conv in the grid0-packed domain: slots mix channels only
    within their own column offset, i.e. a feature_group_count=2 conv
    whose kernel repeats the original (1,1,C,C) for both groups — the
    SAME MACs as the unpacked conv (no structural zeros)."""
    k = jnp.asarray(kernel, dtype)  # (1, 1, C, C)
    kk = jnp.concatenate([k, k], axis=-1)  # groups share the weights
    out = jax.lax.conv_general_dilated(
        x0, kk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2)
    return out + pack_bias(jnp.asarray(bias, dtype))


def packed_dw_resblock(h0, blk, act, dtype):
    """DepthwiseSeparableResBlock (dw-pw-act-dw-pw + skip, reference
    models/dwsr_reduced.py) fully in grid0: depthwise via
    depthwise_packed, pointwise via pointwise_packed. No grid1, no
    masks (even-W inputs). EXACT but a measured NEGATIVE RESULT as a
    whole-trunk strategy: dwsr 14.9 -> 3.4 MP/s on v5e (the grouped
    half-channel convs are latency-bound) — kept for the MAM attention,
    whose single depthwise per block amortizes fine, and as a
    documented dead end (BASELINE.md)."""
    t = depthwise_packed(h0, blk["dw1"]["kernel"], dtype) \
        + pack_bias(jnp.asarray(blk["dw1"]["bias"], dtype))
    t = pointwise_packed(t, blk["pw1"]["kernel"], blk["pw1"]["bias"], dtype)
    t = act(t)
    t = depthwise_packed(t, blk["dw2"]["kernel"], dtype) \
        + pack_bias(jnp.asarray(blk["dw2"]["bias"], dtype))
    t = pointwise_packed(t, blk["pw2"]["kernel"], blk["pw2"]["bias"], dtype)
    return h0 + t


def _grid1_to_grid0_identity(c, dtype):
    """(1, 2, 2c, 2c) kernel that re-gathers a grid1-packed tensor onto
    grid0 (identity values, VALID padding): out col 2j+d = in col 2j+d,
    i.e. entries (w=0, e=1, d=0) and (w=1, e=0, d=1). Used for the tiny
    distilled slices in IMDN whose grid parity disagrees with the fuse
    concat."""
    k = np.zeros((1, 2, 2 * c, 2 * c), np.float32)
    for cc in range(c):
        k[0, 0, c + cc, cc] = 1.0
        k[0, 1, cc, c + cc] = 1.0
    return jnp.asarray(k, dtype)


def packed_prelu(t, slope, dtype):
    """Per-channel PReLU on a packed tensor (slope broadcasts over the
    column-offset axis, like biases)."""
    s = pack_bias(jnp.asarray(slope, dtype))
    return jnp.where(t >= 0, t, t * s)
