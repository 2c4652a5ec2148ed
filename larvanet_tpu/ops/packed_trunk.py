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


def make_packed_edsr_forward(model, dtype=jnp.float32):
    """Inference-optimized EDSR forward: width-packed trunk + collapsed
    linear tail. Exactly equal to model.module.apply (float tolerance);
    measured ~2x faster per trunk conv on v5e (BASELINE.md). Any input
    width (odd W is zero-padded to even and masked per block — the mask
    multiplies fuse into conv epilogues).

    Trunk topology per reference models/edsr.py:177-207: head conv,
    N x ResBlock(conv-relu-conv), after_res_conv, global skip, tail.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward

    # reuse the collapsed-tail machinery by building its fast_tail once
    collapsed = make_collapsed_edsr_forward(model, dtype=dtype)
    fast_tail = collapsed.__wrapped_tail__

    res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(w, dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, dtype)

        n, hh, ww, _ = x.shape
        h = x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        res = h0
        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            res = packed_resblock(
                res,
                pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)),
                pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)),
                mask1, mask0, res_weight)
            i += 1

        if not odd:
            # stay packed through after_res_conv, the global skip, and
            # into the tail's packed conv: crossing the 64<->128-channel
            # tiling boundary costs a full relayout copy each way
            # (device trace, BASELINE.md tail anatomy)
            arc = sp["after_res_conv"]
            kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
            res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
            return fast_tail(h0 + res, packed=True)
        res = unpack_w(res)[:, :, :ww]
        h = unpack_w(h0)[:, :, :ww]
        res = conv(res, sp["after_res_conv"]["kernel"], sp["after_res_conv"]["bias"])
        h = h + res
        return fast_tail(h)

    forward.__wrapped_tail__ = fast_tail
    return forward


def make_packed_edsr_train_forward(model, dtype=jnp.float32):
    """Differentiable EDSR forward with a width-packed trunk and the LIVE
    original tail (params train; nothing is baked). Loss/grad-equivalent
    to module.apply — the packing is differentiable slicing/concat — so
    it drops into _compute_loss for ~1.5x faster training steps.

    Topology per reference models/edsr.py:195-207; the 16 ResBlocks
    (32 convs) pack, head/after_res_conv/tail (4-5 convs) run plain.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    scale = model.scale
    res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(w, dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, dtype)

        n, hh, ww, _ = x.shape
        h = x.astype(dtype) + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        res = h0
        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            res = packed_resblock(
                res,
                pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)),
                pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)),
                mask1, mask0, res_weight)
            i += 1

        res = unpack_w(res)
        h = unpack_w(h0)
        if odd:
            res, h = res[:, :, :ww], h[:, :, :ww]
        res = conv(res, sp["after_res_conv"]["kernel"], sp["after_res_conv"]["bias"])
        h = h + res

        up, i = sp["upsample"], 0
        while ("conv%d" % i) in up:
            h = conv(h, up["conv%d" % i]["kernel"], up["conv%d" % i]["bias"])
            h = pixel_shuffle(h, 2 if scale != 3 else 3)
            i += 1
        h = conv(h, sp["final_conv"]["kernel"], sp["final_conv"]["bias"])
        return h - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    return forward


def make_packed_collapsed_edsr_train_forward(model, dtype=jnp.float32):
    """Differentiable EDSR forward: width-packed trunk + LIVE collapsed
    tail. Nothing is baked — the collapsed tail kernel is re-composed
    from the CURRENT upsample/final-conv params inside the graph
    (ops/collapsed_tail.live_collapsed_edsr_tail, a <1%-of-step delta
    probe), so gradients flow to the original parameters and training is
    loss/grad-equivalent to module.apply (tests/test_collapsed_tail.py).

    Motivation (BASELINE.md training table): with the trunk packed, the
    EDSR training step is tail-bound — the 256-channel PixelShuffle
    transposes run in fwd AND bwd. The collapsed tail removes them for
    the patch interior in both directions (tail FLOPs 1.53 -> ~0.15
    MF/LR-px); the border band recomputes the original live chain on
    thin strips, exactly as at inference.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import (
        apply_collapsed_tail, live_collapsed_edsr_tail)

    scale = model.scale
    res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(w, dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, dtype)

        n, hh, ww, _ = x.shape
        h = x.astype(dtype) + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        res = h0
        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            res = packed_block(res, blk, mask1, mask0, res_weight, dtype=dtype)
            i += 1

        kernel, bias_tile, tail_fn = live_collapsed_edsr_tail(sp, scale, dtype)
        if not odd:
            # stay packed through after_res_conv + global skip into the
            # collapsed tail's packed conv (no 64<->128 relayouts)
            arc = sp["after_res_conv"]
            kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
            res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
            return apply_collapsed_tail(h0 + res, kernel, bias_tile, tail_fn,
                                        scale, packed=True)
        res = unpack_w(res)[:, :, :ww]
        h = unpack_w(h0)[:, :, :ww]
        res = conv(res, sp["after_res_conv"]["kernel"], sp["after_res_conv"]["bias"])
        return apply_collapsed_tail(h + res, kernel, bias_tile, tail_fn, scale)

    return forward


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


def make_packed_treenet_forward(model, dtype=jnp.float32):
    """Width-packed TreeNet forward (reference models/TreeNet.py:226-256):
    shared 48ch trunk + per-branch ResBlock runs, all packed.
    Returns forward(params, x, branches=0 | int | 'all') mirroring the
    module's signature (validate_tree sweeps branches; training uses
    'all'). Differentiable — used for training too.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    lrelu = get_activation("leaky_relu", 0.1)

    def forward(params, x, branches=0):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        n, hh, ww, _ = x.shape
        fea, mask1, mask0, odd = packed_entry_head(
            x, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        fea = lrelu(fea)
        for i in range(mod.num_common_blocks):
            fea = packed_block(fea, sp["common_block_%d" % i], mask1, mask0,
                               mod.res_weight, dtype=dtype)

        base = interpolated_base(x, mod.scale, mod.interpolate)

        def run_branch(b):
            h = fea
            for i in range(mod.num_branch_blocks):
                h = packed_block(h, sp["branch_%d_block_%d" % (b, i)], mask1,
                                 mask0, mod.res_weight, dtype=dtype)
            h = packed_exit(h, odd, ww)
            return pixel_shuffle(h, mod.scale) + base

        if branches == "all":
            return [run_branch(b) for b in range(mod.num_branches)]
        return run_branch(int(branches))

    return forward


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


def make_int8_treenet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized TreeNet inference (branch 0, the reference's
    inference path); same scheme and caveats as make_int8_edsr_forward."""
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    lrelu = get_activation("leaky_relu", 0.1)
    sp0 = serialization.to_state_dict(model.params)
    names = (["common_block_%d" % i for i in range(mod.num_common_blocks)]
             + ["branch_0_block_%d" % i for i in range(mod.num_branch_blocks)])
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        h0, mask1, _m0, _odd = packed_entry_head(
            x, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        h0 = lrelu(h0)
        for i, name in enumerate(names):
            blk = sp[name]
            h0 = pair(i, h0, blk["conv1"], blk["conv2"], mask1,
                      res_weight=mod.res_weight)
        base = interpolated_base(x, mod.scale, mod.interpolate)
        return pixel_shuffle(unpack_w(h0), mod.scale) + base

    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0[n]["conv1"], sp0[n]["conv2"]) for n in names])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_int8_hrsr_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized HRSR inference: the packed LR ResBlock trunk
    runs int8; the HR-domain part stays plain bf16 (tiny channel counts).
    Same scheme and caveats as make_int8_edsr_forward."""
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    lrelu = get_activation("leaky_relu", 0.1)
    sp0 = serialization.to_state_dict(model.params)
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        ww = x.shape[2]
        h0, mask1, mask0, odd = packed_entry_head(
            x, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        h0 = lrelu(h0)
        for i in range(mod.num_lr_blocks):
            blk = sp["lr_block_%d" % i]
            h0 = pair(i, h0, blk["conv1"], blk["conv2"], mask1,
                      res_weight=mod.res_weight)
        out = pixel_shuffle(packed_exit(h0, odd, ww), mod.scale)

        if mod.num_hr_blocks > 0:
            if mod.c3_style:
                for i in range(mod.num_hr_blocks):
                    blk = sp["hr_block_%d" % i]
                    t = conv(jax.nn.relu(conv(out, blk["conv1"])), blk["conv2"])
                    if mod.res_weight != 1.0:
                        t = t * jnp.asarray(mod.res_weight, dtype)
                    out = out + t
            else:
                out = lrelu(conv(out, sp["middle_conv"]))
                for i in range(mod.num_hr_blocks):
                    blk = sp["hr_block_%d" % i]
                    out = out + conv(jax.nn.relu(conv(out, blk["conv1"])), blk["conv2"])
        if not mod.c3_style and mod.num_hr_filters != 3:
            out = conv(lrelu(out), sp["final_conv"])
        return out + interpolated_base(x, mod.scale, mod.interpolate)

    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0["lr_block_%d" % i]["conv1"], sp0["lr_block_%d" % i]["conv2"])
            for i in range(mod.num_lr_blocks)])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_int8_ebrn_rm_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized ebrn_rm inference: the BRM pairs run int8
    ('both'-kind); the fusion cascade and concat recon stay bf16 packed.
    Same scheme and caveats as make_int8_edsr_forward."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    if type(mod).__name__ != "EBRNRMModule":
        raise ValueError("int8 path supports the ebrn_rm variants only")
    F = mod.features
    lrelu = get_activation("leaky_relu", 0.05)
    sp0 = serialization.to_state_dict(model.params)
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        ww = x.shape[2]
        inp = x if mod.bilinear_base else x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            inp, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        out_list = []
        h = h0
        for i in range(mod.num_brms):
            res, out = pair(i, h, sp["brm_%d_conv1" % i], sp["brm_%d_conv2" % i],
                            mask1, kind="both", act=lrelu)
            if i < mod.num_brms - 1:
                out_list.append(out)
                h = res

        def single(p, hin):
            kp, pads = pack_kernel_same(jnp.asarray(p["kernel"], dtype))
            return conv_same(hin, kp, pads, pack_bias(jnp.asarray(p["bias"], dtype)))

        out_prime_list = [out]
        for i in range(mod.num_brms - 1):
            out = single(sp["fusion_%d" % i], out + out_list[-(i + 1)])
            out_prime_list.append(out)

        cat = jnp.concatenate(out_prime_list, axis=-1)
        kp, pads = pack_kernel_same(jnp.asarray(sp["upsample_conv"]["kernel"], dtype))
        kp = concat_packed_perm([F] * mod.num_brms, kp)
        up = conv_same(cat, kp, pads,
                       pack_bias(jnp.asarray(sp["upsample_conv"]["bias"], dtype)))
        sr = pixel_shuffle(packed_exit(up, odd, ww), mod.scale)
        if mod.bilinear_base:
            return sr + interpolated_base(x, mod.scale, "bilinear")
        return sr - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0["brm_%d_conv1" % i], sp0["brm_%d_conv2" % i])
            for i in range(mod.num_brms)])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_packed_hrsr_forward(model, dtype=jnp.float32):
    """Width-packed HRSR forward (reference models/hrsr*.py): the 48ch LR
    ResBlock trunk packs; the HR-domain part (3-16ch convs at 16x the
    pixels) stays plain — its channel counts are too small to pack
    profitably and it is a tiny share of FLOPs. Differentiable.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    lrelu = get_activation("leaky_relu", 0.1)

    def forward(params, x):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        n, hh, ww, _ = x.shape
        h0, mask1, mask0, odd = packed_entry_head(
            x, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        h0 = lrelu(h0)
        for i in range(mod.num_lr_blocks):
            h0 = packed_block(h0, sp["lr_block_%d" % i], mask1, mask0,
                              mod.res_weight, dtype=dtype)
        out = packed_exit(h0, odd, ww)
        out = pixel_shuffle(out, mod.scale)

        def resblock_plain(h, blk, kernel_size=3):
            t = conv(h, blk["conv1"])
            t = jax.nn.relu(t)
            t = conv(t, blk["conv2"])
            if mod.res_weight != 1.0 and mod.c3_style:
                t = t * jnp.asarray(mod.res_weight, t.dtype)
            return h + t

        if mod.num_hr_blocks > 0:
            if mod.c3_style:
                for i in range(mod.num_hr_blocks):
                    out = resblock_plain(out, sp["hr_block_%d" % i])
            else:
                out = lrelu(conv(out, sp["middle_conv"]))
                for i in range(mod.num_hr_blocks):
                    blk = sp["hr_block_%d" % i]
                    t = jax.nn.relu(conv(out, blk["conv1"]))
                    out = out + conv(t, blk["conv2"])
        if not mod.c3_style and mod.num_hr_filters != 3:
            out = conv(lrelu(out), sp["final_conv"])
        return out + interpolated_base(x, mod.scale, mod.interpolate)

    return forward


def make_int8_msrr_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized MSRR-family inference (same scheme and
    caveats as make_int8_edsr_forward). Non-depthwise configs only."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    kind = type(mod).__name__
    if kind == "MSRRReducedModule" and mod.depthwise:
        # exact packed decomposition exists (packed_dw_resblock) but is
        # 4.4x slower on v5e — keep dwsr on the plain graph
        raise ValueError("depthwise blocks do not pack profitably")
    scale = mod.scale
    res_weight = float(mod.res_weight)
    lrelu = get_activation("leaky_relu", 0.1)
    if kind == "MSRRReducedModule":
        block_act = get_activation(mod.block_activation, mod.slope)
    else:
        block_act = jax.nn.relu

    sp0 = serialization.to_state_dict(model.params)
    n_blocks = len([k for k in sp0 if k.startswith("res_block_")])
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, name, p=None):
            p = sp[name] if p is None else p
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        if kind == "MSRRReducedModule":
            x_in = x + jnp.asarray(DIV2K_RGB_MEAN, dtype) if mod.base == "meanshift" else x
            head_name = "first_conv"
            head_act = (get_activation(mod.first_activation, mod.slope)
                        if mod.first_activation else None)
        else:
            x_in = x
            head_name = "first_conv" if kind == "MSRRModule" else "conv_first"
            head_act = lrelu
        h0, mask1, _m0, _odd = packed_entry_head(
            x_in, sp[head_name]["kernel"], sp[head_name]["bias"], dtype)
        if head_act is not None:
            h0 = head_act(h0)  # act(0)=0 for all heads
        for i in range(n_blocks):
            blk = sp["res_block_%d" % i]
            h0 = pair(i, h0, blk["conv1"], blk["conv2"], mask1,
                      act=block_act, res_weight=res_weight)
        out = unpack_w(h0)

        if kind == "MSRRReducedModule":
            out = pixel_shuffle(out, scale)
            if mod.base == "meanshift":
                return out - jnp.asarray(DIV2K_RGB_MEAN, dtype)
            if mod.base is not None:
                return out + interpolated_base(x, scale, mod.base)
            return out
        if kind == "MSRRModule":
            up, j, stages = sp["upsample"], 0, []
            while ("conv%d" % j) in up:
                stages.append(up["conv%d" % j]); j += 1
            for j, stage in enumerate(stages):
                out = pixel_shuffle(conv(out, None, stage), 2 if scale != 3 else 3)
                if j < len(stages) - 1:
                    out = lrelu(out)
            if scale != 3:
                out = lrelu(out)
            out = lrelu(conv(out, "HR_conv"))
            out = conv(out, "final_conv")
            return out + interpolated_base(x, scale, "bilinear")
        out = lrelu(pixel_shuffle(conv(out, "upconv1"), 2))
        out = lrelu(pixel_shuffle(conv(out, "upconv2"), 2))
        out = conv(lrelu(conv(out, "HRconv")), "conv_last")
        return out + interpolated_base(x, 4, "bilinear")

    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0["res_block_%d" % i]["conv1"], sp0["res_block_%d" % i]["conv2"])
            for i in range(n_blocks)])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


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


def make_int8_rego_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized REGO-Net inference (same scheme and caveats
    as make_int8_edsr_forward): the triangular RESBlock wavefront runs
    int8 ('both'-kind pairs); the fusion/recon singles stay bf16 packed."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    F = mod.features
    lrelu = get_activation("leaky_relu", 0.1)
    sp0 = serialization.to_state_dict(model.params)
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    # fixed wavefront visit order -> stable pair indices
    order = []
    for k in range(mod.num_regos):
        order.append("RESB_%d_0_0" % k)
        for i in range(1, mod.len_side):
            order.append("RESB_%d_%d_0" % (k, i))
            for j in range(1, i):
                order.append("RESB_%d_%d_%d" % (k, i - j, j))
            order.append("RESB_%d_0_%d" % (k, i))
    index = {n: i for i, n in enumerate(order)}

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        fea, mask1, mask0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["feature_extraction"]["kernel"], sp["feature_extraction"]["bias"], dtype)
        ww = x.shape[2]

        def resb(name, hin):
            return pair(index[name], hin, sp[name]["conv1"], sp[name]["conv2"],
                        mask1, kind="both", act=lrelu, res_weight=mod.res_weight)

        def fused_conv(p, srcs):
            kp, pads = pack_kernel_same(jnp.asarray(p["kernel"], dtype))
            kp = concat_packed_perm([F] * len(srcs), kp)
            return conv_same(jnp.concatenate(srcs, axis=-1), kp, pads,
                             pack_bias(jnp.asarray(p["bias"], dtype)))

        for k in range(mod.num_regos):
            err, f = resb("RESB_%d_0_0" % k, fea)
            err_in, fea_in = [err], [f]
            err_out, fea_out = err_in, fea_in
            for i in range(1, mod.len_side):
                err_out, fea_out = [], []
                e0, f0 = resb("RESB_%d_%d_0" % (k, i), err_in[0])
                err_out.append(e0); fea_out.append(f0)
                for j in range(1, i):
                    e1, f1 = resb("RESB_%d_%d_%d" % (k, i - j, j),
                                  fea_in[j - 1] + err_in[j])
                    err_out.append(e1); fea_out.append(f1)
                e2, f2 = resb("RESB_%d_0_%d" % (k, i), fea_in[i - 1])
                err_out.append(e2); fea_out.append(f2)
                err_in, fea_in = err_out, fea_out
            mids = [e + f for e, f in zip(err_out[1:], fea_out[:-1])]
            srcs = [err_out[0], *mids, fea_out[-1]]
            if k != mod.num_regos - 1:
                fea = fused_conv(sp["conv_%d" % k], srcs)

        sr = fused_conv(sp["SRrecon"], srcs)
        sr = pixel_shuffle(packed_exit(sr, odd, ww), mod.scale)
        return sr + interpolated_base(x, mod.scale, mod.interpolate)

    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0[n]["conv1"], sp0[n]["conv2"]) for n in order])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_packed_rego_forward(model, dtype=jnp.float32):
    """Width-packed REGO-Net forward (reference models/REGO-Net.py /
    REGO-serial.py): the triangular RESBlock wavefront runs fully
    packed — block outputs (res, x+res) stay grid0; the diagonal
    fusion concat happens on packed tensors, with the fusion convs'
    kernels input-permuted to match (concat_packed_perm). Only the
    3-channel head and the final shuffle/base are unpacked.
    Differentiable (used for training too).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    F = mod.features
    lrelu = get_activation("leaky_relu", 0.1)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        n, hh, ww, _ = x.shape
        fea, mask1, mask0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["feature_extraction"]["kernel"], sp["feature_extraction"]["bias"], dtype)
        w2 = fea.shape[2]

        def resb(name, hin):
            blk = sp[name]
            t = conv_a(hin, pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)))
            t = lrelu(t) * mask1
            t = conv_b(t, pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)))
            if mod.res_weight != 1.0:
                t = t * jnp.asarray(mod.res_weight, dtype)
            out = hin + t
            if mask0 is not None:
                t, out = t * mask0, out * mask0
            return t, out

        def fused_conv(p, srcs, out_features):
            # packed single conv over a concat of packed sources
            kp, pads = pack_kernel_same(jnp.asarray(p["kernel"], dtype))
            kp = concat_packed_perm([F] * len(srcs), kp)
            h = conv_same(jnp.concatenate(srcs, axis=-1), kp, pads,
                          pack_bias(jnp.asarray(p["bias"], dtype)))
            return h if mask0 is None else h * grid0_mask(w2, out_features, dtype)

        for k in range(mod.num_regos):
            # triangular wavefront (reference REGO-Net.py), packed
            err, f = resb("RESB_%d_0_0" % k, fea)
            err_in, fea_in = [err], [f]
            err_out, fea_out = err_in, fea_in
            for i in range(1, mod.len_side):
                err_out, fea_out = [], []
                e0, f0 = resb("RESB_%d_%d_0" % (k, i), err_in[0])
                err_out.append(e0); fea_out.append(f0)
                for j in range(1, i):
                    e1, f1 = resb("RESB_%d_%d_%d" % (k, i - j, j),
                                  fea_in[j - 1] + err_in[j])
                    err_out.append(e1); fea_out.append(f1)
                e2, f2 = resb("RESB_%d_0_%d" % (k, i), fea_in[i - 1])
                err_out.append(e2); fea_out.append(f2)
                err_in, fea_in = err_out, fea_out
            mids = [e + f for e, f in zip(err_out[1:], fea_out[:-1])]
            srcs = [err_out[0], *mids, fea_out[-1]]
            if k != mod.num_regos - 1:
                fea = fused_conv(sp["conv_%d" % k], srcs, F)

        sr = fused_conv(sp["SRrecon"], srcs, 3 * mod.scale ** 2)
        sr = packed_exit(sr, odd, ww)
        sr = pixel_shuffle(sr, mod.scale)
        return sr + interpolated_base(x, mod.scale, mod.interpolate)

    return forward


def make_packed_ebrn_rm_forward(model, dtype=jnp.float32):
    """Width-packed ebrn_rm / ebrn_rm_BLI forward (reference
    models/ebrn_rm.py): the BRM conv pairs, the single-conv fusion
    cascade (grid0->grid0 via pack_kernel_same) and the concat recon
    conv (input-permuted, concat_packed_perm) all run packed; only the
    3-channel head and the final shuffle are unpacked. Differentiable.
    The full EBRN (strided ConvTranspose back-projection) stays on the
    plain graph — strides do not fit the column-pair grids.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    if type(mod).__name__ != "EBRNRMModule":
        raise ValueError("packed path supports the ebrn_rm variants only")
    F = mod.features
    lrelu = get_activation("leaky_relu", 0.05)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        ww = x.shape[2]
        inp = x if mod.bilinear_base else x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            inp, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        def brm(i, hin):
            res = conv_a(hin, pack_kernel_a(jnp.asarray(sp["brm_%d_conv1" % i]["kernel"], dtype)),
                         pack_bias(jnp.asarray(sp["brm_%d_conv1" % i]["bias"], dtype)))
            res = lrelu(res) * mask1
            res = conv_b(res, pack_kernel_b(jnp.asarray(sp["brm_%d_conv2" % i]["kernel"], dtype)),
                         pack_bias(jnp.asarray(sp["brm_%d_conv2" % i]["bias"], dtype)))
            if mask0 is not None:
                res = res * mask0
            return res, hin + res

        out_list = []
        h = h0
        for i in range(mod.num_brms - 1):
            res, out = brm(i, h)
            out_list.append(out)
            h = res  # residual stream feeds the next BRM (ebrn_rm.py forward)
        _, out = brm(mod.num_brms - 1, h)

        def single(p, hin, out_features):
            kp, pads = pack_kernel_same(jnp.asarray(p["kernel"], dtype))
            o = conv_same(hin, kp, pads, pack_bias(jnp.asarray(p["bias"], dtype)))
            if mask0 is not None:
                o = o * grid0_mask(o.shape[2], out_features, dtype)
            return o

        out_prime_list = [out]
        for i in range(mod.num_brms - 1):
            out = single(sp["fusion_%d" % i], out + out_list[-(i + 1)], F)
            out_prime_list.append(out)

        cat = jnp.concatenate(out_prime_list, axis=-1)
        kp, pads = pack_kernel_same(jnp.asarray(sp["upsample_conv"]["kernel"], dtype))
        kp = concat_packed_perm([F] * mod.num_brms, kp)
        up = conv_same(cat, kp, pads,
                       pack_bias(jnp.asarray(sp["upsample_conv"]["bias"], dtype)))
        sr = pixel_shuffle(packed_exit(up, odd, ww), mod.scale)
        if mod.bilinear_base:
            return sr + interpolated_base(x, mod.scale, "bilinear")
        return sr - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    return forward


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


def make_packed_ebrn_forward(model, dtype=jnp.float32):
    """Width-packed FULL EBRN forward (reference models/ebrn.py:135-233).

    The cross-resolution projections (ConvTranspose up, strided down)
    are structural and stay plain — but they are a small fraction of
    EBRN's FLOPs. Everything running at a fixed grid packs:

      * each BRM's 3-conv sr_flow at HR (the dominant cost: 16x the LR
        pixel count at x4) as conv_a -> conv_b -> conv_a with packed
        PReLUs, closed by the tiny grid1->grid0 identity regather;
      * each BRM's 3-conv bp_flow on the LR residual stream (the diff
        stream stays grid0-packed across BRMs);
      * the feature-extract pair fe1/fe2 (fe0's N=4F output already
        fills the MXU, it stays plain);
      * the reverse fusion cascade at HR: conv_a + regather per fusion
        (no activation between fusion convs, so the regather reads only
        real column slots and no masking is needed).

    The concat recon conv (N=3) and mean shifts stay plain. Even input
    widths only (HR width W*s is then even for every scale); callers
    fall back to the plain graph for odd W. Differentiable — packing is
    slicing/concat of the live parameters, so training uses it too.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

    mod = model.module
    F = mod.features
    scale = model.scale
    from larvanet_tpu.models.ebrn import _UP_GEOM

    k_up, s_up, p_up = _UP_GEOM[scale]
    n_brms = mod.num_brms

    def forward(params, x):
        sp = serialization.to_state_dict(params)
        if x.shape[2] % 2:
            raise ValueError("packed EBRN requires even width")

        def conv(h, p, strides=(1, 1), padding="SAME"):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), strides, padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        def conv_transpose(h, p):
            pad = k_up - 1 - p_up
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1),
                [(pad, pad), (pad, pad)], lhs_dilation=(s_up, s_up),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        def prelu(t, p):
            s = jnp.asarray(p["slope"], dtype)
            return jnp.where(t >= 0, t, t * s)

        ident = _grid1_to_grid0_identity(F, dtype)

        def regather(t):
            return jax.lax.conv_general_dilated(
                t, ident, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def packed_stack3(h0, stack, mask1):
            """3x (conv3x3 + PReLU) grid0 -> grid0 (a, b, a + regather)."""
            t = conv_a(h0, pack_kernel_a(jnp.asarray(stack["conv0"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(stack["conv0"]["bias"], dtype)))
            t = packed_prelu(t, stack["prelu0"]["slope"], dtype) * mask1
            t = conv_b(t, pack_kernel_b(jnp.asarray(stack["conv1"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(stack["conv1"]["bias"], dtype)))
            t = packed_prelu(t, stack["prelu1"]["slope"], dtype)
            t = conv_a(t, pack_kernel_a(jnp.asarray(stack["conv2"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(stack["conv2"]["bias"], dtype)))
            t = packed_prelu(t, stack["prelu2"]["slope"], dtype)
            return regather(t)

        x = x.astype(dtype)
        h = x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h = prelu(conv(h, sp["fe0"]), sp["fe_prelu0"])
        # fe1/fe2 pack as an A/B pair (K=8F, N=2F fills the MXU)
        h0 = pack_w(h)
        mask1_f = grid1_mask(h0.shape[2] + 1, F, dtype)
        t = conv_a(h0, pack_kernel_a(jnp.asarray(sp["fe1"]["kernel"], dtype)),
                   pack_bias(jnp.asarray(sp["fe1"]["bias"], dtype)))
        t = packed_prelu(t, sp["fe_prelu1"]["slope"], dtype) * mask1_f
        t = conv_b(t, pack_kernel_b(jnp.asarray(sp["fe2"]["kernel"], dtype)),
                   pack_bias(jnp.asarray(sp["fe2"]["bias"], dtype)))
        fea0 = packed_prelu(t, sp["fe_prelu2"]["slope"], dtype)  # LR grid0

        w2_lr = fea0.shape[2]
        mask1_lr = grid1_mask(w2_lr + 1, F, dtype)
        mask1_hr = None

        sr_list = []
        hp = fea0  # LR residual stream, grid0-packed
        for i in range(n_brms):
            brm = sp["brm_%d" % i]
            up = conv_transpose(unpack_w(hp), brm["up_block"])  # HR, plain
            up0 = pack_w(up)
            if mask1_hr is None:
                mask1_hr = grid1_mask(up0.shape[2] + 1, F, dtype)
            sr = packed_stack3(up0, brm["sr_flow"], mask1_hr)  # HR grid0
            if i == n_brms - 1:
                sr_list.append(sr)
                break
            sr_list.append(sr)
            down = conv(up, brm["down_block"], strides=(s_up, s_up),
                        padding=[(p_up, p_up), (p_up, p_up)])
            diff = hp - pack_w(down)
            hp = diff + packed_stack3(diff, brm["bp_flow"], mask1_lr)

        out = sr_list[-1]
        out_list = [out]
        for i in range(n_brms - 1):
            z = out + sr_list[-(i + 2)]
            t = conv_a(z, pack_kernel_a(jnp.asarray(sp["fusion_%d" % i]["kernel"], dtype)),
                       pack_bias(jnp.asarray(sp["fusion_%d" % i]["bias"], dtype)))
            out = regather(t)  # no activation: overhang slots unread
            out_list.append(out)

        cat = jnp.concatenate([unpack_w(o) for o in out_list], axis=-1)
        rec = conv(cat, sp["recon"])
        return rec - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    return forward


def make_packed_imdn_forward(model, dtype=jnp.float32):
    """Width-packed IMDN forward (reference models/imdn_aim2019.py): the
    four 3x3 convs per IMDBlock alternate grid0->grid1->grid0 (A/B
    pairs), the progressive channel splits slice the packed tensors
    directly (slot layout keeps per-offset channel ranges contiguous),
    the grid1-parity distills re-gather to grid0 with a tiny identity
    conv, and the 1x1 fuse runs packed with its inputs permuted
    (concat_packed_perm). Even widths only (odd W falls back via the
    wrapper). Differentiable.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    F = mod.features
    d = int(F * 0.25)
    r = F - d
    lrelu = get_activation("leaky_relu", 0.05)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        ww = x.shape[2]
        if ww % 2:
            raise ValueError("packed IMDN requires even width")
        h0, mask1, _m0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        ident = _grid1_to_grid0_identity(d, dtype)

        def cslice(t, c_total, lo, hi):
            # original channels [lo, hi) of a packed tensor
            return jnp.concatenate(
                [t[..., lo:hi], t[..., c_total + lo:c_total + hi]], axis=-1)

        def block(hin, blk):
            # conv1: grid0 -> grid1 (full F channels)
            t1 = conv_a(hin, pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                        pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)))
            t1 = lrelu(t1) * mask1
            dist1 = cslice(t1, F, 0, d)          # grid1
            rem1 = cslice(t1, F, d, F)           # grid1, r channels
            # conv2: grid1 -> grid0
            t2 = conv_b(rem1, pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                        pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)))
            t2 = lrelu(t2)
            dist2 = cslice(t2, F, 0, d)          # grid0
            rem2 = cslice(t2, F, d, F)           # grid0
            # conv3: grid0 -> grid1
            t3 = conv_a(rem2, pack_kernel_a(jnp.asarray(blk["conv3"]["kernel"], dtype)),
                        pack_bias(jnp.asarray(blk["conv3"]["bias"], dtype)))
            t3 = lrelu(t3) * mask1
            dist3 = cslice(t3, F, 0, d)          # grid1
            rem3 = cslice(t3, F, d, F)           # grid1
            # conv4: grid1 -> grid0 (d output channels)
            t4 = conv_b(rem3, pack_kernel_b(jnp.asarray(blk["conv4"]["kernel"], dtype)),
                        pack_bias(jnp.asarray(blk["conv4"]["bias"], dtype)))
            t4 = lrelu(t4)
            # re-gather the grid1 distills onto grid0 (tiny identity convs)
            def g1g0(t):
                return jax.lax.conv_general_dilated(
                    t, ident, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            res = jnp.concatenate([g1g0(dist1), dist2, g1g0(dist3), t4], axis=-1)
            # 1x1 fuse, packed, inputs permuted to the concat layout
            kp, pads = pack_kernel_same(jnp.asarray(blk["conv5"]["kernel"], dtype))
            kp = concat_packed_perm([d] * 4, kp)
            res = conv_same(res, kp, pads,
                            pack_bias(jnp.asarray(blk["conv5"]["bias"], dtype)))
            return hin + res

        res = h0
        for i in range(mod.num_blocks):
            res = block(res, sp["imd_block_%d" % i])

        arc = sp["after_res_conv"]
        kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
        res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
        h0 = h0 + res
        upc = sp["upsample_conv"]
        kp, pads = pack_kernel_same(jnp.asarray(upc["kernel"], dtype))
        up = conv_same(h0, kp, pads, pack_bias(jnp.asarray(upc["bias"], dtype)))
        out = pixel_shuffle(packed_exit(up, odd, ww), mod.scale)
        return out - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    return forward


def make_packed_mamnet_forward(model, dtype=jnp.float32):
    """Width-packed MAMNet forward (reference models/mamnet.py): the
    conv pairs pack as usual; the MAM attention runs packed too — the
    channel variance combines the two column slots' moments, the 1x1
    squeeze/excite acts on the tiny (N,1,1,C) statistics, and the
    depthwise conv uses depthwise_packed. The linear upsample tail is
    collapsed (ops/collapsed_tail.make_collapsed_tail) and consumes the
    packed features directly. Inference only (uses baked tail params).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_tail
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    F = mod.features
    scale = model.scale
    res_weight = float(mod.res_weight)
    p0 = serialization.to_state_dict(model.params)

    def tail_fn(h):
        cdt = h.dtype

        def conv(x, p):
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(p["kernel"], cdt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], cdt)

        up, i, out = p0["upsample"], 0, h
        while ("conv%d" % i) in up:
            out = pixel_shuffle(conv(out, up["conv%d" % i]), 2 if scale != 3 else 3)
            i += 1
        out = conv(out, p0["final_conv"])
        return out - jnp.asarray(DIV2K_RGB_MEAN, cdt)

    n_stages = len([k for k in p0["upsample"] if k.startswith("conv")])
    fast_tail = make_collapsed_tail(tail_fn, F, scale, radius=1 + n_stages)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        n, hh, ww, _ = x.shape
        n_pix = hh * ww
        h0, mask1, mask0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        res = h0
        for i in range(mod.num_blocks):
            blk = sp["mam_block_%d" % i]
            t = conv_a(res, pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)))
            t = jax.nn.relu(t) * mask1
            t = conv_b(t, pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)))
            if mask0 is not None:
                # odd width: zero the pad-column slot BEFORE the gate so
                # the channel-variance sums see only real pixels (n_pix
                # already counts only those)
                t = t * mask0
            t = packed_mam_gate(t, blk, F, n_pix, dtype)
            if res_weight != 1.0:
                t = t * jnp.asarray(res_weight, dtype)
            res = res + t

        if odd:
            # the collapsed tail consumes packed tensors only for even
            # original widths: unpack, plain after_res_conv, plain tail
            res = packed_exit(res, odd, ww)
            h = packed_exit(h0, odd, ww)
            res = conv(res, sp["after_res_conv"])
            return fast_tail(h + res)
        arc = sp["after_res_conv"]
        kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
        res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
        return fast_tail(h0 + res, packed=True)

    forward.__wrapped_tail__ = fast_tail
    return forward


def packed_mam_gate(t, blk, F, n_pix, dtype):
    """MAM attention on a grid0-packed tensor (reference
    models/mamnet.py:152-173): the channel variance (CSI) combines the
    two column slots' moments, the 1x1 squeeze/excite (ICD) acts on the
    tiny (N,1,1,F) statistics, and the depthwise CSD decomposes via
    depthwise_packed; sigmoid gate multiplies the packed features."""

    def conv(h, p):
        return jax.lax.conv_general_dilated(
            h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["bias"], dtype)

    s1 = jnp.sum(t, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(jnp.square(t.astype(jnp.float32)), axis=(1, 2), keepdims=True)
    s1 = s1[..., :F] + s1[..., F:]
    s2 = s2[..., :F] + s2[..., F:]
    mean = s1.astype(jnp.float32) / n_pix
    var = ((s2 - n_pix * jnp.square(mean)) / max(n_pix - 1, 1)).astype(dtype)
    icd = conv(jax.nn.relu(conv(var, blk["mam"]["du1"])), blk["mam"]["du2"])
    csd = depthwise_packed(t, blk["mam"]["depthwise"]["kernel"], dtype) \
        + pack_bias(jnp.asarray(blk["mam"]["depthwise"]["bias"], dtype))
    gate = jax.nn.sigmoid(jnp.tile(var + icd, (1, 1, 1, 2)) + csd)
    return t * gate


def make_packed_collapsed_mamnet_train_forward(model, dtype=jnp.float32):
    """Differentiable MAMNet forward: width-packed trunk (incl. the MAM
    attention via packed_mam_gate — its variance stats, 1x1 squeeze and
    depthwise CSD are all differentiable packings) + LIVE collapsed tail
    (MAMNet's upsample chain is the same linear conv/PixelShuffle stack
    as EDSR's, reference models/mamnet.py:186-193). Loss/grad-equivalent
    to module.apply; see make_packed_collapsed_edsr_train_forward for
    the motivation and mechanics.
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import (
        apply_collapsed_tail, live_collapsed_edsr_tail)

    mod = model.module
    F = mod.features
    scale = model.scale
    res_weight = float(mod.res_weight)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        n, hh, ww, _ = x.shape
        n_pix = hh * ww
        h0, mask1, mask0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        if odd:
            # the packed MAM variance would see the pad column; keep the
            # odd-width path on the plain graph (callers' training
            # patches are even)
            raise ValueError("packed MAMNet training requires even width")

        res = h0
        for i in range(mod.num_blocks):
            blk = sp["mam_block_%d" % i]
            t = conv_a(res, pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)))
            t = jax.nn.relu(t) * mask1
            t = conv_b(t, pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                       pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)))
            t = packed_mam_gate(t, blk, F, n_pix, dtype)
            if res_weight != 1.0:
                t = t * jnp.asarray(res_weight, dtype)
            res = res + t

        arc = sp["after_res_conv"]
        kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
        res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
        kernel, bias_tile, tail_fn = live_collapsed_edsr_tail(sp, scale, dtype)
        return apply_collapsed_tail(h0 + res, kernel, bias_tile, tail_fn,
                                    scale, packed=True)

    return forward


def make_collapsed_mamnet_train_forward(model, dtype=jnp.float32):
    """Differentiable MAMNet forward: PLAIN trunk + LIVE collapsed tail.

    The fully packed training graph (make_packed_collapsed_mamnet_
    train_forward) measured 5.7x SLOWER than the plain graph on v5e
    (11.1 -> 62.8 ms/step): the decomposed depthwise CSD's backward is
    latency-bound, the dwsr negative result squared (BASELINE.md). The
    tail collapse is orthogonal and keeps its win, so training defaults
    to this variant: trunk exactly as module.apply, upsample chain
    collapsed from live weights (see make_packed_collapsed_edsr_
    train_forward).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import (
        apply_collapsed_tail, live_collapsed_edsr_tail)

    mod = model.module
    F = mod.features
    scale = model.scale
    res_weight = float(mod.res_weight)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, p, groups=1):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            ) + jnp.asarray(p["bias"], dtype)

        n, hh, ww, _ = x.shape
        n_pix = hh * ww
        h = conv(x.astype(dtype) + jnp.asarray(DIV2K_RGB_MEAN, dtype),
                 sp["first_conv"])
        res = h
        for i in range(mod.num_blocks):
            blk = sp["mam_block_%d" % i]
            t = jax.nn.relu(conv(res, blk["conv1"]))
            t = conv(t, blk["conv2"])
            # MAM gate (reference models/mamnet.py:151-172; ddof=1 variance)
            mean = jnp.mean(t, axis=(1, 2), keepdims=True)
            var = jnp.sum(jnp.square(t - mean), axis=(1, 2), keepdims=True) \
                / max(n_pix - 1, 1)
            icd = conv(jax.nn.relu(conv(var, blk["mam"]["du1"])), blk["mam"]["du2"])
            csd = conv(t, blk["mam"]["depthwise"], groups=F)
            t = t * jax.nn.sigmoid(var + icd + csd)
            if res_weight != 1.0:
                t = t * jnp.asarray(res_weight, dtype)
            res = res + t

        res = conv(res, sp["after_res_conv"])
        h = h + res
        kernel, bias_tile, tail_fn = live_collapsed_edsr_tail(sp, scale, dtype)
        return apply_collapsed_tail(h, kernel, bias_tile, tail_fn, scale)

    return forward


def make_int8_mamnet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized MAMNet inference: each MAMBlock's conv pair
    runs int8 through the generic pair runner (kind='none'); the MAM
    attention (variance CSI + 1x1 ICD + depthwise CSD, reference
    models/mamnet.py:152-173), the residual stream, head, and the
    collapsed tail stay bf16. Calibration / accuracy caveats identical
    to make_int8_edsr_forward (NOT float-exact)."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

    packed = make_packed_mamnet_forward(model, dtype=dtype)
    fast_tail = packed.__wrapped_tail__
    mod = model.module
    F = mod.features
    res_weight = float(mod.res_weight)
    sp0 = serialization.to_state_dict(model.params)
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        n, hh, ww, _ = x.shape
        n_pix = hh * ww
        h0, mask1, _m0, _odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        res = h0
        for i in range(mod.num_blocks):
            blk = sp["mam_block_%d" % i]
            t = pair(i, res, blk["conv1"], blk["conv2"], mask1, kind="none")
            t = packed_mam_gate(t, blk, F, n_pix, dtype)
            if res_weight != 1.0:
                t = t * jnp.asarray(res_weight, dtype)
            res = res + t
        arc = sp["after_res_conv"]
        kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
        res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
        return fast_tail(h0 + res, packed=True)

    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0["mam_block_%d" % i]["conv1"], sp0["mam_block_%d" % i]["conv2"])
            for i in range(mod.num_blocks)])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_packed_msrr_forward(model, dtype=jnp.float32):
    """Width-packed forward for the MSRR family (differentiable; used for
    both inference and training). Covers MSRRModule (64ch trunk,
    reference models/msrr.py:214-248), MSRRReducedModule non-depthwise
    (48ch trunk, models/msrr_reduced*.py) and MSRRTestModule (64ch,
    models/msrr_test.py). Depthwise (dwsr) configs raise ValueError and
    fall back to the plain graph: the packed decomposition
    (packed_dw_resblock) is exact but MEASURED 4.4x SLOWER on v5e —
    the half-channel grouped convs are latency-bound (BASELINE.md).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    kind = type(mod).__name__
    if kind == "MSRRReducedModule" and mod.depthwise:
        # exact packed decomposition exists (packed_dw_resblock) but is
        # 4.4x slower on v5e — keep dwsr on the plain graph
        raise ValueError("depthwise blocks do not pack profitably")
    scale = mod.scale
    res_weight = float(mod.res_weight)
    lrelu = get_activation("leaky_relu", 0.1)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, name, p=None):
            p = sp[name] if p is None else p
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        n, hh, ww, _ = x.shape

        if kind == "MSRRReducedModule":
            x_in = x + jnp.asarray(DIV2K_RGB_MEAN, dtype) if mod.base == "meanshift" else x
            head_name = "first_conv"
            head_act = (get_activation(mod.first_activation, mod.slope)
                        if mod.first_activation else None)
            block_act = get_activation(mod.block_activation, mod.slope)
        elif kind == "MSRRModule":
            x_in, head_name, head_act = x, "first_conv", lrelu
            block_act = jax.nn.relu
        elif kind == "MSRRTestModule":
            x_in, head_name, head_act = x, "conv_first", lrelu
            block_act = jax.nn.relu
        else:
            raise ValueError(kind)

        h0, mask1, mask0, odd = packed_entry_head(
            x_in, sp[head_name]["kernel"], sp[head_name]["bias"], dtype)
        if head_act is not None:
            h0 = head_act(h0)  # act(0)=0 for all heads: pad column stays 0

        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            h0 = packed_resblock(
                h0,
                pack_kernel_a(jnp.asarray(blk["conv1"]["kernel"], dtype)),
                pack_bias(jnp.asarray(blk["conv1"]["bias"], dtype)),
                pack_kernel_b(jnp.asarray(blk["conv2"]["kernel"], dtype)),
                pack_bias(jnp.asarray(blk["conv2"]["bias"], dtype)),
                mask1, mask0, res_weight, act=block_act)
            i += 1

        out = packed_exit(h0, odd, ww)

        if kind == "MSRRReducedModule":
            out = pixel_shuffle(out, scale)
            if mod.base == "meanshift":
                return out - jnp.asarray(DIV2K_RGB_MEAN, dtype)
            if mod.base is not None:
                return out + interpolated_base(x, scale, mod.base)
            return out
        if kind == "MSRRModule":
            up, j = sp["upsample"], 0
            stages = []
            while ("conv%d" % j) in up:
                stages.append(up["conv%d" % j])
                j += 1
            for j, stage in enumerate(stages):
                out = pixel_shuffle(conv(out, None, stage), 2 if scale != 3 else 3)
                if j < len(stages) - 1:
                    out = lrelu(out)
            if scale != 3:
                out = lrelu(out)
            out = lrelu(conv(out, "HR_conv"))
            out = conv(out, "final_conv")
            return out + interpolated_base(x, scale, "bilinear")
        # MSRRTestModule
        out = lrelu(pixel_shuffle(conv(out, "upconv1"), 2))
        out = lrelu(pixel_shuffle(conv(out, "upconv2"), 2))
        out = conv(lrelu(conv(out, "HRconv")), "conv_last")
        return out + interpolated_base(x, 4, "bilinear")

    return forward


def _quantize_pair_weights(p1, p2, dtype):
    """Pack + int8-quantize one conv pair (per-output-channel scales)."""
    ka = np.asarray(pack_kernel_a(jnp.asarray(p1["kernel"], jnp.float32)))
    kb = np.asarray(pack_kernel_b(jnp.asarray(p2["kernel"], jnp.float32)))
    sa = np.abs(ka).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    sb = np.abs(kb).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    return dict(
        ka=jnp.asarray(np.rint(ka / sa).astype(np.int8)),
        sa=jnp.asarray(sa, jnp.float32),
        ba=pack_bias(jnp.asarray(p1["bias"], dtype)),
        kb=jnp.asarray(np.rint(kb / sb).astype(np.int8)),
        sb=jnp.asarray(sb, jnp.float32),
        bb=pack_bias(jnp.asarray(p2["bias"], dtype)),
    )


def make_pair_runner(dtype):
    """Returns (pair_bf16, pair_int8, finish_calibration).

    The family walkers (EDSR / LarvaNet / MSRR / ...) call
    `pair(idx, h, p1, p2, mask1, kind, act)` for each conv pair; during
    calibration pair_bf16 records per-site maxima, afterwards
    finish_calibration(pairs) quantizes the weights and pair_int8
    replays the walk W8A8 (quant/dequant fused into conv epilogues).
    kind: 'res' (skip add) | 'none' | 'both' (REGO-style, returns
    (t, hin + t)); act applied between the convs.
    """
    record = {}  # idx -> (input max, mid max); keyed so the calibration
    quant = []   # walk's call order cannot silently diverge from finish()

    def pair_bf16(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
                  res_weight=1.0):
        if idx in record:
            raise ValueError("pair index %d calibrated twice" % idx)
        ka = pack_kernel_a(jnp.asarray(p1["kernel"], dtype))
        ba = pack_bias(jnp.asarray(p1["bias"], dtype))
        kb = pack_kernel_b(jnp.asarray(p2["kernel"], dtype))
        bb = pack_bias(jnp.asarray(p2["bias"], dtype))
        m_in = jnp.max(jnp.abs(hin)).astype(jnp.float32)
        t = act(conv_a(hin, ka, ba)) * mask1
        record[idx] = (m_in, jnp.max(jnp.abs(t)).astype(jnp.float32))
        t = conv_b(t, kb, bb)
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            return t, hin + t
        return hin + t if kind == "res" else t

    def finish_calibration(pairs):
        if sorted(record) != list(range(len(pairs))):
            raise ValueError("calibration walked pair indices %r but finish() "
                             "got %d pairs" % (sorted(record), len(pairs)))
        for i, (p1, p2) in enumerate(pairs):
            q = _quantize_pair_weights(p1, p2, dtype)
            q["s_in"] = float(record[i][0]) * 1.05 / 127.0
            q["s_mid"] = float(record[i][1]) * 1.05 / 127.0
            quant.append(q)

    def pair_int8(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
                  res_weight=1.0):
        q = quant[idx]
        s_in, s_mid = q["s_in"], q["s_mid"]
        xq = jnp.clip(jnp.round(hin.astype(jnp.float32) / s_in),
                      -127, 127).astype(jnp.int8)
        t = jax.lax.conv_general_dilated(
            xq, q["ka"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        t = act((t.astype(jnp.float32) * (s_in * q["sa"])).astype(dtype)
                + q["ba"]) * mask1
        tq = jnp.clip(jnp.round(t.astype(jnp.float32) / s_mid),
                      -127, 127).astype(jnp.int8)
        t = jax.lax.conv_general_dilated(
            tq, q["kb"], (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        t = (t.astype(jnp.float32) * (s_mid * q["sb"])).astype(dtype) + q["bb"]
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            return t, hin + t
        return hin + t if kind == "res" else t

    return pair_bf16, pair_int8, finish_calibration


def make_int8_edsr_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized EDSR inference (serving path, NOT default).

    At the packed conv shape the v5e int8 MXU path sustains 316 TOPS vs
    187 TF/s bf16 (BASELINE.md) — unreachable before packing because
    N=64 underfill capped both dtypes. Scheme: the residual stream stays
    bf16; each ResBlock's two convs run int8 with per-output-channel
    weight scales and per-site static activation scales, quantize /
    dequantize fused into the conv epilogues. Scales are calibrated by
    running the bf16 packed forward once on `calib_batch` (NHWC float32,
    e.g. the first real input batch) and recording per-site maxima.

    Head / after_res_conv / tail stay bf16 (exact). Accuracy: quantized
    SR typically costs ~0.02-0.1 dB — measure on your eval set before
    serving (the default --packed_trunk path is float-exact; this one
    is NOT).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward

    collapsed = make_collapsed_edsr_forward(model, dtype=dtype)
    fast_tail = collapsed.__wrapped_tail__
    res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))
    sp0 = serialization.to_state_dict(model.params)
    n_blocks = len([k for k in sp0 if k.startswith("res_block_")])
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(w, dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, dtype)

        h = x.astype(dtype) + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, _m0, _odd = packed_entry_head(
            h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        res = h0
        for i in range(n_blocks):
            blk = sp["res_block_%d" % i]
            res = pair(i, res, blk["conv1"], blk["conv2"], mask1,
                       res_weight=res_weight)
        arc = sp["after_res_conv"]
        kp, pads = pack_kernel_same(jnp.asarray(arc["kernel"], dtype))
        res = conv_same(res, kp, pads, pack_bias(jnp.asarray(arc["bias"], dtype)))
        return fast_tail(h0 + res, packed=True)

    # eager calibration pass records per-site maxima
    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(sp0["res_block_%d" % i]["conv1"], sp0["res_block_%d" % i]["conv2"])
            for i in range(n_blocks)])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_int8_larvanet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized LarvaNet inference (same scheme as
    make_int8_edsr_forward: per-output-channel weight scales, static
    per-site activation scales from one bf16 pass over `calib_batch`,
    quant/dequant fused into conv epilogues; the residual stream, head,
    pixel shuffle, and bicubic base stay bf16). At the packed 96-channel
    shape int8 sustains 220 TOPS vs 116 TF/s bf16 on v5e (1.9x,
    BASELINE.md). Supports plain-body configs without tail; raises
    ValueError otherwise (callers fall back).
    """
    from flax import serialization

    from larvanet_tpu.models.larvanet import SCALE
    from larvanet_tpu.models.layers import interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    if mod.body_style != "plain" or mod.use_tail:
        raise ValueError("int8 path supports plain-body no-tail configs")
    exits = None
    if getattr(model, "has_early_exit", False):
        exits = int(getattr(model.args, "leg", len(mod.num_blocks)))
        if exits == 0:
            # pure base: nothing to quantize
            return lambda params, x: interpolated_base(
                x.astype(dtype), SCALE, mod.interpolate)
    n_run = exits if exits is not None else len(mod.num_blocks)
    num_blocks = mod.num_blocks

    sp0 = serialization.to_state_dict(model.params)
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)

    pairs = []  # (conv1_subtree, conv2_subtree, kind) in forward order
    for i in range(n_run):
        body = sp0["body_%d" % i]
        for bidx in range(num_blocks[i]):
            pairs.append((body["block_%d" % bidx]["conv1"],
                          body["block_%d" % bidx]["conv2"], "res"))
    if mod.leg_style in ("2conv", "skip"):
        leg = sp0["leg_%d" % (n_run - 1)]
        pairs.append((leg["recon1"], leg["recon2"],
                      "res" if mod.leg_style == "skip" else "none"))
    elif mod.leg_style == "resblock":
        leg = sp0["leg_%d" % (n_run - 1)]
        pairs.append((leg["recon"]["conv1"], leg["recon"]["conv2"], "res"))

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)

        def conv(h, p):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(p["kernel"], dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(p["bias"], dtype)

        x = x.astype(dtype)
        h0, mask1, _m0, _odd = packed_entry_head(
            x, sp["head"]["kernel"], sp["head"]["bias"], dtype)
        fea = h0
        idx = 0
        for i in range(n_run):
            hcur = fea
            for bidx in range(num_blocks[i]):
                hcur = pair(idx, hcur, pairs[idx][0], pairs[idx][1], mask1,
                            kind=pairs[idx][2])
                idx += 1
            fea = fea + hcur
        if mod.leg_style == "none":
            out = fea
        else:
            out = pair(idx, fea, pairs[idx][0], pairs[idx][1], mask1,
                       kind=pairs[idx][2])
        base = interpolated_base(x, SCALE, mod.interpolate)
        return pixel_shuffle(unpack_w(out), SCALE) + base

    # eager calibration pass (jit would turn recorded maxima into tracers)
    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish([(p1, p2) for p1, p2, _k in pairs])

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def make_packed_larvanet_forward(model, dtype=jnp.float32, all_exits=False):
    """Inference-optimized LarvaNet forward with a width-packed trunk.

    all_exits=True returns the training list [leg_0..leg_{M-1} (+ tail)]
    like module.apply(exits='all') — used by the packed TRAINING path:
    the rewrite is differentiable w.r.t. the original parameters (kernel
    packing is pure slicing/concat), so fwd AND bwd convs run at the
    packed 96-channel shapes.

    Exactly equal to the model's _forward_impl (float tolerance). The
    48-channel trunk packs to 96 channels at half width — measured 2.55x
    per conv on v5e (36.9 -> 94.1 useful TF/s; BASELINE.md). Every
    non-V2 topology packs completely: bodies are ResBlocks (two convs)
    and legs are conv pairs ('2conv'/'skip'/'resblock') or empty
    ('none'), so all skip adds stay in grid0. The V2 tail's merge conv
    makes its conv count odd, so the tail runs unpacked (3 convs of the
    whole network; bodies still pack).

    Honors the model's early-exit config (LarvaLeg --leg k, k=0 = pure
    interpolated base, reference LarvaLeg.py:289-299).
    """
    from flax import serialization

    from larvanet_tpu.models.larvanet import SCALE
    from larvanet_tpu.models.layers import interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    num_blocks = mod.num_blocks
    exits = None
    if not all_exits and getattr(model, "has_early_exit", False):
        exits = int(getattr(model.args, "leg", len(num_blocks)))

    def forward(params, x):
        # NOTE: an LR-domain collapsed base (ops/collapsed_tail.
        # make_collapsed_base, sharing the legs' pixel shuffle) measured
        # SLIGHTLY SLOWER here (22.0 -> 21.5 MP/s inference, 208.8 ->
        # 205.5 steps/s training): the phase-sliced resampler's fused
        # VPU passes beat the extra 48-channel LR tensor + border ops.
        # Kept as a tested utility; documented negative result.
        base = interpolated_base(x.astype(dtype), SCALE, mod.interpolate)
        if exits == 0:
            return base
        n_run = exits if exits is not None else len(num_blocks)

        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, jnp.asarray(w, dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, dtype)

        def packed(kind, h, p):  # one packed conv pair from a param subtree
            return packed_resblock(
                h,
                pack_kernel_a(jnp.asarray(p[kind[0]]["kernel"], dtype)),
                pack_bias(jnp.asarray(p[kind[0]]["bias"], dtype)),
                pack_kernel_b(jnp.asarray(p[kind[1]]["kernel"], dtype)),
                pack_bias(jnp.asarray(p[kind[1]]["bias"], dtype)),
                mask1, mask0)

        def conv_pair(h, p1, p2, skip=None):  # conv-relu-conv (+ optional skip)
            t = conv_a(h, pack_kernel_a(jnp.asarray(p1["kernel"], dtype)),
                       pack_bias(jnp.asarray(p1["bias"], dtype)))
            t = jax.nn.relu(t) * mask1
            t = conv_b(t, pack_kernel_b(jnp.asarray(p2["kernel"], dtype)),
                       pack_bias(jnp.asarray(p2["bias"], dtype)))
            if skip is not None:
                t = t + skip
            return t if mask0 is None else t * mask0

        n, hh, ww, _ = x.shape
        fea, mask1, mask0, odd = packed_entry_head(
            x, sp["head"]["kernel"], sp["head"]["bias"], dtype)

        features = []
        res = fea
        for i in range(n_run):
            body = sp["body_%d" % i]
            hcur = fea if mod.body_style == "plain" else res
            for bidx in range(num_blocks[i]):
                hcur = packed(("conv1", "conv2"), hcur, body["block_%d" % bidx])
            if mod.body_style == "plain":
                fea = fea + hcur
            else:
                fea, res = fea + hcur, hcur
            features.append(fea)

        def leg_out(fea, leg):
            if mod.leg_style == "2conv":
                return conv_pair(fea, leg["recon1"], leg["recon2"])
            if mod.leg_style == "skip":
                return conv_pair(fea, leg["recon1"], leg["recon2"], skip=fea)
            if mod.leg_style == "resblock":
                return packed(("conv1", "conv2"), fea, leg["recon"])
            if mod.leg_style == "none":
                return fea
            raise ValueError(mod.leg_style)

        def finish(packed_fea):
            return pixel_shuffle(packed_exit(packed_fea, odd, ww), SCALE) + base

        def tail_out():
            # the 3-conv tail runs unpacked (odd conv count)
            cats = [packed_exit(f, odd, ww) for f in features]
            t = conv(jnp.concatenate(cats, axis=-1),
                     sp["tail_merge"]["kernel"], sp["tail_merge"]["bias"])
            r = conv(t, sp["tail_recon1"]["kernel"], sp["tail_recon1"]["bias"])
            r = jax.nn.relu(r)
            r = conv(r, sp["tail_recon2"]["kernel"], sp["tail_recon2"]["bias"])
            return pixel_shuffle(r, SCALE) + base

        if all_exits:
            # training list: one output per leg (+ tail), module.apply(exits='all')
            outs = [
                finish(leg_out(features[i],
                               sp.get("leg_%d" % i) if mod.leg_style != "none" else None))
                for i in range(n_run)
            ]
            if mod.use_tail:
                outs.append(tail_out())
            return outs

        if mod.use_tail and exits is None:
            # V2 inference exits through the tail (LarvaNetV2.py forward)
            return tail_out()

        leg = sp.get("leg_%d" % (n_run - 1)) if mod.leg_style != "none" else None
        return finish(leg_out(features[-1], leg))

    return forward
