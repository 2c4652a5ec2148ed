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


def _edsr_walk(model, dtype, mode, fast_tail=None):
    """The ONE EDSR trunk topology walk (reference models/edsr.py:177-207:
    head conv, N x ResBlock(conv-relu-conv), after_res_conv, global
    skip, linear tail). Returns walk(params, x, pair). `mode` selects
    the tail:

      'baked'          — inference: the precomputed collapsed fast_tail
                         (pass it in); stays packed through
                         after_res_conv for even widths (no 64<->128
                         relayouts, BASELINE.md tail anatomy).
      'live_collapsed' — training: the collapsed tail kernel is
                         re-derived from the CURRENT params in-graph
                         (live_collapsed_edsr_tail) so gradients flow.
      'live_plain'     — training: the original live upsample chain
                         (unpacks right after the trunk, as measured).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    scale = model.scale
    res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)
        ww = x.shape[2]
        h = x.astype(dtype) + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        res = h0
        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            res = pair(i, res, blk["conv1"], blk["conv2"], mask1,
                       res_weight=res_weight, mask0=mask0)
            i += 1

        if mode == "live_plain":
            res = unpack_w(res)
            hh = unpack_w(h0)
            if odd:
                res, hh = res[:, :, :ww], hh[:, :, :ww]
            res = conv_plain(res, sp["after_res_conv"], dtype)
            hh = hh + res
            up, j = sp["upsample"], 0
            while ("conv%d" % j) in up:
                hh = pixel_shuffle(conv_plain(hh, up["conv%d" % j], dtype),
                                   2 if scale != 3 else 3)
                j += 1
            hh = conv_plain(hh, sp["final_conv"], dtype)
            return hh - jnp.asarray(DIV2K_RGB_MEAN, dtype)

        if mode == "live_collapsed":
            from larvanet_tpu.ops.collapsed_tail import (
                apply_collapsed_tail, live_collapsed_edsr_tail)

            kernel, bias_tile, tail_fn = live_collapsed_edsr_tail(sp, scale, dtype)

        if not odd:
            # stay packed through after_res_conv, the global skip, and
            # into the tail's packed conv: crossing the 64<->128-channel
            # tiling boundary costs a full relayout copy each way
            fused, packed = h0 + single_same(res, sp["after_res_conv"], dtype), True
        else:
            res = unpack_w(res)[:, :, :ww]
            hh = unpack_w(h0)[:, :, :ww]
            fused, packed = hh + conv_plain(res, sp["after_res_conv"], dtype), False

        if mode == "baked":
            return fast_tail(fused, packed=True) if packed else fast_tail(fused)
        return apply_collapsed_tail(fused, kernel, bias_tile, tail_fn, scale,
                                    packed=packed)

    return walk


def make_packed_edsr_forward(model, dtype=jnp.float32):
    """Inference-optimized EDSR forward: width-packed trunk + collapsed
    linear tail (topology in _edsr_walk). Exactly equal to
    model.module.apply (float tolerance); measured ~2x faster per trunk
    conv on v5e (BASELINE.md). Any input width (odd W is zero-padded to
    even and masked per block)."""
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward

    fast_tail = make_collapsed_edsr_forward(model, dtype=dtype).__wrapped_tail__
    walk = _edsr_walk(model, dtype, "baked", fast_tail=fast_tail)
    pair = exact_pair(dtype)

    def forward(params, x):
        return walk(params, x, pair)

    forward.__wrapped_tail__ = fast_tail
    return forward


def make_int8_edsr_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized EDSR inference (serving path, NOT default).

    At the packed conv shape the v5e int8 MXU path sustains 316 TOPS vs
    187 TF/s bf16 (BASELINE.md) — unreachable before packing because
    N=64 underfill capped both dtypes. Scheme: the residual stream stays
    bf16; each ResBlock's two convs run int8 with per-output-channel
    weight scales and per-site static activation scales, quantize /
    dequantize fused into the conv epilogues (make_pair_runner). Scales
    come from one bf16 pass over `calib_batch` (NHWC float32).

    Head / after_res_conv / tail stay bf16 (exact). Accuracy: quantized
    SR typically costs ~0.02-0.1 dB — measure on your eval set before
    serving (cli/validate.py --int8_report automates this); the default
    --packed_trunk path is float-exact, this one is NOT. Topology in
    _edsr_walk.
    """
    from flax import serialization

    from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward

    fast_tail = make_collapsed_edsr_forward(model, dtype=dtype).__wrapped_tail__
    walk = _edsr_walk(model, dtype, "baked", fast_tail=fast_tail)
    sp0 = serialization.to_state_dict(model.params)
    n_blocks = len([k for k in sp0 if k.startswith("res_block_")])
    return _make_int8(
        model, calib_batch, dtype, walk,
        [(sp0["res_block_%d" % i]["conv1"], sp0["res_block_%d" % i]["conv2"])
         for i in range(n_blocks)])


def make_packed_edsr_train_forward(model, dtype=jnp.float32, qat=False):
    """Differentiable EDSR forward with a width-packed trunk and the LIVE
    original tail (params train; nothing is baked; topology in
    _edsr_walk mode='live_plain'). Loss/grad-equivalent to module.apply
    — the packing is differentiable slicing/concat — so it drops into
    _compute_loss for ~1.5x faster training steps. qat=True fake-
    quantizes the trunk pairs with the int8 serving scheme (qat_pair)."""
    walk = _edsr_walk(model, dtype, "live_plain")
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_packed_collapsed_edsr_train_forward(model, dtype=jnp.float32,
                                             qat=False):
    """Differentiable EDSR forward: width-packed trunk + LIVE collapsed
    tail (topology in _edsr_walk mode='live_collapsed'). The collapsed
    tail kernel is re-composed from the CURRENT upsample/final-conv
    params inside the graph (ops/collapsed_tail.live_collapsed_edsr_tail,
    a <1%-of-step differentiable delta probe), so training is
    loss/grad-equivalent to module.apply (tests/test_collapsed_tail.py)
    while the 256-channel PixelShuffle transposes disappear from fwd AND
    bwd (139.2 -> 233.5 steps/s, BASELINE.md training table). qat=True
    fake-quantizes the trunk pairs with the int8 serving scheme
    (qat_pair); the live tail stays exact, as at int8 serving."""
    walk = _edsr_walk(model, dtype, "live_collapsed")
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

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


# ---------------------------------------------------------------------------
# Shared family machinery (round-2 dedup, VERDICT r1 weak#1/next#3):
# each model family has ONE topology walker `walk(params, x, pair, ...)`;
# the exact bf16/f32 forward, the int8 calibration pass, and the int8
# serving forward differ only in which `pair` implementation runs the
# conv pairs. No make_int8_* re-implements its packed counterpart's walk.
# ---------------------------------------------------------------------------

def exact_pair(dtype):
    """The float-exact conv-pair runner (same call shape as
    make_pair_runner's pair_bf16/pair_int8; `idx` is unused).

    kind: 'res' (conv-act-conv + skip add), 'none' (no skip),
    'both' (returns (t, hin + t), REGO/ebrn_rm style). mask0 is the
    odd-width grid0 overhang mask (int8 walks never see one — they are
    even-width only by construction).
    """

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        t = conv_a(hin, pack_kernel_a(jnp.asarray(p1["kernel"], dtype)),
                   pack_bias(jnp.asarray(p1["bias"], dtype)))
        t = act(t) * mask1
        t = conv_b(t, pack_kernel_b(jnp.asarray(p2["kernel"], dtype)),
                   pack_bias(jnp.asarray(p2["bias"], dtype)))
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            out = hin + t
            if mask0 is not None:
                t, out = t * mask0, out * mask0
            return t, out
        out = hin + t if kind == "res" else t
        return out if mask0 is None else out * mask0

    return pair


def _ste_round(x):
    """round() with a straight-through gradient (the standard QAT
    estimator: d(round)/dx treated as 1)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _fake_quant(x, s):
    """Symmetric fake-quantization onto the int8 grid with step `s`
    (STE round; the clip's zero gradient outside [-127s, 127s] matches
    the saturation the real int8 path applies)."""
    return _ste_round(jnp.clip(x / s, -127.0, 127.0)) * s


def qat_pair(dtype):
    """Quantization-aware-training conv-pair runner (same call shape as
    exact_pair): emulates make_pair_runner's pair_int8 W8A8 arithmetic
    in float with straight-through rounding, so training learns weights
    robust to the int8 serving path (--int8_trunk).

    Scheme parity with serving: weight scales use the identical
    per-output-channel max|k_packed|/127 rule (_quantize_pair_weights)
    and activation scales the identical 1.05*max/127 headroom — computed
    dynamically per batch and stop_gradient'd (scales are constants
    within a step, the standard QAT recipe; at serving, calibration
    recomputes them statically from a calib batch of the same
    distribution). conv(fq(x), fq(k)) in float equals the int8 conv's
    dequantized int32 accumulation up to float summation order
    (tests/test_qat.py pins the match against the real int8 runner).

    Only the conv pairs that run int8 at serving are fake-quantized;
    heads / tails / residual streams stay exact, mirroring
    make_int8_edsr_forward's scheme. Even width required, like the int8
    path itself.
    """

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        if mask0 is not None:
            raise ValueError(
                "--qat requires an even patch width (the int8 serving "
                "path it trains for is even-width only); got an odd-width "
                "packed walk")
        f32 = jnp.float32
        ka = pack_kernel_a(jnp.asarray(p1["kernel"], f32))
        kb = pack_kernel_b(jnp.asarray(p2["kernel"], f32))
        sa = jax.lax.stop_gradient(
            jnp.max(jnp.abs(ka), axis=(0, 1, 2), keepdims=True)) / 127.0 + 1e-12
        sb = jax.lax.stop_gradient(
            jnp.max(jnp.abs(kb), axis=(0, 1, 2), keepdims=True)) / 127.0 + 1e-12
        s_in = (jax.lax.stop_gradient(jnp.max(jnp.abs(hin))).astype(f32)
                * 1.05 / 127.0 + 1e-12)
        t = conv_a(_fake_quant(hin.astype(f32), s_in).astype(dtype),
                   _fake_quant(ka, sa).astype(dtype),
                   pack_bias(jnp.asarray(p1["bias"], dtype)))
        t = act(t) * mask1
        s_mid = (jax.lax.stop_gradient(jnp.max(jnp.abs(t))).astype(f32)
                 * 1.05 / 127.0 + 1e-12)
        t = conv_b(_fake_quant(t.astype(f32), s_mid).astype(dtype),
                   _fake_quant(kb, sb).astype(dtype),
                   pack_bias(jnp.asarray(p2["bias"], dtype)))
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            return t, hin + t
        return hin + t if kind == "res" else t

    return pair


def remat_pair(pair):
    """Wrap a pair runner in jax.checkpoint: the backward pass recomputes
    each conv pair's activations instead of storing them, so training
    peak memory scales with ONE block instead of the trunk depth — the
    TPU answer to big-patch / full-frame fine-tuning geometries
    (`--remat`; HBM is the budget, MXU recompute is nearly free for
    these conv shapes). Loss/grad-identical to the unwrapped pair;
    forward-only use is unaffected (checkpointing only acts under
    differentiation). Verified by XLA's compiled memory analysis in
    tests/test_remat.py."""

    def wrapped(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
                res_weight=1.0, mask0=None):
        fn = jax.checkpoint(
            lambda h, a, b, m1, m0: pair(idx, h, a, b, m1, kind=kind,
                                         act=act, res_weight=res_weight,
                                         mask0=m0))
        return fn(hin, p1, p2, mask1, mask0)

    return wrapped


def _training_pair(qat, dtype, remat=False):
    """The pair runner a differentiable walk should train through:
    qat_pair when the model opted into --qat, exact_pair otherwise;
    jax.checkpoint-wrapped under --remat."""
    pair = qat_pair(dtype) if qat else exact_pair(dtype)
    return remat_pair(pair) if remat else pair


def _remat_requested(model) -> bool:
    return bool(getattr(getattr(model, "args", None), "remat", 0))


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


def _make_int8(model, calib_batch, dtype, walk, pairs):
    """Shared int8 scaffolding: one eager bf16 calibration pass through
    the family's walk records per-site activation maxima (jit would turn
    them into tracers), finish() quantizes the `pairs` weights, and the
    returned forward replays the SAME walk with the int8 pair runner.
    """
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)
    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish(pairs)

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def _treenet_walk(model, dtype):
    """The ONE TreeNet topology walk (reference models/TreeNet.py:226-256):
    packed shared 48ch trunk + per-branch ResBlock runs. Returns
    walk(params, x, pair, branches=0|int|'all') — pair indices are
    common blocks then the selected branch's blocks (the int8 path only
    ever runs branch 0, the reference's inference branch)."""
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    lrelu = get_activation("leaky_relu", 0.1)
    nc = mod.num_common_blocks

    def walk(params, x, pair, branches=0):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)
        ww = x.shape[2]
        fea, mask1, mask0, odd = packed_entry_head(
            x, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        fea = lrelu(fea)
        for i in range(nc):
            blk = sp["common_block_%d" % i]
            fea = pair(i, fea, blk["conv1"], blk["conv2"], mask1,
                       res_weight=mod.res_weight, mask0=mask0)

        base = interpolated_base(x, mod.scale, mod.interpolate)

        def run_branch(b):
            h = fea
            for i in range(mod.num_branch_blocks):
                blk = sp["branch_%d_block_%d" % (b, i)]
                h = pair(nc + i, h, blk["conv1"], blk["conv2"], mask1,
                         res_weight=mod.res_weight, mask0=mask0)
            h = packed_exit(h, odd, ww)
            return pixel_shuffle(h, mod.scale) + base

        if branches == "all":
            return [run_branch(b) for b in range(mod.num_branches)]
        return run_branch(int(branches))

    return walk


def make_packed_treenet_forward(model, dtype=jnp.float32, qat=False):
    """Width-packed TreeNet forward (topology in _treenet_walk). Returns
    forward(params, x, branches=0 | int | 'all') mirroring the module's
    signature (validate_tree sweeps branches; training uses 'all').
    Differentiable — used for training too; qat=True fake-quantizes the
    conv pairs with the int8 serving scheme (qat_pair)."""
    walk = _treenet_walk(model, dtype)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x, branches=0):
        return walk(params, x, pair, branches=branches)

    return forward


def make_int8_treenet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized TreeNet inference (branch 0, the reference's
    inference path); same scheme and caveats as make_int8_edsr_forward;
    topology in _treenet_walk."""
    from flax import serialization

    mod = model.module
    sp0 = serialization.to_state_dict(model.params)
    names = (["common_block_%d" % i for i in range(mod.num_common_blocks)]
             + ["branch_0_block_%d" % i for i in range(mod.num_branch_blocks)])
    return _make_int8(
        model, calib_batch, dtype, _treenet_walk(model, dtype),
        [(sp0[n]["conv1"], sp0[n]["conv2"]) for n in names])


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


def _hrsr_walk(model, dtype):
    """The ONE HRSR topology walk (reference models/hrsr*.py): packed
    48ch LR ResBlock trunk + plain HR-domain part (3-16ch convs at 16x
    the pixels — too narrow to pack profitably, a tiny share of FLOPs).
    Returns walk(params, x, pair)."""
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    lrelu = get_activation("leaky_relu", 0.1)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)
        ww = x.shape[2]
        h0, mask1, mask0, odd = packed_entry_head(
            x, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        h0 = lrelu(h0)
        for i in range(mod.num_lr_blocks):
            blk = sp["lr_block_%d" % i]
            h0 = pair(i, h0, blk["conv1"], blk["conv2"], mask1,
                      res_weight=mod.res_weight, mask0=mask0)
        out = pixel_shuffle(packed_exit(h0, odd, ww), mod.scale)

        if mod.num_hr_blocks > 0:
            if mod.c3_style:
                for i in range(mod.num_hr_blocks):
                    blk = sp["hr_block_%d" % i]
                    t = conv_plain(jax.nn.relu(conv_plain(out, blk["conv1"], dtype)),
                                   blk["conv2"], dtype)
                    if mod.res_weight != 1.0:
                        t = t * jnp.asarray(mod.res_weight, dtype)
                    out = out + t
            else:
                out = lrelu(conv_plain(out, sp["middle_conv"], dtype))
                for i in range(mod.num_hr_blocks):
                    blk = sp["hr_block_%d" % i]
                    t = jax.nn.relu(conv_plain(out, blk["conv1"], dtype))
                    out = out + conv_plain(t, blk["conv2"], dtype)
        if not mod.c3_style and mod.num_hr_filters != 3:
            out = conv_plain(lrelu(out), sp["final_conv"], dtype)
        return out + interpolated_base(x, mod.scale, mod.interpolate)

    return walk


def make_packed_hrsr_forward(model, dtype=jnp.float32, qat=False):
    """Width-packed HRSR forward (topology in _hrsr_walk).
    Differentiable — used for training too; qat=True fake-quantizes the
    packed LR-trunk pairs with the int8 serving scheme (qat_pair)."""
    walk = _hrsr_walk(model, dtype)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_int8_hrsr_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized HRSR inference: the packed LR trunk runs
    int8; the HR-domain part stays plain bf16. Same scheme and caveats
    as make_int8_edsr_forward; topology in _hrsr_walk."""
    from flax import serialization

    sp0 = serialization.to_state_dict(model.params)
    return _make_int8(
        model, calib_batch, dtype, _hrsr_walk(model, dtype),
        [(sp0["lr_block_%d" % i]["conv1"], sp0["lr_block_%d" % i]["conv2"])
         for i in range(model.module.num_lr_blocks)])


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


def _rego_walk(model, dtype):
    """The ONE REGO-Net / REGO-serial topology walk (reference
    models/REGO-Net.py, REGO-serial.py): the triangular RESBlock
    wavefront runs packed ('both'-kind pairs — blocks return
    (res, x+res)); the diagonal fusion concat happens on packed tensors
    with the fusion convs' kernels input-permuted (concat_packed_perm).
    Only the 3-channel head and the final shuffle/base are unpacked.
    Returns walk(params, x, pair); also exposes walk.pair_order, the
    fixed wavefront visit order used for stable int8 pair indices."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    F = mod.features
    lrelu = get_activation("leaky_relu", 0.1)

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
        x = x.astype(dtype)
        ww = x.shape[2]
        fea, mask1, mask0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["feature_extraction"]["kernel"], sp["feature_extraction"]["bias"],
            dtype)

        def resb(name, hin):
            return pair(index[name], hin, sp[name]["conv1"], sp[name]["conv2"],
                        mask1, kind="both", act=lrelu,
                        res_weight=mod.res_weight, mask0=mask0)

        def fused_conv(p, srcs):
            return single_same(jnp.concatenate(srcs, axis=-1), p, dtype,
                               odd=odd, perm_channels=[F] * len(srcs))

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
                fea = fused_conv(sp["conv_%d" % k], srcs)

        sr = fused_conv(sp["SRrecon"], srcs)
        sr = pixel_shuffle(packed_exit(sr, odd, ww), mod.scale)
        return sr + interpolated_base(x, mod.scale, mod.interpolate)

    walk.pair_order = order
    return walk


def make_packed_rego_forward(model, dtype=jnp.float32, qat=False):
    """Width-packed REGO-Net / REGO-serial forward (topology in
    _rego_walk). Differentiable — used for training too; qat=True
    fake-quantizes the wavefront pairs with the int8 serving scheme
    (qat_pair)."""
    walk = _rego_walk(model, dtype)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_int8_rego_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized REGO inference (same scheme and caveats as
    make_int8_edsr_forward): the triangular wavefront runs int8
    ('both'-kind pairs); the fusion/recon singles stay bf16 packed.
    Topology in _rego_walk."""
    from flax import serialization

    sp0 = serialization.to_state_dict(model.params)
    walk = _rego_walk(model, dtype)
    return _make_int8(
        model, calib_batch, dtype, walk,
        [(sp0[n]["conv1"], sp0[n]["conv2"]) for n in walk.pair_order])


def _ebrn_rm_walk(model, dtype):
    """The ONE ebrn_rm / ebrn_rm_BLI topology walk (reference
    models/ebrn_rm.py): BRM conv pairs ('both' kind — the residual
    stream feeds the next BRM), single-conv fusion cascade
    (grid0->grid0), concat recon conv (input-permuted). Returns
    walk(params, x, pair). The full EBRN (strided ConvTranspose
    back-projection) stays on the plain graph — strides do not fit the
    column-pair grids."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    if type(mod).__name__ != "EBRNRMModule":
        raise ValueError("packed/int8 path supports the ebrn_rm variants only")
    F = mod.features
    lrelu = get_activation("leaky_relu", 0.05)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)
        ww = x.shape[2]
        inp = x if mod.bilinear_base else x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h0, mask1, mask0, odd = packed_entry_head(
            inp, sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)

        out_list = []
        h = h0
        for i in range(mod.num_brms):
            res, out = pair(i, h, sp["brm_%d_conv1" % i], sp["brm_%d_conv2" % i],
                            mask1, kind="both", act=lrelu, mask0=mask0)
            if i < mod.num_brms - 1:
                out_list.append(out)
                h = res  # residual stream feeds the next BRM (ebrn_rm.py forward)

        out_prime_list = [out]
        for i in range(mod.num_brms - 1):
            out = single_same(out + out_list[-(i + 1)], sp["fusion_%d" % i],
                              dtype, odd=odd)
            out_prime_list.append(out)

        cat = jnp.concatenate(out_prime_list, axis=-1)
        up = single_same(cat, sp["upsample_conv"], dtype,
                         perm_channels=[F] * mod.num_brms)
        sr = pixel_shuffle(packed_exit(up, odd, ww), mod.scale)
        if mod.bilinear_base:
            return sr + interpolated_base(x, mod.scale, "bilinear")
        return sr - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    return walk


def make_packed_ebrn_rm_forward(model, dtype=jnp.float32, qat=False):
    """Width-packed ebrn_rm / ebrn_rm_BLI forward (topology in
    _ebrn_rm_walk); only the 3-channel head and the final shuffle are
    unpacked. Differentiable — used for training too; qat=True
    fake-quantizes the BRM pairs with the int8 serving scheme
    (qat_pair)."""
    walk = _ebrn_rm_walk(model, dtype)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_int8_ebrn_rm_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized ebrn_rm inference: the BRM pairs run int8
    ('both'-kind); the fusion cascade and concat recon stay bf16 packed.
    Same scheme and caveats as make_int8_edsr_forward; topology in
    _ebrn_rm_walk."""
    from flax import serialization

    sp0 = serialization.to_state_dict(model.params)
    return _make_int8(
        model, calib_batch, dtype, _ebrn_rm_walk(model, dtype),
        [(sp0["brm_%d_conv1" % i], sp0["brm_%d_conv2" % i])
         for i in range(model.module.num_brms)])


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


def _mamnet_fast_tail(model):
    """Collapsed linear upsample tail baked from the model's CURRENT
    params (inference only; the chain conv->PS->...->final_conv->inverse
    mean shift is linear, reference models/mamnet.py:186-193)."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_tail
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    scale = model.scale
    p0 = serialization.to_state_dict(model.params)

    def tail_fn(h):
        cdt = h.dtype
        up, i, out = p0["upsample"], 0, h
        while ("conv%d" % i) in up:
            out = pixel_shuffle(conv_plain(out, up["conv%d" % i], cdt),
                                2 if scale != 3 else 3)
            i += 1
        out = conv_plain(out, p0["final_conv"], cdt)
        return out - jnp.asarray(DIV2K_RGB_MEAN, cdt)

    n_stages = len([k for k in p0["upsample"] if k.startswith("conv")])
    return make_collapsed_tail(tail_fn, model.module.features, scale,
                               radius=1 + n_stages)


def _mamnet_walk(model, dtype, fast_tail=None, mode="baked"):
    """The ONE MAMNet packed topology walk (reference models/mamnet.py):
    conv pairs ('none' kind) + packed MAM attention (packed_mam_gate) +
    collapsed tail. Returns walk(params, x, pair). mode='baked' uses the
    precomputed fast_tail (inference); mode='live_collapsed' re-derives
    the collapsed tail from the CURRENT params in-graph (training;
    even widths only — the packed MAM variance would otherwise see the
    pad column, and training patches are even)."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

    mod = model.module
    F = mod.features
    res_weight = float(mod.res_weight)

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)
        n, hh, ww, _ = x.shape
        n_pix = hh * ww
        h0, mask1, mask0, odd = packed_entry_head(
            x + jnp.asarray(DIV2K_RGB_MEAN, dtype),
            sp["first_conv"]["kernel"], sp["first_conv"]["bias"], dtype)
        if odd and mode == "live_collapsed":
            raise ValueError("packed MAMNet training requires even width")

        res = h0
        for i in range(mod.num_blocks):
            blk = sp["mam_block_%d" % i]
            # mask0 zeroes the pad-column slot BEFORE the gate so the
            # channel-variance sums see only real pixels (n_pix already
            # counts only those)
            t = pair(i, res, blk["conv1"], blk["conv2"], mask1, kind="none",
                     mask0=mask0)
            t = packed_mam_gate(t, blk, F, n_pix, dtype)
            if res_weight != 1.0:
                t = t * jnp.asarray(res_weight, dtype)
            res = res + t

        if mode == "live_collapsed":
            from larvanet_tpu.ops.collapsed_tail import (
                apply_collapsed_tail, live_collapsed_edsr_tail)

            fused = h0 + single_same(res, sp["after_res_conv"], dtype)
            kernel, bias_tile, tail_fn = live_collapsed_edsr_tail(
                sp, model.scale, dtype)
            return apply_collapsed_tail(fused, kernel, bias_tile, tail_fn,
                                        model.scale, packed=True)

        if odd:
            # the collapsed tail consumes packed tensors only for even
            # original widths: unpack, plain after_res_conv, plain tail
            res = packed_exit(res, odd, ww)
            h = packed_exit(h0, odd, ww)
            res = conv_plain(res, sp["after_res_conv"], dtype)
            return fast_tail(h + res)
        res = single_same(res, sp["after_res_conv"], dtype)
        return fast_tail(h0 + res, packed=True)

    return walk


def make_packed_mamnet_forward(model, dtype=jnp.float32):
    """Width-packed MAMNet forward (topology in _mamnet_walk): the conv
    pairs pack as usual; the MAM attention runs packed too — the channel
    variance combines the two column slots' moments, the 1x1
    squeeze/excite acts on the tiny (N,1,1,C) statistics, and the
    depthwise conv uses depthwise_packed. The linear upsample tail is
    collapsed and consumes the packed features directly. Inference only
    (uses baked tail params)."""
    fast_tail = _mamnet_fast_tail(model)
    walk = _mamnet_walk(model, dtype, fast_tail)
    pair = exact_pair(dtype)

    def forward(params, x):
        return walk(params, x, pair)

    forward.__wrapped_tail__ = fast_tail
    return forward


def make_int8_mamnet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized MAMNet inference: each MAMBlock's conv pair
    runs int8 ('none' kind); the MAM attention (variance CSI + 1x1 ICD +
    depthwise CSD, reference models/mamnet.py:152-173), the residual
    stream, head, and the collapsed tail stay bf16. Calibration /
    accuracy caveats identical to make_int8_edsr_forward (NOT
    float-exact). Topology in _mamnet_walk."""
    from flax import serialization

    sp0 = serialization.to_state_dict(model.params)
    walk = _mamnet_walk(model, dtype, _mamnet_fast_tail(model))
    return _make_int8(
        model, calib_batch, dtype, walk,
        [(sp0["mam_block_%d" % i]["conv1"], sp0["mam_block_%d" % i]["conv2"])
         for i in range(model.module.num_blocks)])


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
    to module.apply; topology in _mamnet_walk mode='live_collapsed'.
    NOTE: measured 5.7x SLOWER than the plain graph on v5e (the
    decomposed depthwise backward is latency-bound, BASELINE.md) — the
    training default is make_collapsed_mamnet_train_forward.
    """
    walk = _mamnet_walk(model, dtype, mode="live_collapsed")
    pair = exact_pair(dtype)

    def forward(params, x):
        return walk(params, x, pair)

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


def _msrr_walk(model, dtype):
    """The ONE MSRR-family topology walk (reference models/msrr.py:214-248,
    msrr_reduced*.py, msrr_test.py): packed head + N ResBlock pairs +
    per-kind tail. Returns walk(params, x, pair) — the exact forward,
    the int8 calibration pass and the int8 serving forward all run this
    same function with different pair runners. Depthwise (dwsr) configs
    raise ValueError and fall back to the plain graph: the packed
    decomposition (packed_dw_resblock) is exact but MEASURED 4.4x SLOWER
    on v5e (BASELINE.md).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    mod = model.module
    kind = type(mod).__name__
    if kind == "MSRRReducedModule" and mod.depthwise:
        raise ValueError("depthwise blocks do not pack profitably")
    scale = mod.scale
    res_weight = float(mod.res_weight)
    lrelu = get_activation("leaky_relu", 0.1)
    if kind == "MSRRReducedModule":
        head_name = "first_conv"
        head_act = (get_activation(mod.first_activation, mod.slope)
                    if mod.first_activation else None)
        block_act = get_activation(mod.block_activation, mod.slope)
    elif kind == "MSRRModule":
        head_name, head_act, block_act = "first_conv", lrelu, jax.nn.relu
    elif kind == "MSRRTestModule":
        head_name, head_act, block_act = "conv_first", lrelu, jax.nn.relu
    else:
        raise ValueError(kind)
    n_blocks = len([k for k in serialization.to_state_dict(model.params)
                    if k.startswith("res_block_")])

    def walk(params, x, pair):
        sp = serialization.to_state_dict(params)
        x = x.astype(dtype)
        ww = x.shape[2]
        x_in = (x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
                if kind == "MSRRReducedModule" and mod.base == "meanshift" else x)
        h0, mask1, mask0, odd = packed_entry_head(
            x_in, sp[head_name]["kernel"], sp[head_name]["bias"], dtype)
        if head_act is not None:
            h0 = head_act(h0)  # act(0)=0 for all heads: pad column stays 0
        for i in range(n_blocks):
            blk = sp["res_block_%d" % i]
            h0 = pair(i, h0, blk["conv1"], blk["conv2"], mask1,
                      act=block_act, res_weight=res_weight, mask0=mask0)
        out = packed_exit(h0, odd, ww)

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
                stages.append(up["conv%d" % j])
                j += 1
            for j, stage in enumerate(stages):
                out = pixel_shuffle(conv_plain(out, stage, dtype), 2 if scale != 3 else 3)
                if j < len(stages) - 1:
                    out = lrelu(out)
            if scale != 3:
                out = lrelu(out)
            out = lrelu(conv_plain(out, sp["HR_conv"], dtype))
            out = conv_plain(out, sp["final_conv"], dtype)
            return out + interpolated_base(x, scale, "bilinear")
        # MSRRTestModule
        out = lrelu(pixel_shuffle(conv_plain(out, sp["upconv1"], dtype), 2))
        out = lrelu(pixel_shuffle(conv_plain(out, sp["upconv2"], dtype), 2))
        out = conv_plain(lrelu(conv_plain(out, sp["HRconv"], dtype)), sp["conv_last"], dtype)
        return out + interpolated_base(x, 4, "bilinear")

    return walk


def make_packed_msrr_forward(model, dtype=jnp.float32, qat=False):
    """Width-packed forward for the MSRR family (differentiable; used for
    both inference and training). Covers MSRRModule (64ch trunk,
    reference models/msrr.py:214-248), MSRRReducedModule non-depthwise
    (48ch trunk, models/msrr_reduced*.py) and MSRRTestModule (64ch,
    models/msrr_test.py); topology in _msrr_walk. qat=True
    fake-quantizes the trunk pairs with the int8 serving scheme
    (qat_pair).
    """
    walk = _msrr_walk(model, dtype)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_int8_msrr_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized MSRR-family inference (same scheme and
    caveats as make_int8_edsr_forward; topology in _msrr_walk)."""
    from flax import serialization

    sp0 = serialization.to_state_dict(model.params)
    n_blocks = len([k for k in sp0 if k.startswith("res_block_")])
    return _make_int8(
        model, calib_batch, dtype, _msrr_walk(model, dtype),
        [(sp0["res_block_%d" % i]["conv1"], sp0["res_block_%d" % i]["conv2"])
         for i in range(n_blocks)])


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
                  res_weight=1.0, mask0=None):
        if mask0 is not None:
            raise ValueError("int8 calibration requires even width (no mask0)")
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
                  res_weight=1.0, mask0=None):
        if mask0 is not None:
            raise ValueError("int8 trunk requires even width (no mask0)")
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


def _larvanet_walk(model, dtype, all_exits=False):
    """The ONE LarvaNet-family topology walk (reference
    models/LarvaNet.py:205-293 + variants): packed head, per-body
    ResBlock pairs with module-level skip (plain or dual-stream 'res'
    body style), per-leg conv pairs ('2conv'/'skip'/'resblock'/'none'),
    optional unpacked V2 tail, early exit (--leg, LarvaLeg.py:289-299).
    Returns walk(params, x, pair). Pair indices: body blocks in
    execution order, then index n_body_pairs for the SERVING leg (the
    final executed one) — the layout make_int8_larvanet_forward
    calibrates; other legs (exact all_exits mode only) get index -1,
    which exact_pair ignores.
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
    n_run_static = exits if exits is not None else len(num_blocks)
    n_body_pairs = sum(num_blocks[:n_run_static])

    def walk(params, x, pair):
        # NOTE: an LR-domain collapsed base (ops/collapsed_tail.
        # make_collapsed_base, sharing the legs' pixel shuffle) measured
        # SLIGHTLY SLOWER here (22.0 -> 21.5 MP/s inference, 208.8 ->
        # 205.5 steps/s training): the phase-sliced resampler's fused
        # VPU passes beat the extra 48-channel LR tensor + border ops.
        # Kept as a tested utility; documented negative result.
        x = x.astype(dtype)
        base = interpolated_base(x, SCALE, mod.interpolate)
        if exits == 0:
            return base
        n_run = n_run_static

        sp = serialization.to_state_dict(params)
        ww = x.shape[2]
        fea, mask1, mask0, odd = packed_entry_head(
            x, sp["head"]["kernel"], sp["head"]["bias"], dtype)

        features = []
        res = fea
        idx = 0
        for i in range(n_run):
            body = sp["body_%d" % i]
            hcur = fea if mod.body_style == "plain" else res
            for bidx in range(num_blocks[i]):
                blk = body["block_%d" % bidx]
                hcur = pair(idx, hcur, blk["conv1"], blk["conv2"], mask1,
                            mask0=mask0)
                idx += 1
            if mod.body_style == "plain":
                fea = fea + hcur
            else:
                fea, res = fea + hcur, hcur
            features.append(fea)

        def leg_out(fea, leg, leg_idx):
            # mask0 (odd-width grid0 overhang) is never needed on a leg
            # output: it goes straight to finish(), whose packed_exit
            # crops the pad column. Passing it would also shape-mismatch
            # the w64 narrowing leg (recon2 outputs 2*48=96 channels vs
            # the trunk's 2C mask).
            if mod.leg_style == "2conv":
                return pair(leg_idx, fea, leg["recon1"], leg["recon2"], mask1,
                            kind="none", mask0=None)
            if mod.leg_style == "skip":
                return pair(leg_idx, fea, leg["recon1"], leg["recon2"], mask1,
                            kind="res", mask0=None)
            if mod.leg_style == "resblock":
                return pair(leg_idx, fea, leg["recon"]["conv1"],
                            leg["recon"]["conv2"], mask1, kind="res", mask0=None)
            if mod.leg_style == "none":
                return fea
            raise ValueError(mod.leg_style)

        def finish(packed_fea):
            return pixel_shuffle(packed_exit(packed_fea, odd, ww), SCALE) + base

        def tail_out():
            # the V2 tail's 3 convs run unpacked (odd conv count)
            cats = [packed_exit(f, odd, ww) for f in features]
            t = conv_plain(jnp.concatenate(cats, axis=-1), sp["tail_merge"], dtype)
            r = jax.nn.relu(conv_plain(t, sp["tail_recon1"], dtype))
            r = conv_plain(r, sp["tail_recon2"], dtype)
            return pixel_shuffle(r, SCALE) + base

        def leg_params(i):
            return sp.get("leg_%d" % i) if mod.leg_style != "none" else None

        if all_exits:
            # training list: one output per leg (+ tail), module.apply(exits='all')
            outs = [
                finish(leg_out(features[i], leg_params(i),
                               n_body_pairs if i == n_run - 1 else -1))
                for i in range(n_run)
            ]
            if mod.use_tail:
                outs.append(tail_out())
            return outs

        if mod.use_tail and exits is None:
            # V2 inference exits through the tail (LarvaNetV2.py forward)
            return tail_out()

        return finish(leg_out(features[-1], leg_params(n_run - 1), n_body_pairs))

    return walk


def make_packed_larvanet_forward(model, dtype=jnp.float32, all_exits=False,
                                 qat=False):
    """Inference-optimized LarvaNet forward with a width-packed trunk
    (topology in _larvanet_walk).

    all_exits=True returns the training list [leg_0..leg_{M-1} (+ tail)]
    like module.apply(exits='all') — used by the packed TRAINING path:
    the rewrite is differentiable w.r.t. the original parameters (kernel
    packing is pure slicing/concat), so fwd AND bwd convs run at the
    packed 96-channel shapes.

    Exactly equal to the model's _forward_impl (float tolerance). The
    48-channel trunk packs to 96 channels at half width — measured 2.55x
    per conv on v5e (36.9 -> 94.1 useful TF/s; BASELINE.md). Every
    non-V2 topology packs completely; the V2 tail runs unpacked (3 convs
    of the whole network). Honors the model's early-exit config
    (LarvaLeg --leg k, k=0 = pure interpolated base). qat=True (training
    use) fake-quantizes every body/leg conv pair with the int8 serving
    scheme (qat_pair)."""
    walk = _larvanet_walk(model, dtype, all_exits=all_exits)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_int8_larvanet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized LarvaNet inference (same scheme as
    make_int8_edsr_forward; the residual stream, head, pixel shuffle,
    and bicubic base stay bf16). At the packed 96-channel shape int8
    sustains 220 TOPS vs 116 TF/s bf16 on v5e (1.9x, BASELINE.md).
    Supports plain-body configs without tail; raises ValueError
    otherwise (callers fall back). Topology in _larvanet_walk."""
    from flax import serialization

    from larvanet_tpu.models.larvanet import SCALE
    from larvanet_tpu.models.layers import interpolated_base

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

    sp0 = serialization.to_state_dict(model.params)
    pairs = []
    for i in range(n_run):
        body = sp0["body_%d" % i]
        for bidx in range(mod.num_blocks[i]):
            pairs.append((body["block_%d" % bidx]["conv1"],
                          body["block_%d" % bidx]["conv2"]))
    if mod.leg_style in ("2conv", "skip"):
        leg = sp0["leg_%d" % (n_run - 1)]
        pairs.append((leg["recon1"], leg["recon2"]))
    elif mod.leg_style == "resblock":
        leg = sp0["leg_%d" % (n_run - 1)]
        pairs.append((leg["recon"]["conv1"], leg["recon"]["conv2"]))

    return _make_int8(model, calib_batch, dtype,
                      _larvanet_walk(model, dtype), pairs)
