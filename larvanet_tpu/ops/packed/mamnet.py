"""Packed MAMNet forwards (reference models/mamnet.py): walk + MAM
gate + exact/int8/training makers, incl. the documented plain-trunk
training default (the packed depthwise backward is latency-bound on
v5e, BASELINE.md). Split out of the former ops/packed_trunk.py
monolith."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    conv_plain, depthwise_packed, pack_bias, packed_entry_head,
    packed_exit, single_same)
from larvanet_tpu.ops.packed.pairs import _make_int8, exact_pair


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


def make_collapsed_mamnet_train_forward(model, dtype=jnp.float32,
                                        lr_domain=False):
    """Differentiable MAMNet forward: PLAIN trunk + LIVE collapsed tail.

    The fully packed training graph (make_packed_collapsed_mamnet_
    train_forward) measured 5.7x SLOWER than the plain graph on v5e
    (11.1 -> 62.8 ms/step): the decomposed depthwise CSD's backward is
    latency-bound, the dwsr negative result squared (BASELINE.md). The
    tail collapse is orthogonal and keeps its win, so training defaults
    to this variant: trunk exactly as module.apply, upsample chain
    collapsed from live weights (see make_packed_collapsed_edsr_
    train_forward). lr_domain=True returns the pre-shuffle LR-domain
    output (apply_collapsed_tail's lr_domain branch — the EDSR
    --lr_domain_loss analog).
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
        return apply_collapsed_tail(h, kernel, bias_tile, tail_fn, scale,
                                    lr_domain=lr_domain)

    return forward
