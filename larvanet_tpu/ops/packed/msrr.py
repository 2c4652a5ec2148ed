"""Packed MSRR-family forwards (reference models/msrr*.py,
msrr_test.py): walk + exact/int8 makers. Split out of the former
ops/packed_trunk.py monolith."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    conv_plain, packed_entry_head, packed_exit)
from larvanet_tpu.ops.packed.pairs import (
    _make_int8, _remat_requested, _training_pair)


def _msrr_walk(model, dtype, lr_domain=False):
    """The ONE MSRR-family topology walk (reference models/msrr.py:214-248,
    msrr_reduced*.py, msrr_test.py): packed head + N ResBlock pairs +
    per-kind tail. Returns walk(params, x, pair) — the exact forward,
    the int8 calibration pass and the int8 serving forward all run this
    same function with different pair runners. Depthwise (dwsr) configs
    raise ValueError and fall back to the plain graph: the packed
    decomposition (packed_dw_resblock) is exact but MEASURED 4.4x SLOWER
    on v5e (BASELINE.md).

    lr_domain=True (training use, MSRRReducedModule only — the other
    kinds run HR convs AFTER their shuffles, so there is no trailing
    permutation to commute): pre-shuffle output with base/mean handled
    in the LR domain (see ops/packed/branchy._treenet_walk).
    """
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

    mod = model.module
    kind = type(mod).__name__
    if kind == "MSRRReducedModule" and mod.depthwise:
        raise ValueError("depthwise blocks do not pack profitably")
    if lr_domain and kind != "MSRRReducedModule":
        raise ValueError("lr_domain requires a trailing shuffle "
                         "(MSRRReducedModule only)")
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
            if lr_domain:
                if mod.base == "meanshift":
                    mean_lr = pixel_unshuffle(jnp.broadcast_to(
                        jnp.asarray(DIV2K_RGB_MEAN, dtype),
                        (1, scale, scale, 3)), scale)
                    return out - mean_lr
                if mod.base is not None:
                    return out + pixel_unshuffle(
                        interpolated_base(x, scale, mod.base), scale)
                return out
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


def make_packed_msrr_forward(model, dtype=jnp.float32, qat=False,
                             lr_domain=False):
    """Width-packed forward for the MSRR family (differentiable; used for
    both inference and training). Covers MSRRModule (64ch trunk,
    reference models/msrr.py:214-248), MSRRReducedModule non-depthwise
    (48ch trunk, models/msrr_reduced*.py) and MSRRTestModule (64ch,
    models/msrr_test.py); topology in _msrr_walk. qat=True
    fake-quantizes the trunk pairs with the int8 serving scheme
    (qat_pair); lr_domain=True (training use, MSRRReducedModule only)
    returns the pre-shuffle LR-domain output.
    """
    walk = _msrr_walk(model, dtype, lr_domain=lr_domain)
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
