"""Packed forwards for the lightweight families: full EBRN and IMDN
(single exact makers; these families route int8 via their reduced
variants). Split out of the former ops/packed_trunk.py monolith."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    _grid1_to_grid0_identity, concat_packed_perm, conv_a, conv_b,
    conv_same, grid1_mask, pack_bias, pack_kernel_a, pack_kernel_b,
    pack_kernel_same, pack_w, packed_entry_head, packed_exit,
    packed_prelu, unpack_w)


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
