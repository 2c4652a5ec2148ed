"""Packed forwards for the branchy families: TreeNet, HRSR, REGO,
ebrn_rm (walks + exact/int8 makers). Split out of the former
ops/packed_trunk.py monolith."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    concat_packed_perm, conv_plain, packed_entry_head, packed_exit,
    single_same)
from larvanet_tpu.ops.packed.pairs import (
    _make_int8, _remat_requested, _training_pair)


def _treenet_walk(model, dtype, lr_domain=False):
    """The ONE TreeNet topology walk (reference models/TreeNet.py:226-256):
    packed shared 48ch trunk + per-branch ResBlock runs. Returns
    walk(params, x, pair, branches=0|int|'all') — pair indices are
    common blocks then the selected branch's blocks (the int8 path only
    ever runs branch 0, the reference's inference branch).

    lr_domain=True (training use): every branch returns PRE-SHUFFLE
    (3s² torch-ordered channels) with the interpolated base unshuffled
    ONCE — mean-L1 against pixel_unshuffle(targets) has identical
    per-element grads (pixel_shuffle is a permutation; the EDSR /
    LarvaNet --lr_domain_loss analog, BASELINE.md round-3 anatomy)."""
    from flax import serialization

    from larvanet_tpu.models.layers import get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

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
        base_out = pixel_unshuffle(base, mod.scale) if lr_domain else base

        def run_branch(b):
            h = fea
            for i in range(mod.num_branch_blocks):
                blk = sp["branch_%d_block_%d" % (b, i)]
                h = pair(nc + i, h, blk["conv1"], blk["conv2"], mask1,
                         res_weight=mod.res_weight, mask0=mask0)
            h = packed_exit(h, odd, ww)
            if lr_domain:
                return h + base_out
            return pixel_shuffle(h, mod.scale) + base_out

        if branches == "all":
            return [run_branch(b) for b in range(mod.num_branches)]
        return run_branch(int(branches))

    return walk


def make_packed_treenet_forward(model, dtype=jnp.float32, qat=False,
                                lr_domain=False):
    """Width-packed TreeNet forward (topology in _treenet_walk). Returns
    forward(params, x, branches=0 | int | 'all') mirroring the module's
    signature (validate_tree sweeps branches; training uses 'all').
    Differentiable — used for training too; qat=True fake-quantizes the
    conv pairs with the int8 serving scheme (qat_pair); lr_domain=True
    (training use) returns pre-shuffle LR-domain branch outputs."""
    walk = _treenet_walk(model, dtype, lr_domain=lr_domain)
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


def _rego_walk(model, dtype, lr_domain=False):
    """The ONE REGO-Net / REGO-serial topology walk (reference
    models/REGO-Net.py, REGO-serial.py): the triangular RESBlock
    wavefront runs packed ('both'-kind pairs — blocks return
    (res, x+res)); the diagonal fusion concat happens on packed tensors
    with the fusion convs' kernels input-permuted (concat_packed_perm).
    Only the 3-channel head and the final shuffle/base are unpacked.
    Returns walk(params, x, pair); also exposes walk.pair_order, the
    fixed wavefront visit order used for stable int8 pair indices.
    lr_domain=True (training use): pre-shuffle output + unshuffled base
    (see _treenet_walk)."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

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
        sr = packed_exit(sr, odd, ww)
        base = interpolated_base(x, mod.scale, mod.interpolate)
        if lr_domain:
            return sr + pixel_unshuffle(base, mod.scale)
        return pixel_shuffle(sr, mod.scale) + base

    walk.pair_order = order
    return walk


def make_packed_rego_forward(model, dtype=jnp.float32, qat=False,
                             lr_domain=False):
    """Width-packed REGO-Net / REGO-serial forward (topology in
    _rego_walk). Differentiable — used for training too; qat=True
    fake-quantizes the wavefront pairs with the int8 serving scheme
    (qat_pair); lr_domain=True (training use) returns the pre-shuffle
    LR-domain output."""
    walk = _rego_walk(model, dtype, lr_domain=lr_domain)
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


def _ebrn_rm_walk(model, dtype, lr_domain=False):
    """The ONE ebrn_rm / ebrn_rm_BLI topology walk (reference
    models/ebrn_rm.py): BRM conv pairs ('both' kind — the residual
    stream feeds the next BRM), single-conv fusion cascade
    (grid0->grid0), concat recon conv (input-permuted). Returns
    walk(params, x, pair). The full EBRN (strided ConvTranspose
    back-projection) stays on the plain graph — strides do not fit the
    column-pair grids. lr_domain=True (training use): pre-shuffle output
    with the base unshuffled / the RGB mean as a per-channel LR constant
    (see _treenet_walk)."""
    from flax import serialization

    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN, get_activation, interpolated_base
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

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
        sr = packed_exit(up, odd, ww)
        if lr_domain:
            if mod.bilinear_base:
                return sr + pixel_unshuffle(
                    interpolated_base(x, mod.scale, "bilinear"), mod.scale)
            # the per-RGB mean is spatially constant, so its unshuffled
            # field is a (1,1,1,3s²) per-channel constant
            mean_lr = pixel_unshuffle(jnp.broadcast_to(
                jnp.asarray(DIV2K_RGB_MEAN, dtype),
                (1, mod.scale, mod.scale, 3)), mod.scale)
            return sr - mean_lr
        sr = pixel_shuffle(sr, mod.scale)
        if mod.bilinear_base:
            return sr + interpolated_base(x, mod.scale, "bilinear")
        return sr - jnp.asarray(DIV2K_RGB_MEAN, dtype)

    return walk


def make_packed_ebrn_rm_forward(model, dtype=jnp.float32, qat=False,
                                lr_domain=False):
    """Width-packed ebrn_rm / ebrn_rm_BLI forward (topology in
    _ebrn_rm_walk); only the 3-channel head and the final shuffle are
    unpacked. Differentiable — used for training too; qat=True
    fake-quantizes the BRM pairs with the int8 serving scheme
    (qat_pair); lr_domain=True (training use) returns the pre-shuffle
    LR-domain output."""
    walk = _ebrn_rm_walk(model, dtype, lr_domain=lr_domain)
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
