"""Packed EDSR forwards (reference models/edsr.py:177-207): the one
topology walk + exact / int8 / training makers. Split out of the former
ops/packed_trunk.py monolith."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    conv_plain, packed_entry_head, single_same, unpack_w)
from larvanet_tpu.ops.packed.pairs import (
    _make_int8, _remat_requested, _training_pair, exact_pair)


def _edsr_walk(model, dtype, mode, fast_tail=None, lr_domain=False):
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
                                    packed=packed, lr_domain=lr_domain)

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
                                             qat=False, lr_domain=False):
    """Differentiable EDSR forward: width-packed trunk + LIVE collapsed
    tail (topology in _edsr_walk mode='live_collapsed'). The collapsed
    tail kernel is re-composed from the CURRENT upsample/final-conv
    params inside the graph (ops/collapsed_tail.live_collapsed_edsr_tail,
    a <1%-of-step differentiable delta probe), so training is
    loss/grad-equivalent to module.apply (tests/test_collapsed_tail.py)
    while the 256-channel PixelShuffle transposes disappear from fwd AND
    bwd (139.2 -> 233.5 steps/s, BASELINE.md training table). qat=True
    fake-quantizes the trunk pairs with the int8 serving scheme
    (qat_pair); the live tail stays exact, as at int8 serving.

    lr_domain=True returns the PRE-SHUFFLE LR-domain output (3s²
    torch-ordered channels, all biases included): mean-L1 training loss
    against pixel_unshuffle(targets) is then numerically the HR loss
    (pixel_shuffle is a permutation; per-element grads identical), and
    the output depth-to-space transpose leaves the step's fwd AND bwd
    — the train-step anatomy's largest non-conv cost (BASELINE.md
    round-3 train anatomy)."""
    walk = _edsr_walk(model, dtype, "live_collapsed", lr_domain=lr_domain)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward
