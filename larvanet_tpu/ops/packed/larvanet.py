"""Packed LarvaNet-family forwards (reference models/LarvaNet.py:205-293
+ variants): walk + exact/int8 makers, early exit, V2 tail. Split out
of the former ops/packed_trunk.py monolith."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    conv_plain, packed_entry_head, packed_exit)
from larvanet_tpu.ops.packed.pairs import (
    _make_int8, _remat_requested, _training_pair)


def _larvanet_walk(model, dtype, all_exits=False, lr_domain=False):
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
            if lr_domain:
                # LR-domain training outputs (--lr_domain_loss): every
                # exit returns PRE-SHUFFLE (3s² torch-ordered channels)
                # with the interpolated base unshuffled ONCE (a forward-
                # only transpose of a no-grad tensor) instead of one
                # pixel_shuffle fwd+bwd per exit. pixel_shuffle is a
                # permutation, so mean-L1 against unshuffled targets has
                # identical per-element grads (tests/test_models.py).
                from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

                base_lr = pixel_unshuffle(base, SCALE)
                outs = [
                    packed_exit(leg_out(features[i], leg_params(i),
                                        n_body_pairs if i == n_run - 1
                                        else -1), odd, ww) + base_lr
                    for i in range(n_run)
                ]
                if mod.use_tail:
                    cats = [packed_exit(f, odd, ww) for f in features]
                    t = conv_plain(jnp.concatenate(cats, axis=-1),
                                   sp["tail_merge"], dtype)
                    r = jax.nn.relu(conv_plain(t, sp["tail_recon1"], dtype))
                    r = conv_plain(r, sp["tail_recon2"], dtype)
                    outs.append(r + base_lr)
                return outs
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
                                 qat=False, lr_domain=False):
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
    scheme (qat_pair). lr_domain=True (training use, with all_exits):
    exits return pre-shuffle LR-domain outputs with the base folded in
    — see the walk's LR-domain branch and models/edsr.py's analog."""
    walk = _larvanet_walk(model, dtype, all_exits=all_exits,
                          lr_domain=lr_domain and all_exits)
    pair = _training_pair(qat, dtype, remat=_remat_requested(model))

    def forward(params, x):
        return walk(params, x, pair)

    return forward


def make_int8_larvanet_forward(model, calib_batch, dtype=jnp.bfloat16):
    """Opt-in W8A8 quantized LarvaNet inference (same scheme as
    make_int8_edsr_forward; the residual stream, head, pixel shuffle,
    and bicubic base stay bf16). At the packed 96-channel shape int8
    sustains 220 TOPS vs 116 TF/s bf16 on v5e (1.9x, BASELINE.md).
    Supports plain-body configs; raises ValueError otherwise (callers
    fall back). V2 tail topologies (LarvaNetV2.py:108-118) quantize the
    body pairs while the 3-conv tail runs unpacked bf16 — the same
    quantize-the-trunk / keep-the-odd-structure-bf16 pattern as
    mamnet's attention. Topology in _larvanet_walk."""
    from flax import serialization

    from larvanet_tpu.models.larvanet import SCALE
    from larvanet_tpu.models.layers import interpolated_base

    mod = model.module
    if mod.body_style != "plain":
        raise ValueError("int8 path supports plain-body configs")
    exits = None
    if getattr(model, "has_early_exit", False):
        exits = int(getattr(model.args, "leg", len(mod.num_blocks)))
        if exits == 0:
            # pure base: nothing to quantize
            return lambda params, x: interpolated_base(
                x.astype(dtype), SCALE, mod.interpolate)
    n_run = exits if exits is not None else len(mod.num_blocks)
    # V2 default inference exits through the TAIL (walk's tail_out):
    # no leg pair executes, so none is calibrated. An explicit --leg k
    # (LarvaLegV2 — early exit never uses the tail, reference
    # LarvaLegV2.py forward) exits through leg k as usual.
    serving_tail = mod.use_tail and exits is None

    sp0 = serialization.to_state_dict(model.params)
    pairs = []
    for i in range(n_run):
        body = sp0["body_%d" % i]
        for bidx in range(mod.num_blocks[i]):
            pairs.append((body["block_%d" % bidx]["conv1"],
                          body["block_%d" % bidx]["conv2"]))
    if serving_tail:
        pass
    elif mod.leg_style in ("2conv", "skip"):
        leg = sp0["leg_%d" % (n_run - 1)]
        pairs.append((leg["recon1"], leg["recon2"]))
    elif mod.leg_style == "resblock":
        leg = sp0["leg_%d" % (n_run - 1)]
        pairs.append((leg["recon"]["conv1"], leg["recon"]["conv2"]))

    return _make_int8(model, calib_batch, dtype,
                      _larvanet_walk(model, dtype), pairs)
