"""The LarvaNet multi-exit family, TPU-native.

One configurable Flax module covers all nine reference variants
(reference models/LarvaNet.py, LarvaNet_{0c,1c,4c,skip,res}.py,
LarvaNetV2.py, LarvaLeg.py, LarvaLegV2.py — each of which is a full
file-copy in the reference; here they are config presets):

  head: conv 3->48 (0.1-scaled Kaiming init, models/LarvaNet.py:223-233)
  body_i: num_blocks[i] ResBlocks + module-level skip (:236-248)
          ('res' style: dual (fea, res) streams, LarvaNet_res.py:236-248)
  leg_i:  reconstruction -> PixelShuffle(4) 48->3 -> + interpolated base
          (:251-267); leg styles: '2conv' (default), 'none' (0c),
          'resblock' (1c), 'skip' (recon(x)+x, LarvaNet_skip.py:262-263)
  tail:   concat all body features -> merge conv -> 2conv recon ->
          PixelShuffle(4) -> + base (V2 only, LarvaNetV2.py LarvaTail)

Multi-exit training: the reference loops over modules in Python doing one
backward over the summed loss (models/LarvaNet.py:101-109). Here all
exits are computed in a single jitted graph — XLA sees one fused
forward+backward over the whole trunk, sharing body activations between
exits.

Training is volume-driven (models/LarvaNet.py:119-124): validation +
checkpoint + ReduceLROnPlateau(max, abs) every `--val_volume` bytes of
consumed input pixels.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import (
    SRModel,
    add_qat_flag,
    chw_list_to_nhwc,
    l1_loss,
    qat_requested,
)
from larvanet_tpu.models.layers import (
    ResBlock,
    conv3x3,
    kaiming_normal_scaled,
    interpolated_base,
)
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

FEATURES = 48  # fixed trunk width (reference models/LarvaNet.py:226,239,254)
SCALE = 4  # legs are PixelShuffle(4): 48 -> 3 channels


class _Leg(nn.Module):
    """Per-module early-exit head.

    The '2conv' recon2 always outputs 3*SCALE² = 48 shuffle channels —
    identical to the reference when features == 48 (where FEATURES
    coincides with 3*SCALE²), and what makes the wider w64 trunk's legs
    work (64 -> 48 -> PixelShuffle(4))."""

    style: str = "2conv"  # '2conv' | 'none' | 'resblock' | 'skip'
    features: int = FEATURES

    @nn.compact
    def __call__(self, fea, base):
        kinit = kaiming_normal_scaled(0.1)
        if self.style == "2conv" or self.style == "skip":
            r = conv3x3(self.features, name="recon1", kernel_init=kinit)(fea)
            r = jax.nn.relu(r)
            r = conv3x3(3 * SCALE * SCALE, name="recon2", kernel_init=kinit)(r)
            fea = r + fea if self.style == "skip" else r
        elif self.style == "resblock":
            fea = ResBlock(self.features, init_scale=0.1, name="recon")(fea)
        elif self.style == "none":
            pass
        else:
            raise ValueError(self.style)
        out = pixel_shuffle(fea, SCALE)
        return out + base


class _Body(nn.Module):
    num_blocks: int
    style: str = "plain"  # 'plain' | 'res'
    features: int = FEATURES

    @nn.compact
    def __call__(self, fea, res=None):
        h = fea if self.style == "plain" else res
        for i in range(self.num_blocks):
            h = ResBlock(self.features, init_scale=0.1, name="block_%d" % i)(h)
        if self.style == "plain":
            return fea + h
        return fea + h, h  # LarvaNet_res: (fea + res', res')


class LarvaNetModule(nn.Module):
    num_blocks: Tuple[int, ...] = (16, 16)
    interpolate: str = "bicubic"
    leg_style: str = "2conv"
    body_style: str = "plain"
    use_tail: bool = False
    features: int = FEATURES

    @nn.compact
    def __call__(self, x, exits: Union[str, int] = "last"):
        """exits: 'last' (inference), 'all' (multi-exit training: returns a
        list of per-leg outputs, + tail output last if use_tail), or an int
        k for early exit through leg k-1 (k=0 returns the pure base,
        reference LarvaLeg.py:289-299)."""
        if self.features != 3 * SCALE * SCALE and self.leg_style != "2conv":
            # non-2conv legs shuffle the trunk tensor directly, which
            # only works at the 48-channel reference width
            raise ValueError(
                "leg_style %r requires the 48-channel trunk (features=%d)"
                % (self.leg_style, self.features))
        m = len(self.num_blocks)
        base = interpolated_base(x, SCALE, self.interpolate)
        if isinstance(exits, int) and exits == 0:
            return base

        head = conv3x3(self.features, name="head",
                       kernel_init=kaiming_normal_scaled(0.1))
        fea = head(x)

        n_run = exits if isinstance(exits, int) else m
        bodies = [
            _Body(self.num_blocks[i], style=self.body_style,
                  features=self.features, name="body_%d" % i)
            for i in range(m)
        ]
        legs = [_Leg(style=self.leg_style, features=self.features,
                     name="leg_%d" % i) for i in range(m)]
        tail_mods = None
        if self.use_tail:
            kinit = kaiming_normal_scaled(0.1)
            tail_mods = dict(
                merge=conv3x3(self.features, name="tail_merge", kernel_init=kinit),
                recon1=conv3x3(self.features, name="tail_recon1", kernel_init=kinit),
                recon2=conv3x3(3 * SCALE * SCALE, name="tail_recon2",
                               kernel_init=kinit),
            )

        outputs = []
        features = []
        res = fea
        want_last_leg = exits == "all" or isinstance(exits, int) or not self.use_tail
        for i in range(n_run):
            if self.body_style == "res":
                fea, res = bodies[i](fea, res)
            else:
                fea = bodies[i](fea)
            features.append(fea)
            if exits == "all" or (i == n_run - 1 and want_last_leg):
                outputs.append(legs[i](fea, base))

        # Early exit never uses the tail (reference LarvaLegV2.py forward
        # routes --leg exits through body legs even when a tail exists).
        if self.use_tail and not isinstance(exits, int):
            cat = jnp.concatenate(features, axis=-1)
            t = tail_mods["merge"](cat)
            r = tail_mods["recon1"](t)
            r = jax.nn.relu(r)
            r = tail_mods["recon2"](r)
            tail_out = pixel_shuffle(r, SCALE) + base
            # V2 inference exits through the tail (LarvaNetV2.py forward).
            outputs.append(tail_out)

        if exits == "all":
            return outputs
        return outputs[-1]


class LarvaNetBase(SRModel):
    """Shared wrapper: volume-driven AdamW training with plateau LR."""

    optimizer_kind = "adamw"
    loss = staticmethod(l1_loss)
    supported_scales = (2, 3, 4)  # reference validates these, then trains x4 only

    # preset knobs overridden by variants
    leg_style = "2conv"
    body_style = "plain"
    use_tail = False
    has_early_exit = False
    trunk_features = FEATURES
    width_flag = False  # w64: expose --num_features
    default_lr = 4e-4
    default_val_volume = 30e9
    default_min_lr = 1e-8
    default_patience = 3
    default_cooldown: Optional[int] = 6  # None => no --cooldown flag (variant files)

    def __init__(self):
        super().__init__()
        self.scheduler = None

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_modules", type=int, default=2,
                            help="The number of residual blocks at LR domain.")
        parser.add_argument("--num_blocks", type=str, default="16",
                            help="The number of residual blocks at HR domain.")
        if self.has_early_exit:
            parser.add_argument("--leg", type=int, default=4,
                                help="The early exit leg number, starts at 1.")
        if self.width_flag:
            parser.add_argument("--num_features", type=int,
                                default=self.trunk_features,
                                help="Trunk width (the w64 variant packs to "
                                     "2C=128 channels — a full MXU lane tile).")
        parser.add_argument("--interpolate", type=str, default="bicubic",
                            help="Interpolation method.")
        parser.add_argument("--val_volume", type=float, default=self.default_val_volume,
                            help="How much volume need for validation.")
        parser.add_argument("--lr", type=float, default=self.default_lr,
                            help="Initial learning rate.")
        parser.add_argument("--lr_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--lr_step", type=int, default=20000,
                            help="Learning rate decay step.")
        parser.add_argument("--threshold", type=float, default=0.001,
                            help="Threshold for measuring the new optimum.")
        parser.add_argument("--min_lr", type=float, default=self.default_min_lr,
                            help="Minimum learning rate.")
        parser.add_argument("--patience", type=int, default=self.default_patience,
                            help="patience for lr scheduler")
        if self.default_cooldown is not None:
            parser.add_argument("--cooldown", type=int, default=self.default_cooldown,
                                help="cooldown for lr scheduler")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed trunk for training and inference "
                                 "(exact reparametrization, ~2x per conv on TPU; "
                                 "ops/packed_trunk.py). 0 = plain module graph.")
        parser.add_argument("--lr_domain_loss", type=int, default=1,
                            help="With --packed_trunk: compute every exit's "
                                 "training L1 loss PRE-SHUFFLE in the LR domain "
                                 "(targets pixel-unshuffled instead; mean-L1 is "
                                 "permutation-invariant — identical per-element "
                                 "grads, loss equal up to f32 summation order). "
                                 "0 = HR-domain loss (bitwise-historical).")
        add_qat_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def _block_list(self) -> Tuple[int, ...]:
        blocks = tuple(int(b) for b in str(self.args.num_blocks).split(","))
        if len(blocks) != self.args.num_modules:
            raise ValueError(
                "Argument num_blocks should have the same number of elements as num_modules."
            )
        return blocks

    def build_module(self):
        return LarvaNetModule(
            num_blocks=self._block_list(),
            interpolate=self.args.interpolate,
            leg_style=self.leg_style,
            body_style=self.body_style,
            use_tail=self.use_tail,
            features=getattr(self.args, "num_features", self.trunk_features),
        )

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_all = None
        self._packed_infer = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)
        if is_training:
            from larvanet_tpu.train.schedules import ReduceLROnPlateau

            self.scheduler = ReduceLROnPlateau(
                lr=self.args.lr,
                factor=self.args.lr_decay,
                patience=self.args.patience,
                cooldown=getattr(self.args, "cooldown", 0),
                threshold=self.args.threshold,
                min_lr=self.args.min_lr,
                mode="max",
            )

    def get_learning_rate(self):
        return self.scheduler.lr if self.scheduler is not None else self.args.lr

    def _init_variables(self, rng, dummy):
        # exits='all' materializes every leg (+ tail) parameter; the
        # default 'last' path would lazily create only the final exit.
        return self.module.init(rng, dummy, exits="all")

    # -- multi-exit loss in one jitted graph --------------------------------
    def _all_exits(self, params, inputs):
        """Every leg (+ tail) output; the width-packed graph when enabled
        (exact reparametrization — fwd and bwd convs run at 2x width)."""
        if getattr(self.args, "packed_trunk", 0):
            if getattr(self, "_packed_all", None) is None:
                from larvanet_tpu.ops.packed_trunk import make_packed_larvanet_forward

                self._packed_all = make_packed_larvanet_forward(
                    self, all_exits=True, qat=qat_requested(self),
                    lr_domain=self._lr_domain_loss())
            return self._packed_all(params, inputs)
        return self.module.apply({"params": params}, inputs, exits="all")

    def _lr_domain_loss(self) -> bool:
        return bool(getattr(self.args, "packed_trunk", 0)
                    and getattr(self.args, "lr_domain_loss", 0))

    def _compute_loss(self, params, inputs, targets):
        if self._lr_domain_loss():
            # every exit is pre-shuffle LR-domain (base folded in); the
            # targets unshuffle ONCE with no backward — see
            # ops/packed/larvanet.py's LR-domain branch
            from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

            targets = pixel_unshuffle(targets, SCALE)
        losses = [l1_loss(o, targets) for o in self._all_exits(params, inputs)]
        return sum(losses) / len(losses)

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_trunk", 0):
            if getattr(self, "_packed_infer", None) is None:
                from larvanet_tpu.ops.packed_trunk import make_packed_larvanet_forward

                from larvanet_tpu.models.base import serving_compute_dtype
                self._packed_infer = make_packed_larvanet_forward(
                    self, dtype=serving_compute_dtype(self))
            return self._packed_infer(params, x)
        exits = getattr(self.args, "leg", None) if self.has_early_exit else None
        if exits is not None:
            return self.module.apply({"params": params}, x, exits=int(exits))
        return self.module.apply({"params": params}, x)

    # -- volume-driven training (reference train_larva.py / LarvaNet.py) ----
    def train_step_larva(self, args, val_dataloader, input_batch, truth_batch, summary=None):
        """One step; every --val_volume bytes: validate, schedule lr, save.

        input/truth: lists or arrays of CHW float32 (host contract).
        Matches reference models/LarvaNet.py:98-139.
        """
        inputs = chw_list_to_nhwc(input_batch)
        targets = chw_list_to_nhwc(truth_batch)
        self.global_step += 1
        self.temp_volume += self.volume_per_step
        lr = self.get_learning_rate()
        self.params, self.opt_state, loss = self._train_jit(
            self.params, self.opt_state, lr, inputs, targets
        )

        if self.global_step == 1 and val_dataloader is not None:
            self.validate_for_train(args, val_dataloader)

        if self.temp_volume >= self.args.val_volume:
            self.total_volume += self.temp_volume
            self.temp_volume = 0
            if val_dataloader is not None:
                self.validate_for_train(args, val_dataloader)
            if args is not None and getattr(args, "train_path", None):
                self.save(base_path=args.train_path)
                print("saved a model checkpoint at volume %.0fG" % (self.total_volume / 1e9,))
            if summary is not None:
                summary.scalar("loss", float(loss), self.global_step)
                summary.scalar("lr", lr, self.global_step)
        return float(loss)

    def validate_for_train(self, args, dataloader):
        """Full val-set RGB PSNR -> plateau scheduler step
        (reference models/LarvaNet.py:141-161). PSNR is computed on
        device (scalar readback per image) — same protocol, no full-frame
        device->host transfers."""
        num_images = dataloader.get_num_images()
        psnr_list = []
        for idx in range(num_images):
            input_image, truth_image, _ = dataloader.get_image_pair(image_index=idx, scale=SCALE)
            psnr_list.append(self.psnr_on_device(input_image, truth_image))
        average_psnr = float(np.mean(psnr_list))
        print(
            "step %d, volume %.0fG, psnr=%.8f, lr = %.8f"
            % (self.global_step, self.total_volume / 1e9, average_psnr, self.get_learning_rate())
        )
        if self.scheduler is not None:
            self.scheduler.step(average_psnr)
        return average_psnr

    def checkpoint_name(self):
        return "model_step%d_vol%.0fG.ckpt" % (self.global_step, self.total_volume / 1e9)

    def _state_dict(self):
        state = super()._state_dict()
        if self.scheduler is not None:
            state["scheduler"] = self.scheduler.state_dict()
        return state

    def _load_state_dict(self, state, strict=True):
        super()._load_state_dict(state, strict=strict)
        if self.scheduler is not None and "scheduler" in state:
            self.scheduler.load_state_dict(state["scheduler"])


class _V2Mixin:
    """V2: per-exit losses + tail loss averaged over M+1 (inherited
    _compute_loss — exits='all' already includes the tail, reference
    models/LarvaNetV2.py:108-118); partial restore (:198-207)."""

    def restore(self, ckpt_path, target=None, strict=False):
        super().restore(ckpt_path, target=target, strict=False)


# ---- registry presets (one per reference model file) -----------------------

def _preset(name, **attrs):
    cls = type(name.replace("-", "_"), tuple(attrs.pop("__bases__", (LarvaNetBase,))), attrs)

    @register_model(name)
    def factory(cls=cls):
        return cls()

    return cls


LarvaNet = _preset("LarvaNet")
# TPU-native extension (no reference counterpart): the flagship's
# 48-channel trunk packs to 96 channels — 75% of the MXU's 128-wide
# output tile (BASELINE.md "LarvaNet inference: at its structural
# ceiling"). LarvaNet_w64 widens the trunk to 64 so the packed trunk
# runs at 2C=128, the EXACT shape where the packed conv measured 97% of
# v5e bf16 peak; legs narrow 64->48 before their PixelShuffle(4).
# Same multi-exit training recipe; weights are NOT loadable from
# 48-channel checkpoints (train from scratch).
LarvaNetW64 = _preset("LarvaNet_w64", trunk_features=64, width_flag=True)
LarvaNet0c = _preset("LarvaNet_0c", leg_style="none", default_patience=1, default_cooldown=None)
LarvaNet1c = _preset("LarvaNet_1c", leg_style="resblock", default_patience=1, default_cooldown=None)
LarvaNet4c = _preset("LarvaNet_4c", default_patience=1, default_cooldown=None)
LarvaNetSkip = _preset("LarvaNet_skip", leg_style="skip", default_patience=1, default_cooldown=None)
LarvaNetRes = _preset("LarvaNet_res", body_style="res", default_patience=1, default_cooldown=None)
LarvaNetV2 = _preset(
    "LarvaNetV2",
    __bases__=(_V2Mixin, LarvaNetBase),
    use_tail=True,
    default_lr=1e-4,
    default_val_volume=3e9,
    default_min_lr=1e-7,
    default_cooldown=None,
)
LarvaLeg = _preset(
    "LarvaLeg",
    has_early_exit=True,
    default_lr=1e-4,
    default_val_volume=3e9,
    default_min_lr=1e-7,
    default_cooldown=None,
)
# TPU-native extension (no reference counterpart): LarvaLeg's --leg
# anytime inference (reference LarvaLeg.py:289-299) over the w64 trunk,
# so the 128-lane packed width and the early-exit frontier compose.
# Weight-compatible with LarvaNet_w64 checkpoints (same param tree).
LarvaLegW64 = _preset(
    "LarvaLeg_w64",
    has_early_exit=True,
    trunk_features=64,
    width_flag=True,
    default_lr=1e-4,
    default_val_volume=3e9,
    default_min_lr=1e-7,
    default_cooldown=None,
)
LarvaLegV2 = _preset(
    "LarvaLegV2",
    __bases__=(_V2Mixin, LarvaNetBase),
    has_early_exit=True,
    use_tail=True,
    default_lr=1e-4,
    default_val_volume=3e9,
    default_min_lr=1e-7,
    default_cooldown=None,
)
