"""The MSRR family: full MSRR, the ultra-light msrr_reduced and its
ablations, DWSR, and the [0,1]-range msrr_test.

Reference files (each a full file-copy in the reference; here config
presets over two Flax modules):
  models/msrr.py                — 64-filter trunk, LeakyReLU(0.1) first
      conv + HR conv, upsample has LReLU after every PixelShuffle
      (:188-211), bilinear base skip (:239-248). Stepwise Adam.
  models/msrr_reduced.py        — trunk width 3*scale^2 (=48 at x4,
      :263), N=32 ResBlocks, single PixelShuffle(scale) straight to RGB,
      + interpolated base (:283-289). Volume-driven AdamW + plateau
      (:94-101) via train_step_larva (:156-192).
  models/msrr_reduced_def_init  — PyTorch default init. Stepwise Adam.
  models/msrr_reduced_NI        — no interpolation base skip.
  models/msrr_reduced_linear    — no activation after first conv,
      'linear' Kaiming init, bilinear base.
  models/msrr_reduced_relu6     — ReLU6 inside blocks.
  models/msrr_reduced_leaky     — LeakyReLU(--slope) inside blocks.
  models/msrr_reduced_meanshift — MeanShift pair instead of base skip.
  models/dwsr_reduced           — depthwise-separable ResBlocks.
  models/msrr_test              — two x2 upconv+shuffle stages + HR conv
      (:forward); operated in [0,1] range by test.py:132-146 (the range
      is a data contract of the caller; the module is range-agnostic).

Note on the base skip: the reference hardcodes scale_factor=4 in the
interpolated base even when built for other scales (msrr_reduced.py:287)
— a latent bug; here the base uses the configured scale.
"""

from __future__ import annotations

import argparse
from typing import Optional

from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import SRModel, add_qat_flag, l1_loss, qat_requested
from larvanet_tpu.models.layers import (
    DepthwiseSeparableResBlock,
    MeanShift,
    ResBlock,
    UpsampleBlock,
    conv3x3,
    get_activation,
    kaiming_normal_scaled,
    interpolated_base,
)
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle


class MSRRModule(nn.Module):
    """Full MSRR (reference models/msrr.py:214-248)."""

    features: int = 64
    num_blocks: int = 16
    res_weight: float = 1.0
    scale: int = 4

    @nn.compact
    def __call__(self, x):
        kinit = kaiming_normal_scaled(0.1)
        lrelu = get_activation("leaky_relu", 0.1)
        out = lrelu(conv3x3(self.features, name="first_conv", kernel_init=kinit)(x))
        for i in range(self.num_blocks):
            out = ResBlock(self.features, res_weight=self.res_weight, init_scale=0.1,
                           name="res_block_%d" % i)(out)
        # msrr's upsample has LReLU after every shuffle stage (:188-205)
        up = UpsampleBlock(self.features, self.scale, activation="leaky_relu",
                           init_scale=0.1, name="upsample")
        out = up(out)
        out = lrelu(out) if self.scale != 3 else out  # final-stage LReLU for 2/4/8
        out = lrelu(conv3x3(self.features, name="HR_conv", kernel_init=kinit)(out))
        out = conv3x3(3, name="final_conv", kernel_init=kinit)(out)
        return out + interpolated_base(x, self.scale, "bilinear")


class MSRRReducedModule(nn.Module):
    """msrr_reduced and ablations (reference models/msrr_reduced*.py)."""

    num_blocks: int = 32
    res_weight: float = 1.0
    scale: int = 4
    block_activation: str = "relu"  # relu | relu6 | leaky_relu
    slope: float = 0.1
    first_activation: Optional[str] = "leaky_relu"  # None for 'linear' variant
    base: Optional[str] = "bicubic"  # interpolate method, 'meanshift', or None
    init_style: str = "kaiming0.1"  # 'kaiming0.1' | 'default'
    depthwise: bool = False
    # trained-checkpoint MeanShift overrides (see layers.MeanShift.affine)
    ms_affine: tuple = None
    mis_affine: tuple = None

    @nn.compact
    def __call__(self, x):
        features = 3 * self.scale * self.scale
        if self.init_style == "kaiming0.1":
            first = conv3x3(features, name="first_conv", kernel_init=kaiming_normal_scaled(0.1))
            block_init = 0.1
        else:
            first = conv3x3(features, name="first_conv", in_features=3)
            block_init = None

        if self.base == "meanshift":
            x_in = MeanShift(sign=1.0, affine=self.ms_affine)(x)
        else:
            x_in = x

        out = first(x_in)
        if self.first_activation:
            # the leaky ablation drives the first LReLU with --slope too
            # (reference msrr_reduced_leaky.py:183); others default 0.1
            out = get_activation(self.first_activation, self.slope)(out)
        for i in range(self.num_blocks):
            if self.depthwise:
                out = DepthwiseSeparableResBlock(features, name="res_block_%d" % i)(out)
            else:
                out = ResBlock(
                    features, res_weight=self.res_weight, activation=self.block_activation,
                    slope=self.slope, init_scale=block_init, name="res_block_%d" % i,
                )(out)
        out = pixel_shuffle(out, self.scale)
        if self.base == "meanshift":
            out = MeanShift(sign=-1.0, affine=self.mis_affine)(out)
        elif self.base is not None:
            out = out + interpolated_base(x, self.scale, self.base)
        return out


class MSRRTestModule(nn.Module):
    """msrr_test (reference models/msrr_test.py MSRRModule)."""

    features: int = 64
    num_blocks: int = 16
    res_weight: float = 1.0
    scale: int = 4  # topology is two x2 stages => effectively x4

    @nn.compact
    def __call__(self, x):
        kinit = kaiming_normal_scaled(0.1)
        lrelu = get_activation("leaky_relu", 0.1)
        fea = lrelu(conv3x3(self.features, name="conv_first", kernel_init=kinit)(x))
        out = fea
        for i in range(self.num_blocks):
            out = ResBlock(self.features, res_weight=self.res_weight, init_scale=0.1,
                           name="res_block_%d" % i)(out)
        out = lrelu(pixel_shuffle(conv3x3(4 * self.features, name="upconv1", kernel_init=kinit)(out), 2))
        out = lrelu(pixel_shuffle(conv3x3(4 * self.features, name="upconv2", kernel_init=kinit)(out), 2))
        out = conv3x3(3, name="conv_last", kernel_init=kinit)(
            lrelu(conv3x3(self.features, name="HRconv", kernel_init=kinit)(out))
        )
        return out + interpolated_base(x, 4, "bilinear")


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


class _PackedTrunkMixin:
    """Routes forward/loss through the width-packed graph when
    --packed_trunk (default 1). Exact reparametrization (ops/
    packed_trunk.py); depthwise configs fall back to the plain graph."""

    def _packed_fwd(self, qat=False, lr_domain=False):
        attr = ("_qat_cache" if qat else "_packed_cache") + (
            "_lr" if lr_domain else "")
        if getattr(self, attr, None) is None:
            from larvanet_tpu.ops.packed_trunk import make_packed_msrr_forward

            try:
                from larvanet_tpu.models.base import serving_compute_dtype
                setattr(self, attr, make_packed_msrr_forward(
                    self, dtype=serving_compute_dtype(self), qat=qat,
                    lr_domain=lr_domain))
            except ValueError:
                setattr(self, attr, False)
        return getattr(self, attr) or None

    def _lr_domain_ok(self) -> bool:
        """LR-domain loss needs a TRAILING shuffle: MSRRReducedModule only
        (msrr / msrr_test run HR convs after their shuffles)."""
        from larvanet_tpu.models.base import lr_domain_requested

        return (lr_domain_requested(self)
                and type(self.module).__name__ == "MSRRReducedModule")

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_cache = None
        self._qat_cache = None
        self._packed_cache_lr = None
        self._qat_cache_lr = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_trunk", 0):
            fwd = self._packed_fwd()
            if fwd is not None:
                try:
                    return fwd(params, x)
                except ValueError:
                    pass  # e.g. odd width with depthwise blocks
        return super()._forward_impl(params, x)

    def _compute_loss(self, params, inputs, targets):
        if getattr(self.args, "packed_trunk", 0):
            lr_dom = self._lr_domain_ok()
            fwd = self._packed_fwd(qat=qat_requested(self), lr_domain=lr_dom)
            if fwd is None and (qat_requested(self)
                                or getattr(self.args, "remat", 0)):
                raise ValueError("--qat/--remat are unsupported for depthwise "
                                 "configs (they run the plain graph — no "
                                 "packed conv pairs to wrap)")
            if fwd is not None:
                if lr_dom:
                    from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

                    targets_used = pixel_unshuffle(targets, self.scale)
                else:
                    targets_used = targets
                try:
                    return self.loss(fwd(params, inputs), targets_used)
                except ValueError:
                    if qat_requested(self):
                        raise  # even-width requirement must not be masked
                    pass  # e.g. odd width with depthwise blocks
        return super()._compute_loss(params, inputs, targets)


def _add_packed_trunk_flag(parser):
    from larvanet_tpu.models.base import add_lr_domain_flag

    parser.add_argument("--packed_trunk", type=int, default=1,
                        help="Width-packed trunk (exact reparametrization, ~2x per "
                             "conv on TPU; ops/packed_trunk.py). 0 = plain graph.")
    add_lr_domain_flag(parser)
    add_qat_flag(parser)


class MSRR(_PackedTrunkMixin, SRModel):
    """Full MSRR: stepwise Adam (reference models/msrr.py:48-53)."""

    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_filters", type=int, default=64,
                            help="The number of convolutional features.")
        parser.add_argument("--num_blocks", type=int, default=16,
                            help="The number of residual blocks.")
        parser.add_argument("--res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        _add_packed_trunk_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return MSRRModule(
            features=self.args.num_filters,
            num_blocks=self.args.num_blocks,
            res_weight=self.args.res_weight,
            scale=self.scale,
        )

    def get_learning_rate(self):
        return self.args.learning_rate * (
            self.args.learning_rate_decay
            ** (self.global_step // self.args.learning_rate_decay_steps)
        )


@register_model("msrr")
def _create_msrr():
    return MSRR()


class _ReducedStepwise(_PackedTrunkMixin, SRModel):
    """Shared wrapper for the stepwise-Adam msrr_reduced ablations."""

    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    default_interpolate: Optional[str] = "bicubic"
    has_interpolate_flag = True
    has_slope_flag = False

    # preset module config
    block_activation = "relu"
    first_activation: Optional[str] = "leaky_relu"
    base_kind = "interpolate"  # 'interpolate' | 'meanshift' | None
    init_style = "kaiming0.1"
    depthwise = False

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_blocks", type=int, default=32,
                            help="The number of residual blocks.")
        if self.has_interpolate_flag:
            parser.add_argument("--interpolate", type=str, default=self.default_interpolate,
                                help="Interpolation method.")
        parser.add_argument("--res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        if self.has_slope_flag:
            parser.add_argument("--slope", type=float, default=0.1,
                                help="Slope of LeakyReLU function.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        _add_packed_trunk_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        if self.base_kind == "interpolate":
            base = getattr(self.args, "interpolate", self.default_interpolate)
        elif self.base_kind == "meanshift":
            base = "meanshift"
        else:
            base = None
        return MSRRReducedModule(
            num_blocks=self.args.num_blocks,
            res_weight=self.args.res_weight,
            scale=self.scale,
            block_activation=self.block_activation,
            slope=getattr(self.args, "slope", 0.1),
            first_activation=self.first_activation,
            base=base,
            init_style=self.init_style,
            depthwise=self.depthwise,
        )

    def get_learning_rate(self):
        return self.args.learning_rate * (
            self.args.learning_rate_decay
            ** (self.global_step // self.args.learning_rate_decay_steps)
        )


def _reduced_preset(name, **attrs):
    cls = type(name, (_ReducedStepwise,), attrs)

    @register_model(name)
    def factory(cls=cls):
        return cls()

    return cls


MSRRReducedDefInit = _reduced_preset("msrr_reduced_def_init", init_style="default")
MSRRReducedNI = _reduced_preset("msrr_reduced_NI", base_kind=None, has_interpolate_flag=False)
MSRRReducedLinear = _reduced_preset("msrr_reduced_linear", first_activation=None,
                                    default_interpolate="bilinear")
MSRRReducedReLU6 = _reduced_preset("msrr_reduced_relu6", block_activation="relu6",
                                   default_interpolate="bilinear")
MSRRReducedLeaky = _reduced_preset("msrr_reduced_leaky", block_activation="leaky_relu",
                                   has_slope_flag=True, default_interpolate="bilinear")
MSRRReducedMeanShift = _reduced_preset("msrr_reduced_meanshift", base_kind="meanshift",
                                       default_interpolate="bilinear")
DWSRReduced = _reduced_preset("dwsr_reduced", depthwise=True, default_interpolate="bilinear")


class MSRRTest(_ReducedStepwise):
    """msrr_test: [0,1]-range MSRR used by test.py (reference msrr_test.py)."""

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_filters", type=int, default=64)
        parser.add_argument("--num_blocks", type=int, default=16)
        parser.add_argument("--res_weight", type=float, default=1.0)
        parser.add_argument("--learning_rate", type=float, default=1e-4)
        parser.add_argument("--learning_rate_decay", type=float, default=0.5)
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000)
        _add_packed_trunk_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return MSRRTestModule(
            features=self.args.num_filters,
            num_blocks=self.args.num_blocks,
            res_weight=self.args.res_weight,
            scale=self.scale,
        )


@register_model("msrr_test")
def _create_msrr_test():
    return MSRRTest()


class MSRRReduced(_ReducedStepwise):
    """msrr_reduced proper: volume-driven AdamW + ReduceLROnPlateau
    (reference msrr_reduced.py:94-101,156-192) — single-exit
    train_step_larva. Reuses the LarvaNet volume/scheduler machinery."""

    optimizer_kind = "adamw"

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_blocks", type=int, default=32,
                            help="The number of residual blocks.")
        parser.add_argument("--interpolate", type=str, default="bicubic",
                            help="Interpolation method.")
        parser.add_argument("--res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--lr", type=float, default=4e-4,
                            help="Initial learning rate.")
        parser.add_argument("--lr_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--lr_step", type=int, default=50000,
                            help="Learning rate decay step.")
        parser.add_argument("--val_volume", type=float, default=30e9,
                            help="How much volume need for validation.")
        parser.add_argument("--threshold", type=float, default=0.001,
                            help="Threshold for reduceLRonPlateau.")
        parser.add_argument("--min_lr", type=float, default=1e-8,
                            help="Minimum learning rate.")
        parser.add_argument("--patience", type=int, default=3,
                            help="patience for lr scheduler")
        parser.add_argument("--cooldown", type=int, default=6,
                            help="cooldown for lr scheduler")
        _add_packed_trunk_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def prepare(self, is_training, scales, global_step=0, seed=0):
        super().prepare(is_training, scales, global_step=global_step, seed=seed)
        if is_training:
            from larvanet_tpu.train.schedules import ReduceLROnPlateau

            self.scheduler = ReduceLROnPlateau(
                lr=self.args.lr, factor=self.args.lr_decay,
                patience=self.args.patience, cooldown=self.args.cooldown,
                threshold=self.args.threshold, min_lr=self.args.min_lr, mode="max",
            )
        else:
            self.scheduler = None

    def get_learning_rate(self):
        return self.scheduler.lr if getattr(self, "scheduler", None) is not None else self.args.lr

    # Volume-driven single-exit training: borrow the LarvaNet machinery.
    # Only methods that never call zero-arg super() may be borrowed as
    # unbound functions — super()'s __class__ cell binds to the class the
    # function was DEFINED in (LarvaNetBase), so calling a borrowed
    # _state_dict on an MSRRReduced instance raises
    # "super(type, obj): obj must be an instance or subtype of type"
    # (shipped round-5 crash: cli/train's final save with this model).
    from larvanet_tpu.models.larvanet import LarvaNetBase as _LB

    train_step_larva = _LB.train_step_larva
    validate_for_train = _LB.validate_for_train
    checkpoint_name = _LB.checkpoint_name
    del _LB

    def _state_dict(self):
        # same scheduler persistence as LarvaNetBase._state_dict
        # (larvanet.py:393-397), re-defined here so super() resolves
        # through MSRRReduced's own MRO.
        state = super()._state_dict()
        if self.scheduler is not None:
            state["scheduler"] = self.scheduler.state_dict()
        return state

    def _load_state_dict(self, state, strict=True):
        super()._load_state_dict(state, strict=strict)
        if self.scheduler is not None and "scheduler" in state:
            self.scheduler.load_state_dict(state["scheduler"])


@register_model("msrr_reduced")
def _create_msrr_reduced():
    return MSRRReduced()
