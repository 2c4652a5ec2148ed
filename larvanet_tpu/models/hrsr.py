"""HRSR: hybrid-resolution SR — ResBlocks in LR space, PixelShuffle,
then optional ResBlocks in HR space.

Reference models/hrsr.py (:184-237): first conv 3 -> 3*scale^2 + LReLU,
`num_lr_blocks` ResBlocks, PixelShuffle(scale), then (if num_hr_blocks>0)
a middle conv 3 -> num_hr_filters + LReLU and `num_hr_blocks` ResBlocks
of size `hr_filter_size`, an optional final conv back to 3 channels when
num_hr_filters != 3, plus the interpolated base. Trained with AdamW and
a ReduceLROnPlateau that the train_schedule CLI steps with validation
PSNR (reference hrsr.py:85-92, train_schedule.py:139-164) — exposed
here as `.lr_scheduler` for the same external-driving contract.

hrsr_ (reference models/hrsr_.py) is the same topology with min_lr=0.
hrsr_c3 (reference models/hrsr_c3.py) runs the HR blocks directly on
the 3-channel shuffled output (no middle/final conv), defaults 32 LR /
0 HR blocks, stepwise Adam.
"""

from __future__ import annotations

import argparse

from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import SRModel, add_qat_flag, l1_loss, qat_requested
from larvanet_tpu.models.layers import (
    ResBlock,
    conv3x3,
    get_activation,
    kaiming_normal_scaled,
    interpolated_base,
)
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle


class HRSRModule(nn.Module):
    num_lr_blocks: int = 4
    num_hr_blocks: int = 4
    num_hr_filters: int = 3
    hr_filter_size: int = 3
    interpolate: str = "bilinear"
    res_weight: float = 1.0
    scale: int = 4
    c3_style: bool = False  # hrsr_c3: HR blocks on raw 3-channel output

    @nn.compact
    def __call__(self, x):
        features = 3 * self.scale * self.scale
        lrelu = get_activation("leaky_relu", 0.1)
        out = lrelu(conv3x3(features, name="first_conv",
                            kernel_init=kaiming_normal_scaled(0.1))(x))
        for i in range(self.num_lr_blocks):
            out = ResBlock(features, res_weight=self.res_weight, init_scale=0.1,
                           name="lr_block_%d" % i)(out)
        out = pixel_shuffle(out, self.scale)

        if self.num_hr_blocks > 0:
            if self.c3_style:
                for i in range(self.num_hr_blocks):
                    out = ResBlock(3, res_weight=self.res_weight, init_scale=0.1,
                                   name="hr_block_%d" % i)(out)
            else:
                out = lrelu(conv3x3(self.num_hr_filters, name="middle_conv",
                                    kernel_init=kaiming_normal_scaled(0.1))(out))
                for i in range(self.num_hr_blocks):
                    out = ResBlock(self.num_hr_filters, init_scale=0.1,
                                   kernel_size=self.hr_filter_size,
                                   name="hr_block_%d" % i)(out)
        if not self.c3_style and self.num_hr_filters != 3:
            out = conv3x3(3, name="final_conv", kernel_init=kaiming_normal_scaled(0.1))(lrelu(out))
        return out + interpolated_base(x, self.scale, self.interpolate)



class _HRSRPackedMixin:
    """--packed_trunk routing to ops/packed_trunk.make_packed_hrsr_forward
    (exact reparametrization; LR trunk packed, HR part plain)."""

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_cache = None
        self._qat_cache = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def _packed_fwd(self, qat=False):
        attr = "_qat_cache" if qat else "_packed_cache"
        if getattr(self, attr, None) is None:
            from larvanet_tpu.ops.packed_trunk import make_packed_hrsr_forward

            from larvanet_tpu.models.base import serving_compute_dtype
            setattr(self, attr, make_packed_hrsr_forward(
                self, dtype=serving_compute_dtype(self), qat=qat))
        return getattr(self, attr)

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_trunk", 0):
            return self._packed_fwd()(params, x)
        return super()._forward_impl(params, x)

    def _compute_loss(self, params, inputs, targets):
        if getattr(self.args, "packed_trunk", 0):
            fwd = self._packed_fwd(qat=qat_requested(self))
            return self.loss(fwd(params, inputs), targets)
        return super()._compute_loss(params, inputs, targets)


class HRSR(_HRSRPackedMixin, SRModel):
    """AdamW + externally-stepped plateau scheduler (train_schedule flow)."""

    optimizer_kind = "adamw"
    loss = staticmethod(l1_loss)
    default_min_lr = 1e-5

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_lr_blocks", type=int, default=4,
                            help="The number of residual blocks at LR domain.")
        parser.add_argument("--num_hr_blocks", type=int, default=4,
                            help="The number of residual blocks at HR domain.")
        parser.add_argument("--num_hr_filters", type=int, default=3,
                            help="The number of filters at HR domain.")
        parser.add_argument("--hr_filter_size", type=int, default=3,
                            help="The size of filters at HR domain.")
        parser.add_argument("--interpolate", type=str, default="bilinear",
                            help="Interpolation method.")
        parser.add_argument("--lr", type=float, default=1e-3,
                            help="Initial learning rate.")
        parser.add_argument("--lr_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--threshold", type=float, default=0.005,
                            help="Threshold for the plateau scheduler.")
        parser.add_argument("--min_lr", type=float, default=self.default_min_lr,
                            help="Minimum learning rate.")
        parser.add_argument("--cooldown", type=float, default=0,
                            help="cooldown for reduce lr")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed LR trunk (exact; ops/packed_trunk.py). 0 = plain graph.")
        add_qat_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return HRSRModule(
            num_lr_blocks=self.args.num_lr_blocks,
            num_hr_blocks=self.args.num_hr_blocks,
            num_hr_filters=self.args.num_hr_filters,
            hr_filter_size=self.args.hr_filter_size,
            interpolate=self.args.interpolate,
            scale=self.scale,
        )

    def prepare(self, is_training, scales, global_step=0, seed=0):
        super().prepare(is_training, scales, global_step=global_step, seed=seed)
        self.lr_scheduler = None
        if is_training:
            from larvanet_tpu.train.schedules import ReduceLROnPlateau

            # patience=1 hardcoded in the reference (hrsr.py:91)
            self.lr_scheduler = ReduceLROnPlateau(
                lr=self.args.lr, factor=self.args.lr_decay, patience=1,
                cooldown=int(self.args.cooldown), threshold=self.args.threshold,
                min_lr=self.args.min_lr, mode="max",
            )

    def get_learning_rate(self):
        return self.lr_scheduler.lr if self.lr_scheduler is not None else self.args.lr

    def _state_dict(self):
        state = super()._state_dict()
        if self.lr_scheduler is not None:
            state["scheduler"] = self.lr_scheduler.state_dict()
        return state

    def _load_state_dict(self, state, strict=True):
        super()._load_state_dict(state, strict=strict)
        if self.lr_scheduler is not None and "scheduler" in state:
            self.lr_scheduler.load_state_dict(state["scheduler"])


@register_model("hrsr")
def _create_hrsr():
    return HRSR()


class HRSRUnderscore(HRSR):
    """hrsr_ variant: min_lr=0 (reference models/hrsr_.py)."""

    default_min_lr = 0.0


@register_model("hrsr_")
def _create_hrsr_():
    return HRSRUnderscore()


class HRSRC3(_HRSRPackedMixin, SRModel):
    """hrsr_c3: stepwise Adam (reference models/hrsr_c3.py:48-54)."""

    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_lr_blocks", type=int, default=32,
                            help="The number of residual blocks at LR domain.")
        parser.add_argument("--num_hr_blocks", type=int, default=0,
                            help="The number of residual blocks at HR domain.")
        parser.add_argument("--interpolate", type=str, default="bilinear",
                            help="Interpolation method.")
        parser.add_argument("--res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed LR trunk (exact; ops/packed_trunk.py). 0 = plain graph.")
        add_qat_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return HRSRModule(
            num_lr_blocks=self.args.num_lr_blocks,
            num_hr_blocks=self.args.num_hr_blocks,
            interpolate=self.args.interpolate,
            res_weight=self.args.res_weight,
            scale=self.scale,
            c3_style=True,
        )

    def get_learning_rate(self):
        return self.args.learning_rate * (
            self.args.learning_rate_decay
            ** (self.global_step // self.args.learning_rate_decay_steps)
        )


@register_model("hrsr_c3")
def _create_hrsr_c3():
    return HRSRC3()
