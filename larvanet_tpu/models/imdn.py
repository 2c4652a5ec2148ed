"""IMDN (AIM2019): information multi-distillation network.

Reference models/imdn_aim2019.py: 8x IMDBlock — 4-stage progressive
channel split (distill rate 0.25): each 3x3 conv + LeakyReLU(0.05)
splits off `distilled` channels and feeds the `remaining` on; the four
distilled slices concat into a 1x1 fuse conv, residual add (:135-173).
Trunk + skip, then conv + PixelShuffle straight to RGB (:176-187).
Flags --num_filters=64 --num_blocks=8 (:26-27). Stepwise Adam + L1.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import SRModel, l1_loss
from larvanet_tpu.models.layers import MeanShift, conv3x3, get_activation
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle


class IMDBlock(nn.Module):
    features: int
    distill_rate: float = 0.25

    @nn.compact
    def __call__(self, x):
        lrelu = get_activation("leaky_relu", 0.05)
        d = int(self.features * self.distill_rate)
        r = self.features - d

        res1 = lrelu(conv3x3(self.features, name="conv1", in_features=self.features)(x))
        dist1, rem1 = res1[..., :d], res1[..., d:]
        res2 = lrelu(conv3x3(self.features, name="conv2", in_features=r)(rem1))
        dist2, rem2 = res2[..., :d], res2[..., d:]
        res3 = lrelu(conv3x3(self.features, name="conv3", in_features=r)(rem2))
        dist3, rem3 = res3[..., :d], res3[..., d:]
        res4 = lrelu(conv3x3(d, name="conv4", in_features=r)(rem3))

        res = jnp.concatenate([dist1, dist2, dist3, res4], axis=-1)
        res = conv3x3(self.features, name="conv5", in_features=4 * d, kernel_size=1)(res)
        return x + res


class IMDNModule(nn.Module):
    features: int = 64
    num_blocks: int = 8
    scale: int = 4
    # trained-checkpoint MeanShift overrides (see layers.MeanShift.affine)
    ms_affine: tuple = None
    mis_affine: tuple = None

    @nn.compact
    def __call__(self, x):
        x = MeanShift(sign=1.0, affine=self.ms_affine)(x)
        x = conv3x3(self.features, name="first_conv", in_features=3)(x)
        res = x
        for i in range(self.num_blocks):
            res = IMDBlock(self.features, name="imd_block_%d" % i)(res)
        res = conv3x3(self.features, name="after_res_conv", in_features=self.features)(res)
        x = x + res
        x = conv3x3(3 * self.scale ** 2, name="upsample_conv", in_features=self.features)(x)
        x = pixel_shuffle(x, self.scale)
        return MeanShift(sign=-1.0, affine=self.mis_affine)(x)



class _IMDNPackedMixin:
    """--packed_trunk routing (exact; ops/packed_trunk.
    make_packed_imdn_forward); odd widths fall back to the plain graph."""

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_cache = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def _packed_fwd(self):
        if getattr(self, "_packed_cache", None) is None:
            from larvanet_tpu.ops.packed_trunk import make_packed_imdn_forward

            from larvanet_tpu.models.base import serving_compute_dtype
            self._packed_cache = make_packed_imdn_forward(
                self, dtype=serving_compute_dtype(self))
        return self._packed_cache

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_trunk", 0):
            try:
                return self._packed_fwd()(params, x)
            except ValueError:
                pass  # odd width
        return super()._forward_impl(params, x)

    def _compute_loss(self, params, inputs, targets):
        if getattr(self.args, "packed_trunk", 0):
            try:
                return self.loss(self._packed_fwd()(params, inputs), targets)
            except ValueError:
                pass
        return super()._compute_loss(params, inputs, targets)


class IMDN(_IMDNPackedMixin, SRModel):
    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_filters", type=int, default=64,
                            help="The number of filters.")
        parser.add_argument("--num_blocks", type=int, default=8,
                            help="The number of modules.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=0,
                            help="Width-packed trunk (exact but MEASURED SLOWER for IMDN: "
                                 "13.7 vs 17.4 MP/s — the channel-split glue outweighs the "
                                 "conv gains; default off, see BASELINE.md).")
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return IMDNModule(
            features=self.args.num_filters,
            num_blocks=self.args.num_blocks,
            scale=self.scale,
        )

    def get_learning_rate(self):
        return self.args.learning_rate * (
            self.args.learning_rate_decay
            ** (self.global_step // self.args.learning_rate_decay_steps)
        )


@register_model("imdn_aim2019")
def _create_imdn():
    return IMDN()
