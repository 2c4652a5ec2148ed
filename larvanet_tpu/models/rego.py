"""REGO-Net: triangular grid of residual blocks mixing error/feature streams.

Reference models/REGO-Net.py: RESBlock returns (res, x+res) (:RESBlock);
a triangular wavefront of blocks RESB_{i}_{j} (i+j < len_side) advances
anti-diagonals where each step mixes the previous diagonal's feature and
error streams (fea_in[j-1] + err_in[j]); the final diagonal concatenates
(err_0, err_k + fea_{k-1} ..., fea_last) into (len_side+1)*F channels for
a conv+PixelShuffle recon plus an interpolated base.

REGO-serial (reference models/REGO-serial.py) repeats the triangle
--num_regos times with a merge conv between repeats and 0.1-scaled init
(--weight_scale also scales each block's residual).

Registered under the reference's hyphenated CLI names "REGO-Net" and
"REGO-serial".
"""

from __future__ import annotations

import argparse
from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import (
    SRModel, add_lr_domain_flag, add_qat_flag, l1_loss, qat_requested)
from larvanet_tpu.models.layers import (
    MeanShift,
    conv3x3,
    get_activation,
    kaiming_normal_scaled,
    interpolated_base,
)
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle


class RESBlock(nn.Module):
    """conv-LReLU(0.1)-conv; returns (residual, x + residual)."""

    features: int
    weight: float = 1.0
    init_scale: float | None = None

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.init_scale is not None:
            conv = lambda name: conv3x3(self.features, name=name,
                                        kernel_init=kaiming_normal_scaled(self.init_scale))
        else:
            conv = lambda name: conv3x3(self.features, name=name, in_features=self.features)
        lrelu = get_activation("leaky_relu", 0.1)
        res = conv("conv1")(x)
        res = lrelu(res)
        res = conv("conv2")(res)
        if self.weight != 1.0:
            res = res * self.weight
        return res, x + res


def _triangle(mk_block, fea, len_side):
    """Run one triangular wavefront; returns (err_out, fea_out) diagonals."""
    err, fea = mk_block(0, 0)(fea)
    err_in, fea_in = [err], [fea]
    err_out, fea_out = err_in, fea_in
    for i in range(1, len_side):
        err_out, fea_out = [], []
        err, fea = mk_block(i, 0)(err_in[0])
        err_out.append(err)
        fea_out.append(fea)
        for j in range(1, i):
            err, fea = mk_block(i - j, j)(fea_in[j - 1] + err_in[j])
            err_out.append(err)
            fea_out.append(fea)
        err, fea = mk_block(0, i)(fea_in[i - 1])
        err_out.append(err)
        fea_out.append(fea)
        err_in, fea_in = err_out, fea_out
    return err_out, fea_out


def _fuse(err_out: List, fea_out: List) -> jnp.ndarray:
    mids = [e + f for e, f in zip(err_out[1:], fea_out[:-1])]
    return jnp.concatenate([err_out[0], *mids, fea_out[-1]], axis=-1)


class REGOModule(nn.Module):
    features: int = 64
    len_side: int = 5
    res_weight: float = 1.0
    interpolate: str = "bilinear"
    scale: int = 4
    num_regos: int = 1
    init_scale: float | None = None  # serial variant scales init by weight_scale
    # trained-checkpoint MeanShift override (REGO has no inverse shift)
    ms_affine: tuple = None

    @nn.compact
    def __call__(self, x):
        fea = conv3x3(self.features, name="feature_extraction",
                      in_features=3 if self.init_scale is None else None,
                      kernel_init=None if self.init_scale is None else kaiming_normal_scaled(self.init_scale),
                      )(MeanShift(sign=1.0, affine=self.ms_affine)(x))
        for k in range(self.num_regos):
            def mk_block(i, j, k=k):
                return RESBlock(self.features, weight=self.res_weight,
                                init_scale=self.init_scale,
                                name="RESB_%d_%d_%d" % (k, i, j))

            err_out, fea_out = _triangle(mk_block, fea, self.len_side)
            fused = _fuse(err_out, fea_out)
            if k != self.num_regos - 1:
                fea = conv3x3(self.features, name="conv_%d" % k,
                              in_features=fused.shape[-1])(fused)

        up_init = kaiming_normal_scaled(self.init_scale) if self.init_scale else None
        sr = conv3x3(3 * self.scale ** 2, name="SRrecon",
                     in_features=None if up_init else fused.shape[-1],
                     kernel_init=up_init)(fused)
        sr = pixel_shuffle(sr, self.scale)
        return sr + interpolated_base(x, self.scale, self.interpolate)



class _REGOPackedMixin:
    """--packed_trunk routing to ops/packed_trunk.make_packed_rego_forward
    (exact reparametrization of the triangular RESBlock wavefront)."""

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_cache = None
        self._qat_cache = None
        self._packed_cache_lr = None
        self._qat_cache_lr = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def _packed_fwd(self, qat=False, lr_domain=False):
        attr = ("_qat_cache" if qat else "_packed_cache") + (
            "_lr" if lr_domain else "")
        if getattr(self, attr, None) is None:
            from larvanet_tpu.ops.packed_trunk import make_packed_rego_forward

            from larvanet_tpu.models.base import serving_compute_dtype
            setattr(self, attr, make_packed_rego_forward(
                self, dtype=serving_compute_dtype(self), qat=qat,
                lr_domain=lr_domain))
        return getattr(self, attr)

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_trunk", 0):
            return self._packed_fwd()(params, x)
        return super()._forward_impl(params, x)

    def _compute_loss(self, params, inputs, targets):
        if getattr(self.args, "packed_trunk", 0):
            from larvanet_tpu.models.base import lr_domain_requested

            lr_dom = lr_domain_requested(self)
            fwd = self._packed_fwd(qat=qat_requested(self), lr_domain=lr_dom)
            if lr_dom:
                from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

                targets = pixel_unshuffle(targets, self.scale)
            return self.loss(fwd(params, inputs), targets)
        return super()._compute_loss(params, inputs, targets)


class REGONet(_REGOPackedMixin, SRModel):
    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_filters", type=int, default=64,
                            help="The number of convolutional features.")
        parser.add_argument("--len_side", type=int, default=5,
                            help="The number of residual blocks.")
        parser.add_argument("--res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--interpolate", type=str, default="bilinear",
                            help="Interpolation method.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed trunk (exact; ops/packed_trunk.py). 0 = plain graph.")
        add_qat_flag(parser)
        add_lr_domain_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return REGOModule(
            features=self.args.num_filters,
            len_side=self.args.len_side,
            res_weight=self.args.res_weight,
            interpolate=self.args.interpolate,
            scale=self.scale,
        )

    def get_learning_rate(self):
        return self.args.learning_rate * (
            self.args.learning_rate_decay
            ** (self.global_step // self.args.learning_rate_decay_steps)
        )


@register_model("REGO-Net")
def _create_rego():
    return REGONet()


class REGOSerial(REGONet):
    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_filters", type=int, default=64,
                            help="The number of convolutional features.")
        parser.add_argument("--len_side", type=int, default=5,
                            help="The number of residual blocks.")
        parser.add_argument("--num_regos", type=int, default=1,
                            help="num of serial repeat of REGO-module")
        parser.add_argument("--weight_scale", type=float, default=0.1,
                            help="The scaling factor.")
        parser.add_argument("--interpolate", type=str, default="bilinear",
                            help="Interpolation method.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed trunk (exact; ops/packed_trunk.py). 0 = plain graph.")
        add_qat_flag(parser)
        add_lr_domain_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return REGOModule(
            features=self.args.num_filters,
            len_side=self.args.len_side,
            res_weight=self.args.weight_scale,
            interpolate=self.args.interpolate,
            scale=self.scale,
            num_regos=self.args.num_regos,
            init_scale=self.args.weight_scale,
        )


@register_model("REGO-serial")
def _create_rego_serial():
    return REGOSerial()
