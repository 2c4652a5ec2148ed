"""EBRN: embedded block residual network (back-projection cascade).

Reference models/ebrn.py: feature_extract = 3 convs with PReLU
(3 -> 4F -> F -> F, :191-198); a chain of BRM units, each up-projecting
with a ConvTranspose (k/s/p = 8/4/2 at x4), running a 3-conv+PReLU
sr_flow, and back-projecting a strided-conv residual `diff = x - down`
refined by a bp_flow (:135-176); then a reverse fusion cascade
`sr = fusion_i(sr + sr_list[-(i+1)])` and a concat recon conv
(:213-233). Flags --num_filters=64 --num_brms=10 (:26-27). Stepwise
Adam + L1.

ebrn_rm (reference models/ebrn_rm.py) is the reduced-memory variant:
BRMs become LR-space res-blocks returning (res, out), fusion in LR
space, one big conv+PixelShuffle at the end. ebrn_rm_BLI additionally
drops the mean-shifts and adds a bilinear base (ebrn_rm_BLI.py diff).
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import (
    SRModel, add_lr_domain_flag, add_qat_flag, l1_loss, qat_requested)
from larvanet_tpu.models.layers import (
    ConvTranspose2dTorch,
    MeanShift,
    PReLU,
    conv3x3,
    get_activation,
    interpolated_base,
)
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

_UP_GEOM = {2: (6, 2, 2), 3: (7, 3, 2), 4: (8, 4, 2)}  # k, s, p per scale


class _ConvPReLUStack(nn.Module):
    features: int
    count: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.count):
            x = conv3x3(self.features, name="conv%d" % i, in_features=x.shape[-1])(x)
            x = PReLU(self.features, name="prelu%d" % i)(x)
        return x


class BRM(nn.Module):
    features: int
    scale: int
    back_project: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = _UP_GEOM[self.scale]
        up = ConvTranspose2dTorch(self.features, k, s, p, name="up_block")(x)
        sr = _ConvPReLUStack(self.features, name="sr_flow")(up)
        if not self.back_project:
            return sr
        down = nn.Conv(self.features, (k, k), strides=(s, s),
                       padding=[(p, p), (p, p)], name="down_block")(up)
        diff = x - down
        diff = diff + _ConvPReLUStack(self.features, name="bp_flow")(diff)
        return diff, sr


class EBRNModule(nn.Module):
    features: int = 64
    num_brms: int = 10
    scale: int = 4
    # trained-checkpoint MeanShift overrides (see layers.MeanShift.affine)
    ms_affine: tuple = None
    mis_affine: tuple = None

    @nn.compact
    def __call__(self, x):
        x = MeanShift(sign=1.0, affine=self.ms_affine)(x)
        fea = conv3x3(4 * self.features, name="fe0", in_features=3)(x)
        fea = PReLU(4 * self.features, name="fe_prelu0")(fea)
        fea = conv3x3(self.features, name="fe1", in_features=4 * self.features)(fea)
        fea = PReLU(self.features, name="fe_prelu1")(fea)
        fea = conv3x3(self.features, name="fe2", in_features=self.features)(fea)
        fea = PReLU(self.features, name="fe_prelu2")(fea)

        sr_list = []
        h = fea
        for i in range(self.num_brms - 1):
            h, sr = BRM(self.features, self.scale, True, name="brm_%d" % i)(h)
            sr_list.append(sr)
        sr = BRM(self.features, self.scale, False, name="brm_%d" % (self.num_brms - 1))(h)

        out_list = [sr]
        for i in range(self.num_brms - 1):
            sr = conv3x3(self.features, name="fusion_%d" % i,
                         in_features=self.features)(sr + sr_list[-(i + 1)])
            out_list.append(sr)

        out = conv3x3(3, name="recon", in_features=self.features * self.num_brms)(
            jnp.concatenate(out_list, axis=-1)
        )
        return MeanShift(sign=-1.0, affine=self.mis_affine)(out)


class EBRNRMModule(nn.Module):
    """Reduced-memory EBRN (reference ebrn_rm.py / ebrn_rm_BLI.py)."""

    features: int = 64
    num_brms: int = 10
    scale: int = 4
    bilinear_base: bool = False  # BLI variant: no mean-shift, + bilinear base
    # trained-checkpoint MeanShift overrides (see layers.MeanShift.affine)
    ms_affine: tuple = None
    mis_affine: tuple = None

    @nn.compact
    def __call__(self, x):
        lrelu = get_activation("leaky_relu", 0.05)
        inp = x if self.bilinear_base else MeanShift(sign=1.0, affine=self.ms_affine)(x)
        fea = conv3x3(self.features, name="first_conv", in_features=3)(inp)

        out_list = []
        h = fea
        for i in range(self.num_brms - 1):
            res = conv3x3(self.features, name="brm_%d_conv1" % i, in_features=self.features)(h)
            res = lrelu(res)
            res = conv3x3(self.features, name="brm_%d_conv2" % i, in_features=self.features)(res)
            out = h + res
            out_list.append(out)
            h = res  # the residual stream feeds the next BRM (ebrn_rm.py forward)
        res = conv3x3(self.features, name="brm_%d_conv1" % (self.num_brms - 1), in_features=self.features)(h)
        res = lrelu(res)
        res = conv3x3(self.features, name="brm_%d_conv2" % (self.num_brms - 1), in_features=self.features)(res)
        out = h + res

        out_prime_list = [out]
        for i in range(self.num_brms - 1):
            out = conv3x3(self.features, name="fusion_%d" % i,
                          in_features=self.features)(out + out_list[-(i + 1)])
            out_prime_list.append(out)

        cat = jnp.concatenate(out_prime_list, axis=-1)
        up = conv3x3(3 * self.scale ** 2, name="upsample_conv", in_features=cat.shape[-1])(cat)
        sr = pixel_shuffle(up, self.scale)
        if self.bilinear_base:
            return sr + interpolated_base(x, self.scale, "bilinear")
        return MeanShift(sign=-1.0, affine=self.mis_affine)(sr)


class _EBRNBase(SRModel):
    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)
    module_cls = EBRNModule
    module_kwargs = {}

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_filters", type=int, default=64,
                            help="The number of filters.")
        parser.add_argument("--num_brms", type=int, default=10,
                            help="The number of modules.")
        parser.add_argument("--learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed trunk for the ebrn_rm variants (exact; "
                                 "ops/packed_trunk.py); full EBRN runs the plain graph.")
        parser.add_argument("--packed_full_ebrn", type=int, default=0,
                            help="Width-packed HR flows for FULL EBRN (exact) — measured "
                                 "18%% SLOWER on v5e (the 64<->128-channel relayouts at "
                                 "every up/down-projection boundary outweigh the conv win "
                                 "on EBRN's huge HR tensors; BASELINE.md negative result). "
                                 "Kept opt-in.")
        add_qat_flag(parser)
        add_lr_domain_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return self.module_cls(
            features=self.args.num_filters,
            num_brms=self.args.num_brms,
            scale=self.scale,
            **self.module_kwargs,
        )

    def get_learning_rate(self):
        return self.args.learning_rate * (
            self.args.learning_rate_decay
            ** (self.global_step // self.args.learning_rate_decay_steps)
        )



class _EBRNRMPackedMixin:
    """--packed_trunk routing for the ebrn_rm variants (exact; ops/
    packed_trunk.make_packed_ebrn_rm_forward)."""

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
            from larvanet_tpu.ops.packed_trunk import make_packed_ebrn_rm_forward

            from larvanet_tpu.models.base import serving_compute_dtype
            setattr(self, attr, make_packed_ebrn_rm_forward(
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


class _EBRNPackedMixin:
    """--packed_full_ebrn routing for FULL EBRN (exact; ops/packed_trunk.
    make_packed_ebrn_forward). OPT-IN: measured 18% slower on v5e
    (BASELINE.md negative result), default runs the plain graph. Even
    widths only — odd-width inputs run the plain graph."""

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_cache = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def _packed_fwd(self):
        if getattr(self, "_packed_cache", None) is None:
            from larvanet_tpu.ops.packed_trunk import make_packed_ebrn_forward

            from larvanet_tpu.models.base import serving_compute_dtype
            self._packed_cache = make_packed_ebrn_forward(
                self, dtype=serving_compute_dtype(self))
        return self._packed_cache

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_full_ebrn", 0) and x.shape[2] % 2 == 0:
            return self._packed_fwd()(params, x)
        return super()._forward_impl(params, x)

    def _compute_loss(self, params, inputs, targets):
        if qat_requested(self):
            raise ValueError("--qat applies to the ebrn_rm variants (full "
                             "EBRN has no int8 serving path)")
        if getattr(self.args, "packed_full_ebrn", 0) and inputs.shape[2] % 2 == 0:
            return self.loss(self._packed_fwd()(params, inputs), targets)
        return super()._compute_loss(params, inputs, targets)


@register_model("ebrn")
def _create_ebrn():
    return type("EBRN", (_EBRNPackedMixin, _EBRNBase,), {})()


@register_model("ebrn_rm")
def _create_ebrn_rm():
    return type("EBRNRM", (_EBRNRMPackedMixin, _EBRNBase,), {"module_cls": EBRNRMModule})()


@register_model("ebrn_rm_BLI")
def _create_ebrn_rm_bli():
    return type(
        "EBRNRMBLI", (_EBRNRMPackedMixin, _EBRNBase,),
        {"module_cls": EBRNRMModule, "module_kwargs": {"bilinear_base": True}},
    )()
