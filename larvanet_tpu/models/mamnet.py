"""MAMNet: EDSR trunk with multi-path adaptive modulation blocks.

Reference models/mamnet.py: MAMBlock = conv-ReLU-conv + MAMLayer (:134-149);
the MAMLayer (:151-172) gates features with a sigmoid of the sum of three
modulation maps:
  CSI — per-channel spatial variance, broadcast over H,W;
  ICD — 1x1 squeeze-excite (reduction 16) of that variance vector;
  CSD — 3x3 depthwise conv of the features.
Trunk/topology and flags (--mamnet_*) otherwise match EDSR
(:196-228, :24-30). Stepwise Adam + L1.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import SRModel, l1_loss
from larvanet_tpu.models.layers import MeanShift, UpsampleBlock, conv3x3


class MAMLayer(nn.Module):
    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        # x: NHWC. Channel-wise spatial variance (torch .var over pixels is
        # the unbiased estimator, ddof=1 — mamnet.py:167).
        n_pix = x.shape[1] * x.shape[2]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=(1, 2), keepdims=True) / max(n_pix - 1, 1)
        csi = var  # broadcasts over H, W
        squeeze = conv3x3(self.features // self.reduction, name="du1",
                          in_features=self.features, kernel_size=1)
        excite = conv3x3(self.features, name="du2",
                         in_features=self.features // self.reduction, kernel_size=1)
        icd = excite(jax.nn.relu(squeeze(var)))
        csd = conv3x3(self.features, name="depthwise", in_features=self.features,
                      feature_group_count=self.features)(x)
        return x * jax.nn.sigmoid(csi + icd + csd)


class MAMBlock(nn.Module):
    features: int
    res_weight: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = conv3x3(self.features, name="conv1", in_features=self.features)(x)
        res = jax.nn.relu(res)
        res = conv3x3(self.features, name="conv2", in_features=self.features)(res)
        res = MAMLayer(self.features, name="mam")(res)
        if self.res_weight != 1.0:
            res = res * self.res_weight
        return x + res


class MAMNetModule(nn.Module):
    features: int = 64
    num_blocks: int = 16
    res_weight: float = 1.0
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
            res = MAMBlock(self.features, self.res_weight, name="mam_block_%d" % i)(res)
        res = conv3x3(self.features, name="after_res_conv", in_features=self.features)(res)
        x = x + res
        x = UpsampleBlock(self.features, self.scale, name="upsample")(x)
        x = conv3x3(3, name="final_conv", in_features=self.features)(x)
        return MeanShift(sign=-1.0, affine=self.mis_affine)(x)


class MAMNet(SRModel):
    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--mamnet_conv_features", type=int, default=64,
                            help="The number of convolutional features.")
        parser.add_argument("--mamnet_res_blocks", type=int, default=16,
                            help="The number of residual blocks.")
        parser.add_argument("--mamnet_res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--mamnet_learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--mamnet_learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--mamnet_learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk_train", type=int, default=0,
                            help="Fully width-packed TRAINING graph (exact incl. the MAM "
                                 "attention) — measured 5.7x SLOWER on v5e (the decomposed "
                                 "depthwise CSD backward is latency-bound; BASELINE.md "
                                 "negative result). Kept opt-in; default trains the plain "
                                 "trunk. Even-width patches only.")
        parser.add_argument("--collapsed_tail_train", type=int, default=1,
                            help="Train through the LIVE collapsed tail (plain trunk; "
                                 "loss/grad-equivalent, removes the 256-ch PixelShuffle "
                                 "transposes from fwd+bwd; ops/packed_trunk.py). "
                                 "0 = plain module graph.")
        parser.add_argument("--lr_domain_loss", type=int, default=1,
                            help="With --collapsed_tail_train: compute the training "
                                 "L1 loss PRE-SHUFFLE in the LR domain (targets "
                                 "pixel-unshuffled instead; identical per-element "
                                 "grads — mean-L1 is permutation-invariant). "
                                 "0 = HR-domain loss (bitwise-historical).")
        parser.add_argument("--qat", type=int, default=0,
                            help="UNSUPPORTED for mamnet (declared so the flag "
                                 "errors instead of vanishing as a leftover): "
                                 "mamnet trains the plain trunk — the packed "
                                 "training graph is a measured 5.7x regression "
                                 "— so there are no packed pairs to fake-"
                                 "quantize. Use post-training int8 with the "
                                 "--int8_report guardrail.")
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def prepare(self, is_training, scales, global_step=0, seed=0):
        if is_training and getattr(self.args, "qat", 0):
            raise ValueError(
                "--qat is unsupported for mamnet (plain-trunk training; no "
                "packed pairs to fake-quantize) — serve post-training int8 "
                "behind cli/validate.py --int8_report instead")
        self._packed_train = None
        self._collapsed_train = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def _compute_loss(self, params, inputs, targets):
        if getattr(self.args, "packed_trunk_train", 0) and inputs.shape[2] % 2:
            # The user explicitly opted into the packed training graph but
            # this patch width can't run it (the packed MAM variance would
            # see the pad column) — say so ONCE instead of silently
            # training a different graph per batch shape.
            if not getattr(self, "_warned_odd_packed", False):
                self._warned_odd_packed = True
                print("WARNING: --packed_trunk_train 1 but patch width %d is "
                      "odd — falling back to the %s graph for odd-width "
                      "batches (use an even --input_patch_size to stay packed)"
                      % (inputs.shape[2],
                         "collapsed-tail" if getattr(self.args, "collapsed_tail_train", 0)
                         else "plain module"))
        if getattr(self.args, "packed_trunk_train", 0) and inputs.shape[2] % 2 == 0:
            if getattr(self, "_packed_train", None) is None:
                from larvanet_tpu.ops.packed_trunk import (
                    make_packed_collapsed_mamnet_train_forward)

                self._packed_train = make_packed_collapsed_mamnet_train_forward(self)
            return self.loss(self._packed_train(params, inputs), targets)
        if getattr(self.args, "collapsed_tail_train", 0):
            lr_dom = bool(getattr(self.args, "lr_domain_loss", 0))
            if getattr(self, "_collapsed_train", None) is None:
                from larvanet_tpu.ops.packed_trunk import (
                    make_collapsed_mamnet_train_forward)

                self._collapsed_train = make_collapsed_mamnet_train_forward(
                    self, lr_domain=lr_dom)
            if lr_dom:
                from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

                targets = pixel_unshuffle(targets, self.scale)
            return self.loss(self._collapsed_train(params, inputs), targets)
        return super()._compute_loss(params, inputs, targets)

    def build_module(self):
        return MAMNetModule(
            features=self.args.mamnet_conv_features,
            num_blocks=self.args.mamnet_res_blocks,
            res_weight=self.args.mamnet_res_weight,
            scale=self.scale,
        )

    def get_learning_rate(self):
        return self.args.mamnet_learning_rate * (
            self.args.mamnet_learning_rate_decay
            ** (self.global_step // self.args.mamnet_learning_rate_decay_steps)
        )


@register_model("mamnet")
def _create_mamnet():
    return MAMNet()
