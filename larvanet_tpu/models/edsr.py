"""EDSR-baseline, TPU-native (reference models/edsr.py and models/edsr_loss.py).

Network (reference models/edsr.py:195-207): mean-shift -> conv3->F ->
N x ResBlock(res_weight) -> conv + global skip -> UpsampleBlock
(PixelShuffle) -> conv F->3 -> inverse mean-shift.

Flags keep the reference names: --edsr_conv_features (64),
--edsr_res_blocks (16), --edsr_res_weight (1.0), --edsr_learning_rate
(1e-4) with step decay (0.5 every 200k steps), Adam + L1
(reference models/edsr.py:25-31,49-56,124-125).

`edsr_loss` is the same network trained with the robust sqrt loss
mean((|o-t|+1e-5)^0.5) (reference models/edsr_loss.py:35-37).
"""

from __future__ import annotations

import argparse

from flax import linen as nn

from larvanet_tpu.core.registry import register_model
from larvanet_tpu.core.config import parse_known
from larvanet_tpu.models.base import (
    SRModel,
    add_qat_flag,
    l1_loss,
    qat_requested,
    robust_sqrt_loss,
)
from larvanet_tpu.models.layers import (
    MeanShift,
    ResBlock,
    UpsampleBlock,
    conv3x3,
)


class EDSRModule(nn.Module):
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
            res = ResBlock(self.features, res_weight=self.res_weight, name="res_block_%d" % i)(res)
        res = conv3x3(self.features, name="after_res_conv", in_features=self.features)(res)
        x = x + res
        x = UpsampleBlock(self.features, self.scale, name="upsample")(x)
        x = conv3x3(3, name="final_conv", in_features=self.features)(x)
        x = MeanShift(sign=-1.0, affine=self.mis_affine)(x)
        return x


class EDSR(SRModel):
    optimizer_kind = "adam"
    loss = staticmethod(l1_loss)

    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--edsr_conv_features", type=int, default=64,
                            help="The number of convolutional features.")
        parser.add_argument("--edsr_res_blocks", type=int, default=16,
                            help="The number of residual blocks.")
        parser.add_argument("--edsr_res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--edsr_learning_rate", type=float, default=1e-4,
                            help="Initial learning rate.")
        parser.add_argument("--edsr_learning_rate_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--edsr_learning_rate_decay_steps", type=int, default=200000,
                            help="The number of training steps to perform learning rate decay.")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed trunk for training (exact reparametrization, "
                                 "~1.5x on TPU; ops/packed_trunk.py). 0 = plain module graph.")
        parser.add_argument("--lr_domain_loss", type=int, default=1,
                            help="With --collapsed_tail_train: compute the training "
                                 "L1 loss PRE-SHUFFLE in the LR domain (targets are "
                                 "pixel-unshuffled instead; mean-L1 is permutation-"
                                 "invariant, so per-element grads are identical and "
                                 "the loss differs only in f32 summation order) — the "
                                 "output depth-to-space transpose leaves fwd AND bwd. "
                                 "0 = HR-domain loss (bitwise-historical).")
        parser.add_argument("--collapsed_tail_train", type=int, default=1,
                            help="Train through the LIVE collapsed tail (differentiable "
                                 "in-graph composition of the upsample chain; loss/grad-"
                                 "equivalent, removes the 256-ch PixelShuffle transposes "
                                 "from fwd+bwd; ops/packed_trunk.py). Requires "
                                 "--packed_trunk. 0 = plain live tail.")
        add_qat_flag(parser)
        parser.add_argument("--train_dtype", type=str, default="f32",
                            choices=["f32", "bf16"],
                            help="Compute dtype of the training graph. bf16 = mixed "
                                 "precision: convs/activations in bfloat16, loss "
                                 "reduction, master params, grads, and optimizer in "
                                 "f32. NOT bit-identical to f32 training — validate "
                                 "convergence on your recipe (BASELINE.md).")
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def _train_compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if getattr(self.args, "train_dtype", "f32") == "bf16" \
            else jnp.float32

    def _compute_loss(self, params, inputs, targets):
        if getattr(self.args, "packed_trunk", 0):
            collapsed = getattr(self.args, "collapsed_tail_train", 0)
            lr_domain = bool(collapsed
                             and getattr(self.args, "lr_domain_loss", 0))
            if getattr(self, "_packed_train", None) is None:
                from larvanet_tpu.ops.packed_trunk import (
                    make_packed_collapsed_edsr_train_forward,
                    make_packed_edsr_train_forward,
                )

                if collapsed:
                    self._packed_train = make_packed_collapsed_edsr_train_forward(
                        self, dtype=self._train_compute_dtype(),
                        qat=qat_requested(self), lr_domain=lr_domain)
                else:
                    self._packed_train = make_packed_edsr_train_forward(
                        self, dtype=self._train_compute_dtype(),
                        qat=qat_requested(self))
            if lr_domain:
                # LR-domain loss: unshuffle the TARGETS (constants — no
                # backward) instead of shuffling the output (fwd + bwd
                # transposes); mean-L1 is permutation-invariant so per-
                # element grads are identical (tests/test_collapsed_tail.py)
                from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

                return self.loss(self._packed_train(params, inputs),
                                 pixel_unshuffle(targets, self.scale))
            # bf16 out - f32 targets promotes: the loss reduction stays f32
            return self.loss(self._packed_train(params, inputs), targets)
        return super()._compute_loss(params, inputs, targets)

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_train = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)

    def build_module(self):
        return EDSRModule(
            features=self.args.edsr_conv_features,
            num_blocks=self.args.edsr_res_blocks,
            res_weight=self.args.edsr_res_weight,
            scale=self.scale,
        )

    def get_learning_rate(self):
        return self.args.edsr_learning_rate * (
            self.args.edsr_learning_rate_decay
            ** (self.global_step // self.args.edsr_learning_rate_decay_steps)
        )


@register_model("edsr")
def create_edsr():
    return EDSR()


class EDSRLoss(EDSR):
    loss = staticmethod(robust_sqrt_loss)


@register_model("edsr_loss")
def create_edsr_loss():
    return EDSRLoss()
