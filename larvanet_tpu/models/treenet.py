"""TreeNet: shared trunk + independent branches, branch-averaged loss.

Reference models/TreeNet.py: common parts = conv 3->48 + LReLU(0.1) +
`num_common_blocks` ResBlocks (:226-256); each branch =
`num_branch_blocks` ResBlocks + PixelShuffle(scale) (:246-250);
inference uses branch_0 + interpolated base (:258-264). Training
(:115-140) is volume-driven like LarvaNet but with AdamW + StepLR
stepped every batch (:92) and loss = mean over branches; restore uses
strict=False (:105).

The branch loop is embarrassingly parallel — all branches share the
trunk activation, so computing every branch in one jitted graph lets
XLA batch the branch convs (the reference's Python loop serializes them).
"""

from __future__ import annotations

import argparse
from typing import Union

import jax
from flax import linen as nn

from larvanet_tpu.core.config import parse_known
from larvanet_tpu.core.registry import register_model
from larvanet_tpu.models.base import (
    SRModel, add_lr_domain_flag, add_qat_flag, chw_list_to_nhwc, l1_loss,
    qat_requested)
from larvanet_tpu.models.layers import (
    ResBlock,
    conv3x3,
    get_activation,
    kaiming_normal_scaled,
    interpolated_base,
)
from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

FEATURES = 48


class TreeNetModule(nn.Module):
    num_common_blocks: int = 8
    num_branches: int = 1
    num_branch_blocks: int = 8
    interpolate: str = "bicubic"
    res_weight: float = 1.0
    scale: int = 4

    @nn.compact
    def __call__(self, x, branches: Union[str, int] = 0):
        """branches: an int selects one branch (inference uses 0,
        validate_tree sweeps them); 'all' returns every branch output."""
        lrelu = get_activation("leaky_relu", 0.1)
        fea = lrelu(conv3x3(FEATURES, name="first_conv",
                            kernel_init=kaiming_normal_scaled(0.1))(x))
        for i in range(self.num_common_blocks):
            fea = ResBlock(FEATURES, res_weight=self.res_weight, init_scale=0.1,
                           name="common_block_%d" % i)(fea)

        base = interpolated_base(x, self.scale, self.interpolate)

        def run_branch(b):
            h = fea
            for i in range(self.num_branch_blocks):
                h = ResBlock(FEATURES, res_weight=self.res_weight, init_scale=0.1,
                             name="branch_%d_block_%d" % (b, i))(h)
            return pixel_shuffle(h, self.scale) + base

        if branches == "all":
            return [run_branch(b) for b in range(self.num_branches)]
        return run_branch(int(branches))


class TreeNet(SRModel):
    optimizer_kind = "adamw"
    loss = staticmethod(l1_loss)

    def __init__(self):
        super().__init__()
        self.scheduler = None


    def parse_args(self, args):
        parser = argparse.ArgumentParser()
        parser.add_argument("--num_common_blocks", type=int, default=8,
                            help="The number of residual blocks.")
        parser.add_argument("--num_branches", type=int, default=1,
                            help="The number of branches.")
        parser.add_argument("--num_branch_blocks", type=int, default=8,
                            help="The number of residual blocks per branch.")
        parser.add_argument("--interpolate", type=str, default="bicubic",
                            help="Interpolation method.")
        parser.add_argument("--res_weight", type=float, default=1.0,
                            help="The scaling factor.")
        parser.add_argument("--lr", type=float, default=4e-4,
                            help="Initial learning rate.")
        parser.add_argument("--lr_decay", type=float, default=0.5,
                            help="Learning rate decay factor.")
        parser.add_argument("--lr_step", type=int, default=200000,
                            help="Learning rate decay step.")
        parser.add_argument("--val_volume", type=float, default=30e9,
                            help="How much volume need for validation.")
        parser.add_argument("--threshold", type=float, default=0.001,
                            help="Threshold for reduceLRonPlateau.")
        parser.add_argument("--min_lr", type=float, default=1e-8,
                            help="Minimum learning rate.")
        parser.add_argument("--patience", type=int, default=1,
                            help="patience for lr scheduler")
        parser.add_argument("--packed_trunk", type=int, default=1,
                            help="Width-packed trunk (exact; ops/packed_trunk.py). 0 = plain graph.")
        add_qat_flag(parser)
        add_lr_domain_flag(parser)
        self.args, remaining = parse_known(parser, args)
        return self.args, remaining

    def build_module(self):
        return TreeNetModule(
            num_common_blocks=self.args.num_common_blocks,
            num_branches=self.args.num_branches,
            num_branch_blocks=self.args.num_branch_blocks,
            interpolate=self.args.interpolate,
            res_weight=self.args.res_weight,
            scale=self.scale,
        )

    def _init_variables(self, rng, dummy):
        return self.module.init(rng, dummy, branches="all")

    def prepare(self, is_training, scales, global_step=0, seed=0):
        self._packed_cache = None
        self._qat_cache = None
        self._packed_cache_lr = None
        self._qat_cache_lr = None
        super().prepare(is_training, scales, global_step=global_step, seed=seed)
        if is_training:
            from larvanet_tpu.train.schedules import StepLR

            self.scheduler = StepLR(
                base_lr=self.args.lr, step_size=self.args.lr_step,
                gamma=self.args.lr_decay, last_epoch=global_step,
            )

    def get_learning_rate(self):
        return self.scheduler.get_lr() if self.scheduler is not None else self.args.lr

    def _packed_fwd(self, qat=False, lr_domain=False):
        attr = "_qat_cache" if qat else "_packed_cache"
        if lr_domain:
            attr += "_lr"
        if getattr(self, attr, None) is None:
            from larvanet_tpu.ops.packed_trunk import make_packed_treenet_forward

            from larvanet_tpu.models.base import serving_compute_dtype
            setattr(self, attr, make_packed_treenet_forward(
                self, dtype=serving_compute_dtype(self), qat=qat,
                lr_domain=lr_domain))
        return getattr(self, attr)

    def _forward_impl(self, params, x):
        if getattr(self.args, "packed_trunk", 0):
            return self._packed_fwd()(params, x)
        return super()._forward_impl(params, x)

    def _compute_loss(self, params, inputs, targets):
        from larvanet_tpu.models.base import lr_domain_requested

        if getattr(self.args, "packed_trunk", 0):
            lr_dom = lr_domain_requested(self)
            fwd = self._packed_fwd(qat=qat_requested(self), lr_domain=lr_dom)
            outs = fwd(params, inputs, branches="all")
            if lr_dom:
                from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

                targets = pixel_unshuffle(targets, self.scale)
        else:
            outs = self.module.apply({"params": params}, inputs, branches="all")
        losses = [l1_loss(o, targets) for o in outs]
        return sum(losses) / len(losses)

    def restore(self, ckpt_path, target=None, strict=False):
        # strict=False parity with reference TreeNet.py:105
        super().restore(ckpt_path, target=target, strict=False)

    # Volume-driven loop, StepLR stepped per batch (reference :115-140).
    def train_step_larva(self, args, val_dataloader, input_batch, truth_batch, summary=None):
        inputs = chw_list_to_nhwc(input_batch)
        targets = chw_list_to_nhwc(truth_batch)
        self.global_step += 1
        self.temp_volume += self.volume_per_step
        lr = self.get_learning_rate()
        self.params, self.opt_state, loss = self._train_jit(
            self.params, self.opt_state, lr, inputs, targets
        )
        self.scheduler.step()

        if self.temp_volume >= self.args.val_volume:
            self.total_volume += self.temp_volume
            self.temp_volume = 0
            if val_dataloader is not None:
                self.validate_for_train(args, val_dataloader)
            if args is not None and getattr(args, "train_path", None):
                self.save(base_path=args.train_path)
                print("saved a model checkpoint at volume %.0fG" % (self.total_volume / 1e9,))
        return float(loss)

    def validate_for_train(self, args, dataloader):
        """Full val-set PSNR print; the StepLR is batch-driven, so unlike
        LarvaNet no scheduler step happens here (reference TreeNet.py:136)."""
        import numpy as np

        psnr_list = []
        for idx in range(dataloader.get_num_images()):
            input_image, truth_image, _ = dataloader.get_image_pair(image_index=idx, scale=4)
            psnr_list.append(self.psnr_on_device(input_image, truth_image))
        average_psnr = float(np.mean(psnr_list))
        print("step %d, volume %.0fG, psnr=%.8f, lr = %.8f"
              % (self.global_step, self.total_volume / 1e9, average_psnr, self.get_learning_rate()))
        return average_psnr

    def upscale_branch_device(self, input_list, scale, branch: int,
                              uint8: bool = False):
        """Dispatch branch `branch`'s forward, returning the DEVICE NHWC
        batch without blocking — the per-branch analog of
        base.upscale_device, so validate_tree's --pipeline_depth can
        overlap D2H pulls with the next dispatch. Jits are cached per
        branch (the old per-call jax.jit retraced on every image)."""
        import jax.numpy as jnp

        if not hasattr(self, "_branch_jits"):
            self._branch_jits = {}
        key = (branch, uint8)
        if key not in self._branch_jits:
            def fwd(p, xx, _b=branch, _u8=uint8):
                out = self.module.apply({"params": p}, xx, branches=_b)
                if _u8:  # challenge-protocol quantize on device (byte-
                    # exact vs host image_to_uint8 — models/base.py:516)
                    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
                return out

            self._branch_jits[key] = jax.jit(fwd)
        x = chw_list_to_nhwc(input_list)
        return self._branch_jits[key](self.params, x)

    def upscale_branch(self, input_list, scale, branch: int):
        """Per-branch eval used by validate_tree (reference validate_tree.py:94-121)."""
        import numpy as np

        out = self.upscale_branch_device(input_list, scale, branch)
        return np.asarray(out).transpose(0, 3, 1, 2)

    def _state_dict(self):
        state = super()._state_dict()
        if self.scheduler is not None:
            state["scheduler"] = self.scheduler.state_dict()
        return state

    def _load_state_dict(self, state, strict=True):
        super()._load_state_dict(state, strict=strict)
        if self.scheduler is not None and "scheduler" in state:
            self.scheduler.load_state_dict(state["scheduler"])


@register_model("TreeNet")
def _create_treenet():
    return TreeNet()
