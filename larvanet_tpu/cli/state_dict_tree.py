"""Weight-space experiment CLI (reference state_dict_tree.py:91-96):
average two TreeNet branches' parameters into branch 0 and re-validate.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.eval import metrics


def average_branches(params, a: int, b: int):
    """Return params with branch `a` blocks replaced by the mean of
    branches a and b (flax param dict, branch_<i>_block_<j> naming)."""
    from flax import serialization

    state = serialization.to_state_dict(params)
    prefix_a, prefix_b = "branch_%d_" % a, "branch_%d_" % b
    for key in list(state.keys()):
        if key.startswith(prefix_a):
            twin = prefix_b + key[len(prefix_a):]
            if twin in state:
                state[key] = jax.tree_util.tree_map(
                    lambda x, y: (np.asarray(x) + np.asarray(y)) / 2.0,
                    state[key], state[twin],
                )
    return serialization.from_state_dict(params, state)


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_val_loader", default_model="TreeNet")
    parser.add_argument("--restore_path", type=str, required=True)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    scale = scale_list[0]
    dataloader, _, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    model, _, remaining = common.setup_model(args.model, remaining, scale_list, is_training=False)
    common.warn_leftovers(remaining)
    model.restore(ckpt_path=args.restore_path)
    print("restored the model")

    def validate(tag):
        psnrs = []
        for idx in range(dataloader.get_num_images()):
            inp, tru, _ = dataloader.get_image_pair(image_index=idx, scale=scale)
            out = model.upscale([inp], scale)[0]
            o8 = metrics.image_to_uint8(out)
            t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
            psnrs.append(metrics.psnr_rgb(o8, t8))
        print("%s: mean psnr=%.4f" % (tag, np.mean(psnrs)))

    validate("original (branch_0)")
    model.params = average_branches(model.params, 0, 1)
    validate("averaged (mean of branch_0, branch_1)")
    print("finished")


if __name__ == "__main__":
    main()
