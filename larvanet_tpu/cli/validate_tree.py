"""TreeNet per-branch validation (reference validate_tree.py:94-121):
runs the shared trunk once per image and scores each branch's PSNR
separately.
"""

from __future__ import annotations

import argparse

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.eval import metrics
from larvanet_tpu.eval.pipeline import pipelined_upscale


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_val_loader", default_model="TreeNet")
    parser.add_argument("--restore_path", type=str, required=True)
    parser.add_argument("--restore_global_step", type=int, default=0)
    parser.add_argument("--pipeline_depth", type=int, default=1,
                        help="Dispatch-ahead depth (eval/pipeline.py): "
                             "overlap each image's D2H pull and host PSNR "
                             "with the next dispatch, per branch. Byte-"
                             "exact vs the serial loop; 1 = serial.")
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    scale = scale_list[0]
    dataloader, _, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False,
        global_step=args.restore_global_step,
    )
    common.warn_leftovers(remaining)
    model.restore(ckpt_path=args.restore_path)
    print("restored the model")

    num_branches = model.args.num_branches
    branch_psnrs = {b: [] for b in range(num_branches)}
    per_image = {b: {} for b in range(num_branches)}
    n = dataloader.get_num_images()
    if args.pipeline_depth > 1 and hasattr(model, "upscale_branch_device"):
        # dispatch-ahead per branch: image i's uint8 D2H pull + host PSNR
        # overlap image i+1's branch forward (byte-exact: the on-device
        # quantize equals image_to_uint8 — models/base.py:516)
        for b in range(num_branches):
            def _items(_b=b):
                for idx in range(n):
                    inp, tru, name = dataloader.get_image_pair(
                        image_index=idx, scale=scale)
                    yield (name, tru), inp

            for (name, tru), o8, _dt in pipelined_upscale(
                    model, _items(), scale, uint8=True,
                    depth=args.pipeline_depth, chw=True,
                    dispatch=lambda imgs, _b=b: model.upscale_branch_device(
                        imgs, scale, _b, uint8=True)):
                t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
                psnr = metrics.psnr_rgb(o8, t8)
                branch_psnrs[b].append(psnr)
                per_image[b][name] = float(psnr)
        names = list(per_image[0])
        for idx, name in enumerate(names):
            print("%d/%d %s: %s" % (idx + 1, n, name,
                                    " ".join("b%d=%.2f" % (b, per_image[b][name])
                                             for b in range(num_branches))))
    else:
        for idx in range(n):
            inp, tru, name = dataloader.get_image_pair(image_index=idx, scale=scale)
            t8_full = metrics.image_to_uint8(tru)
            for b in range(num_branches):
                out = model.upscale_branch([inp], scale, b)[0]
                o8 = metrics.image_to_uint8(out)
                t8 = metrics.fit_truth_to_output(o8, t8_full)
                psnr = metrics.psnr_rgb(o8, t8)
                branch_psnrs[b].append(psnr)
                per_image[b][name] = float(psnr)
            print("%d/%d %s: %s" % (idx + 1, n, name,
                                    " ".join("b%d=%.2f" % (b, branch_psnrs[b][-1])
                                             for b in range(num_branches))))
    for b in range(num_branches):
        print("branch %d: mean psnr=%.4f" % (b, np.mean(branch_psnrs[b])))
    print("finished")
    return {b: {"mean_psnr": float(np.mean(branch_psnrs[b])),
                "per_image": per_image[b]} for b in range(num_branches)}


if __name__ == "__main__":
    main()
