"""Checkpoint-sweep PSNR trend CLI (reference PSNR_trend.py).

Validates every checkpoint in a directory against the val set and prints
the PSNR trend per checkpoint (reference PSNR_trend.py:86-119).
"""

from __future__ import annotations

import argparse
import glob
import os
import re

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.eval import metrics
from larvanet_tpu.eval.pipeline import pipelined_upscale


def _step_of(path: str) -> int:
    m = re.search(r"(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_val_loader", default_model="edsr")
    parser.add_argument("--restore_dir", type=str, required=True,
                        help="Directory of checkpoints to sweep (*.ckpt).")
    parser.add_argument("--ema", type=int, default=0,
                        help="Sweep the EMA weights of --ema_decay "
                             "checkpoints instead of the live params.")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="Dispatch-ahead in the sweep loop (eval/pipeline.py): "
                             "overlap D2H pulls and host PSNR with device compute; "
                             "byte-exact (the trend quantizes to uint8 first). "
                             "1 = serial f32-pull loop.")
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    scale = scale_list[0]
    dataloader, _, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    model, _, remaining = common.setup_model(args.model, remaining, scale_list, is_training=False)
    common.warn_leftovers(remaining)

    ckpts = sorted(glob.glob(os.path.join(args.restore_dir, "*.ckpt")), key=_step_of)
    if not ckpts:
        raise FileNotFoundError("no *.ckpt files in %s" % (args.restore_dir,))

    trend = []
    for ckpt in ckpts:
        model.restore(ckpt_path=ckpt)
        common.maybe_use_ema(model, args)
        psnr_list = []
        if args.pipeline_depth > 1 and hasattr(model, "upscale_device"):
            # device-uint8 + dispatch-ahead (eval/pipeline.py): the trend
            # quantizes to uint8 before PSNR, so quantizing on device and
            # overlapping pulls with compute is byte-exact and 4x less D2H.
            def _items():
                for idx in range(dataloader.get_num_images()):
                    inp, tru, _ = dataloader.get_image_pair(
                        image_index=idx, scale=scale)
                    yield tru, inp

            for tru, o8, _dt in pipelined_upscale(
                    model, _items(), scale, uint8=True,
                    depth=args.pipeline_depth, chw=True):
                t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
                psnr_list.append(metrics.psnr_rgb(o8, t8))
        else:
            for idx in range(dataloader.get_num_images()):
                inp, tru, _ = dataloader.get_image_pair(image_index=idx, scale=scale)
                out = model.upscale(input_list=[inp], scale=scale)[0]
                o8 = metrics.image_to_uint8(out)
                t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
                psnr_list.append(metrics.psnr_rgb(o8, t8))
        mean_psnr = float(np.mean(psnr_list))
        trend.append((os.path.basename(ckpt), mean_psnr))
        print("%s: psnr=%.4f" % (os.path.basename(ckpt), mean_psnr))

    best = max(trend, key=lambda t: t[1])
    print("best: %s (psnr=%.4f)" % best)
    print("finished")
    return trend


if __name__ == "__main__":
    main()
