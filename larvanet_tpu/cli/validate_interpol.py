"""Null-model baseline: validate pure interpolation upscaling
(reference validate_interpol.py — F.interpolate as the 'model', :79).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.eval import metrics
from larvanet_tpu.ops.resize import upsample


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_val_loader")
    parser.add_argument("--interpolate", type=str, default="bilinear",
                        help="Interpolation method (bilinear/bicubic/nearest; "
                             "reference validate_interpol.py:41 default).")
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    dataloader, _, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    common.warn_leftovers(remaining)

    results = {}
    for scale in scale_list:
        psnr_list, duration_list, per_image = [], [], {}
        n = dataloader.get_num_images()
        for idx in range(n):
            inp, tru, name = dataloader.get_image_pair(image_index=idx, scale=scale)
            t0 = time.perf_counter()
            out = np.asarray(upsample(inp, scale, args.interpolate, axes=(-2, -1)))
            duration_list.append(time.perf_counter() - t0)
            o8 = metrics.image_to_uint8(out)
            t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
            psnr = metrics.psnr_rgb(o8, t8)
            psnr_list.append(psnr)
            per_image[name] = float(psnr)
            print("x%d, %d/%d, psnr=%.2f" % (scale, idx + 1, n, psnr))
        print("x%d, psnr=%.2f, duration=%.4f"
              % (scale, np.mean(psnr_list), np.mean(duration_list)))
        results[scale] = {"mean_psnr": float(np.mean(psnr_list)),
                          "per_image": per_image}
    print("finished")
    return results


if __name__ == "__main__":
    main()
