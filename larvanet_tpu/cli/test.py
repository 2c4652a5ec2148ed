"""Benchmark-suite evaluation CLI (reference test.py).

Evaluates a restored model over benchmark dataset trees
(Set5/Set14/BSD100/Urban100/Manga109/DIV2K_val), computing Y-channel
PSNR/SSIM with border shaving for the paper protocol, or RGB PSNR for
DIV2K_val (reference test.py:152-170), writing SR PNGs and a log.txt.

The reference hardcodes C:/aim2020 dataset roots (test.py:91-93); here
they are flags with the same directory layout: `<input_root>/<dataset>/`
LR PNGs (DIV2K_val names them `<name>x4.png`), `<truth_root>/<dataset>/`
HR PNGs. The msrr_test special case ([0,1]-range model, test.py:132-146)
is preserved.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.data import io
from larvanet_tpu.eval import metrics
from larvanet_tpu.eval.pipeline import pipelined_upscale


def _calib_from_dir(lr_dir: str, num_images: int) -> np.ndarray:
    """int8 calibration batch from a benchmark LR tree: the first N
    images centre-cropped to their common (even-aligned) size, stacked
    NHWC float32 (mirrors cli/common.int8_calib_batch, which needs a
    loader; cli/test walks dataset dirs directly)."""
    names = [f for f in sorted(os.listdir(lr_dir)) if f.lower().endswith(".png")]
    imgs = [io.load_image_u8(os.path.join(lr_dir, f)).astype(np.float32)
            for f in names[: max(1, int(num_images))]]
    hh = min(im.shape[0] for im in imgs) // 2 * 2
    ww = min(im.shape[1] for im in imgs) // 2 * 2
    out = []
    for im in imgs:
        top = (im.shape[0] - hh) // 2
        left = (im.shape[1] - ww) // 2
        out.append(im[top: top + hh, left: left + ww])
    return np.stack(out)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="edsr", help="Name of the model.")
    parser.add_argument("--scales", type=str, default="4", help="Scales of the input images.")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored.")
    parser.add_argument("--restore_path", type=str, required=True,
                        help="Checkpoint path to be restored.")
    parser.add_argument("--collapsed_tail", type=int, default=1,
                        help="Exact collapsed linear tail for EDSR-family inference (ops/collapsed_tail.py).")
    parser.add_argument("--packed_trunk", type=int, default=1,
                        help="Width-packed trunk (exact; ops/packed_trunk.py). 0 = plain graph.")
    parser.add_argument("--input_root_path", type=str, default="data/test_LR",
                        help="Root of LR benchmark trees (reference hardcoded C:/aim2020/data/test_LR).")
    parser.add_argument("--truth_root_path", type=str, default="data/test_HR",
                        help="Root of HR benchmark trees.")
    parser.add_argument("--output_root_path", type=str, default="data/test_SR",
                        help="Root for SR outputs and log.txt.")
    parser.add_argument("--datasets", type=str,
                        default="Set5,Set14,BSD100,Urban100,Manga109",
                        help="Comma-separated dataset subdirs; DIV2K_val uses RGB PSNR.")
    parser.add_argument("--chop_forward", action="store_true")
    parser.add_argument("--chop_overlap_size", type=int, default=20)
    parser.add_argument("--device_uint8", type=int, default=1,
                        help="Quantize SR frames to uint8 ON DEVICE before the "
                             "device->host pull (byte-exact for the paper "
                             "protocol, which quantizes before shave/Y-PSNR).")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="Dispatch-ahead in the device-uint8 loop: overlap "
                             "each frame's device->host pull, the next frame's "
                             "PNG decode, and the host-side Y-PSNR/SSIM scoring "
                             "with device compute (eval/pipeline.py; 1 = serial).")
    parser.add_argument("--report_json", type=str,
                        help="Write per-image and mean PSNR/SSIM to this JSON file "
                             "(used by tools/protocol_parity.py).")
    parser.add_argument("--ema", type=int, default=0,
                        help="Serve the EMA weights from a --ema_decay checkpoint.")
    parser.add_argument("--int8_trunk", type=int, default=0,
                        help="int8 (W8A8) trunk serving path (opt-in; NOT float-exact "
                             "— measure with validate --int8_report first). Calibrates "
                             "activation scales on the first dataset's LR images.")
    parser.add_argument("--int8_calib_images", type=int, default=4,
                        help="LR images (first dataset, centre-cropped to a common "
                             "size) in the int8 activation-scale calibration batch.")
    common.add_serving_dtype_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    scale = scale_list[0]
    model, _, remaining = common.setup_model(args.model, remaining, scale_list, is_training=False)
    common.warn_leftovers(remaining)
    model.restore(ckpt_path=args.restore_path)
    common.maybe_use_ema(model, args)
    common.apply_serving_dtype(model, args)
    print("restored the model")
    common.maybe_collapse_tail(model, args)
    common.maybe_int8_trunk(model, args, lambda: _calib_from_dir(
        os.path.join(args.input_root_path, args.datasets.split(",")[0]),
        args.int8_calib_images))

    output_root = os.path.join(args.output_root_path, args.model)
    os.makedirs(output_root, exist_ok=True)
    log = open(os.path.join(output_root, "log.txt"), "w")

    datasets = [d for d in args.datasets.split(",") if d]
    results = []
    report = {}
    for dataset in datasets:
        input_path = os.path.join(args.input_root_path, dataset)
        truth_path = os.path.join(args.truth_root_path, dataset)
        output_path = os.path.join(output_root, dataset)
        os.makedirs(output_path, exist_ok=True)
        image_names = [f for f in sorted(os.listdir(truth_path)) if f.lower().endswith(".png")]
        print("%s: %d images are prepared" % (dataset, len(image_names)))
        log.write("%s: %d images are prepared\n" % (dataset, len(image_names)))

        def _input_name(image_name):
            if dataset == "DIV2K_val":
                return os.path.splitext(image_name)[0] + "x%d" % scale + ".png"
            return image_name

        def _outputs():
            """Yield (image_name, uint8 HWC SR frame) in dataset order."""
            direct_u8 = (args.model != "msrr_test" and args.device_uint8
                         and hasattr(model, "upscale_device"))
            if direct_u8 and args.pipeline_depth > 1:
                # dispatch-ahead: frame i's D2H pull + frame i+1's PNG
                # decode + host scoring overlap device compute
                # (eval/pipeline.py); byte-exact vs the serial branch.
                def _items():
                    for image_name in image_names:
                        yield image_name, io.load_image_chw(
                            os.path.join(input_path, _input_name(image_name)))
                for image_name, output_image, _dt in pipelined_upscale(
                        model, _items(), scale, uint8=True,
                        depth=args.pipeline_depth, chw=False):
                    yield image_name, output_image
                return
            for image_name in image_names:
                input_image = io.load_image_chw(
                    os.path.join(input_path, _input_name(image_name)))
                # model.test returns an NHWC device batch; [0] -> HWC host image.
                if args.model == "msrr_test":
                    # [0,1]-range contract (reference test.py:132-146, tensor2uint :21-25)
                    out = np.asarray(model.test([input_image / 255.0]))[0]
                    output_image = np.uint8((np.clip(out, 0.0, 1.0) * 255.0).round())
                elif direct_u8:
                    # paper protocol quantizes to uint8 before shave/Y-PSNR
                    # (reference test.py:152-157): on-device quantization
                    # before the D2H pull is byte-exact, 4x less transfer
                    output_image = np.asarray(model.upscale_device(
                        [input_image], scale, uint8=True))[0]
                else:
                    out = np.asarray(model.test(input_list=[input_image]))[0]
                    output_image = metrics.image_to_uint8(out)
                yield image_name, output_image

        start_time = time.perf_counter()
        psnr_list, ssim_list = [], []
        for image_index, (image_name, output_image) in enumerate(_outputs()):
            truth_image = io.load_image_u8(os.path.join(truth_path, image_name))  # HWC

            truth_fit = metrics.fit_truth_to_output(output_image, truth_image)
            truth_u8 = metrics.image_to_uint8(truth_fit)
            cropped_output = metrics.shave(output_image, scale)
            cropped_truth = metrics.shave(truth_u8, scale)

            if dataset == "DIV2K_val":
                psnr = metrics.psnr_rgb(output_image, truth_u8)
                ssim = metrics.ssim(output_image, truth_u8)
            else:
                oy = metrics.image_to_uint8(metrics.rgb_to_y(cropped_output))
                ty = metrics.image_to_uint8(metrics.rgb_to_y(cropped_truth))
                psnr = metrics.psnr_y(cropped_output, cropped_truth)
                ssim = metrics.ssim(oy, ty)

            psnr_list.append(psnr)
            ssim_list.append(ssim)
            io.save_image_hwc(output_image, os.path.join(output_path, image_name))
            line = "x%d, %d/%d, psnr=%.4f, ssim=%.4f" % (
                scale, image_index + 1, len(image_names), psnr, ssim)
            print(line)
            log.write(line + "\n")

        duration = time.perf_counter() - start_time
        results.append((dataset, float(np.mean(psnr_list)), float(np.mean(ssim_list)), duration))
        print("x%d, %s dataset, psnr=%.4f, ssim=%.4f, duration=%.0f"
              % (scale, dataset, results[-1][1], results[-1][2], duration))
        report[dataset] = {
            "mean_psnr": results[-1][1],
            "mean_ssim": results[-1][2],
            "per_image": {
                os.path.splitext(n)[0]: {"psnr": float(p), "ssim": float(s)}
                for n, p, s in zip(image_names, psnr_list, ssim_list)
            },
        }

    for dataset, psnr, ssim, duration in results:
        line = "%s, psnr=%.4f, ssim=%.4f, duration=%s" % (dataset, psnr, ssim, duration)
        print(line)
        log.write(line + "\n")
    log.close()
    if args.report_json:
        import json

        os.makedirs(os.path.dirname(args.report_json) or ".", exist_ok=True)
        with open(args.report_json, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print("finished")
    return results


if __name__ == "__main__":
    main()
