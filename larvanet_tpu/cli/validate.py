"""Full-image validation CLI (reference validate.py).

Per image: upscale (optionally chop-forward or batched-tile), uint8
round/clip, crop truth to output, RGB PSNR; optional PNG save; mean
PSNR/duration per scale (reference validate.py:83-123).

TPU addition: --tile_forward runs the batched fixed-shape tile engine
(one XLA compile for the whole run) instead of per-image-shape
compilation; --chop_forward keeps the reference's exact 2x2 semantics.
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
from larvanet_tpu.eval.tiling import TiledUpscaler, upscale_with_chop_forward


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_val_loader", default_model="edsr")
    parser.add_argument("--restore_path", type=str, default=None,
                        help="Checkpoint path to be restored (or --artifact).")
    parser.add_argument("--restore_target", type=str,
                        help="Target of the restoration.")
    parser.add_argument("--restore_global_step", type=int, default=0,
                        help="Global step of the restored model.")
    parser.add_argument("--save_path", type=str,
                        help="Base output path of the upscaled images.")
    parser.add_argument("--chop_forward", action="store_true",
                        help="Employ chop-forward to reduce the memory usage.")
    parser.add_argument("--chop_overlap_size", type=int, default=20,
                        help="The overlapping size for the chop-forward process. Should be even.")
    parser.add_argument("--tile_forward", action="store_true",
                        help="Batched fixed-shape tiled inference (TPU fast path, one compile).")
    parser.add_argument("--tile_size", type=int, default=128,
                        help="LR tile size for --tile_forward.")
    parser.add_argument("--tile_overlap", type=int, default=24,
                        help="LR tile overlap for --tile_forward; half of it should exceed the model's receptive radius for bit-exact results.")
    parser.add_argument("--self_ensemble", action="store_true",
                        help="x8 dihedral test-time augmentation, all orientations batched in one jit (new capability).")
    parser.add_argument("--device_uint8", type=int, default=1,
                        help="Quantize SR frames to uint8 ON DEVICE before the "
                             "device->host pull in the direct path (the protocol "
                             "quantizes first anyway — byte-exact, 4x less transfer).")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="Dispatch-ahead in the direct device-uint8 loop: "
                             "overlap each frame's device->host pull, the next "
                             "frame's decode, the PNG write, and the host PSNR "
                             "with device compute (eval/pipeline.py; 1 = serial).")
    parser.add_argument("--dp_devices", type=int, default=0,
                        help="Shard eval tile batches across N devices (data-parallel "
                             "serving; use with --tile_forward; 0 = off).")
    parser.add_argument("--spatial_shard", type=int, default=0,
                        help="Shard full-frame inference height across N devices with halo exchange (0 = off).")
    parser.add_argument("--spatial_halo", type=int, default=32,
                        help="Halo rows exchanged between spatial shards; should exceed the model's receptive radius.")
    parser.add_argument("--collapsed_tail", type=int, default=1,
                        help="Exact collapsed linear tail for EDSR-family inference (1.6x on TPU; ops/collapsed_tail.py).")
    parser.add_argument("--packed_trunk", type=int, default=1,
                        help="Width-packed trunk for EDSR-family inference (exact; ~1.45x on TPU; ops/packed_trunk.py).")
    parser.add_argument("--int8_trunk", type=int, default=0,
                        help="Opt-in W8A8 quantized trunk (EDSR/LarvaNet families; "
                             "NOT float-exact, ~-0.06 dB measured; see --int8_report).")
    parser.add_argument("--wino_trunk", type=int, default=0,
                        help="Opt-in fused Pallas Winograd trunk for EDSR: 2 = "
                             "F(2,3), 4 = F(4,3) (ops/wino_pallas.py; float-"
                             "tolerance equal, TPU only; 0 = off). MEASURED "
                             "7-9x SLOWER than the default packed trunk on "
                             "v5e — negative-result record, see BASELINE.md.")
    parser.add_argument("--int8_calib_images", type=int, default=4,
                        help="Number of val images stacked (centre-cropped) into the "
                             "int8 activation-scale calibration batch.")
    parser.add_argument("--int8_report", action="store_true",
                        help="With --int8_trunk: also run the EXACT packed forward per "
                             "image and print the int8-vs-exact PSNR delta (the "
                             "accuracy guardrail; dB deltas also land in --report_json).")
    parser.add_argument("--int8_max_drop", type=float, default=0.1,
                        help="With --int8_report: refuse to bless the int8 path (exit "
                             "code 3) if the mean PSNR drop vs the exact forward "
                             "exceeds this many dB.")
    parser.add_argument("--report_json", type=str,
                        help="Write per-image and mean PSNRs to this JSON file "
                             "(used by tools/protocol_parity.py).")
    parser.add_argument("--ema", type=int, default=0,
                        help="Serve the EMA weights from a --ema_decay checkpoint.")
    parser.add_argument("--artifact", type=str, default=None,
                        help="Validate a StableHLO serving artifact "
                             "(cli/export.py --stablehlo) instead of a "
                             "checkpoint — the challenge protocol runs "
                             "against THE FILE production deploys. Images "
                             "must match the exported geometry, or pass "
                             "--tile_forward (tile size auto-set).")
    common.add_serving_dtype_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    dataloader, _, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    if args.artifact:
        from larvanet_tpu.utils.aot import ArtifactModel

        for flag in ("chop_forward", "self_ensemble", "int8_trunk",
                     "spatial_shard", "ema", "dp_devices"):
            if getattr(args, flag, 0):
                raise SystemExit("--%s does not apply to --artifact "
                                 "validation (the graph is baked into the "
                                 "file)" % flag)
        if getattr(args, "serving_dtype", "f32") != "f32":
            raise SystemExit("--serving_dtype does not apply to --artifact "
                             "validation (the compute dtype was baked at "
                             "export — use cli/export.py --export_dtype)")
        if args.restore_path:
            raise SystemExit("pass --restore_path OR --artifact, not both")
        model = ArtifactModel(args.artifact)
        common.warn_leftovers(remaining)
        if scale_list != [model.scale]:
            raise SystemExit("artifact is x%d; pass --scales %d"
                             % (model.scale, model.scale))
        if args.tile_forward:
            if model.height != model.width:
                raise SystemExit("--tile_forward needs a square exported "
                                 "geometry (got %dx%d)"
                                 % (model.height, model.width))
            args.tile_size = model.height  # the artifact's one shape
        print("validating serving artifact %s (%s; input %s)"
              % (args.artifact, model.header.get("path_desc", ""),
                 model.header.get("input_shape")))
    else:
        if not args.restore_path:
            raise SystemExit("pass --restore_path (checkpoint) or --artifact")
        model, _, remaining = common.setup_model(
            args.model, remaining, scale_list, is_training=False, global_step=args.restore_global_step
        )
        common.warn_leftovers(remaining)

        model.restore(ckpt_path=args.restore_path, target=args.restore_target)
        common.maybe_use_ema(model, args)
        common.apply_serving_dtype(model, args)
        print("restored the model")
        common.maybe_collapse_tail(model, args)
        common.maybe_wino_trunk(model, args)
        common.maybe_int8_trunk(model, args, lambda: common.int8_calib_batch(
            dataloader, scale_list[0], args.int8_calib_images))
        common.maybe_spatial_shard(model, args, scale_list[0])
    if args.dp_devices > 1:
        import jax

        from larvanet_tpu.parallel.mesh import make_mesh, use_data_parallel_eval

        mesh = make_mesh((args.dp_devices,), ("data",),
                         devices=jax.devices()[: args.dp_devices])
        use_data_parallel_eval(model, mesh)
        print("eval: tile batches sharded over %d devices" % (args.dp_devices,))
        if not args.tile_forward:
            print("WARNING: --dp_devices without --tile_forward: full-frame "
                  "batches of 1 cannot shard; pass --tile_forward")
    int8_report = args.int8_report and hasattr(model, "_int8_exact_jit")
    if args.int8_report and not int8_report:
        print("--int8_report: int8 trunk is not active; nothing to report")
    if int8_report and (args.chop_forward or args.tile_forward):
        # the exact-side forward below runs full-frame; under tiling the
        # reported delta would conflate seam error with quantization
        # error, and the full-frame compile defeats the point of tiling
        # (advisor r2)
        raise SystemExit(
            "--int8_report requires direct (non-tiled) forwards: drop "
            "--chop_forward/--tile_forward so the int8-vs-exact delta "
            "measures quantization alone")

    print("begin validation")
    num_images = dataloader.get_num_images()
    average_psnr_dict = {}
    average_duration_dict = {}
    report = {}
    int8_verdicts = []
    for scale in scale_list:
        if args.self_ensemble:
            from larvanet_tpu.eval.ensemble import self_ensemble_forward

            se = self_ensemble_forward(model._forward_impl)
            fwd = lambda batch: se(model.params, np.asarray(batch, np.float32))
        else:
            fwd = lambda batch: model.fwd_runtime(np.asarray(batch, np.float32))
        tiler = None
        if args.tile_forward:
            tiler = TiledUpscaler(
                fwd, scale=scale, tile_size=args.tile_size, overlap=args.tile_overlap,
                min_batch=max(1, args.dp_devices),
            )
        duration_list, psnr_list, name_list, int8_deltas = [], [], [], []

        def _score(image_index, image_name, truth_image, output_image, duration):
            duration_list.append(duration)
            truth_u8 = metrics.image_to_uint8(truth_image)
            output_u8 = metrics.image_to_uint8(output_image)
            if args.save_path is not None:
                out_dir = os.path.join(args.save_path, "x%d" % scale)
                io.save_image_chw(output_u8, os.path.join(out_dir, image_name + ".png"))
            truth_u8 = metrics.fit_truth_to_output(output_u8, truth_u8)
            psnr = metrics.psnr_rgb(output_u8, truth_u8)
            psnr_list.append(psnr)
            name_list.append(image_name)
            print("x%d, %d/%d, psnr=%.2f, duration=%.4f"
                  % (scale, image_index + 1, num_images, psnr, duration))

        serial_indices = range(num_images)
        direct_u8 = (args.device_uint8 and hasattr(model, "upscale_device")
                     and hasattr(model, "upscale_uint8")
                     and not args.chop_forward and tiler is None
                     and not args.self_ensemble and not int8_report)
        if direct_u8 and args.pipeline_depth > 1:
            # dispatch-ahead (eval/pipeline.py): frame i's D2H pull, frame
            # i+1's decode, the PNG write, and the host PSNR all overlap
            # device compute; byte-exact vs the serial upscale_uint8 branch.
            def _items():
                for image_index in range(num_images):
                    input_image, truth_image, image_name = \
                        dataloader.get_image_pair(image_index=image_index, scale=scale)
                    yield (image_index, image_name, truth_image), input_image

            for (image_index, image_name, truth_image), out_u8, dt in \
                    pipelined_upscale(model, _items(), scale, uint8=True,
                                      depth=args.pipeline_depth, chw=True):
                _score(image_index, image_name, truth_image, out_u8, dt)
            serial_indices = ()  # handled

        for image_index in serial_indices:
            input_image, truth_image, image_name = dataloader.get_image_pair(
                image_index=image_index, scale=scale
            )
            start_time = time.perf_counter()
            if args.chop_forward:
                output_image = upscale_with_chop_forward(
                    model=model, input_image=input_image, scale=scale,
                    overlap_size=args.chop_overlap_size,
                )
            elif tiler is not None:
                output_image = tiler.upscale_chw(input_image)
            elif args.self_ensemble:
                x = np.asarray(input_image, np.float32).transpose(1, 2, 0)[None]
                output_image = np.asarray(fwd(x))[0].transpose(2, 0, 1)
            elif args.device_uint8 and hasattr(model, "upscale_uint8"):
                # the protocol quantizes to uint8 FIRST (reference
                # validate.py:17-18), so quantizing on device before the
                # D2H pull is byte-exact and moves 4x less data — the
                # transfer is the dominant cost of full-frame eval
                output_image = model.upscale_uint8(
                    input_list=[input_image], scale=scale)[0]
            else:
                output_image = model.upscale(input_list=[input_image], scale=scale)[0]
            duration = time.perf_counter() - start_time
            duration_list.append(duration)

            truth_u8 = metrics.image_to_uint8(truth_image)
            output_u8 = metrics.image_to_uint8(output_image)
            if args.save_path is not None:
                out_dir = os.path.join(args.save_path, "x%d" % scale)
                io.save_image_chw(output_u8, os.path.join(out_dir, image_name + ".png"))
            truth_u8 = metrics.fit_truth_to_output(output_u8, truth_u8)
            psnr = metrics.psnr_rgb(output_u8, truth_u8)
            psnr_list.append(psnr)
            name_list.append(image_name)
            if int8_report:
                xin = np.ascontiguousarray(
                    np.asarray(input_image, np.float32).transpose(1, 2, 0))[None]
                exact_chw = np.asarray(
                    model._int8_exact_jit(model.params, xin))[0].transpose(2, 0, 1)
                exact_psnr = metrics.psnr_rgb(
                    metrics.image_to_uint8(exact_chw), truth_u8)
                int8_deltas.append(psnr - exact_psnr)
                print("x%d, %d/%d, psnr=%.2f, duration=%.4f  [int8 %.4f vs exact "
                      "%.4f dB, delta %+.4f]"
                      % (scale, image_index + 1, num_images, psnr, duration,
                         psnr, exact_psnr, psnr - exact_psnr))
                continue
            print("x%d, %d/%d, psnr=%.2f, duration=%.4f"
                  % (scale, image_index + 1, num_images, psnr, duration))

        average_psnr_dict[scale] = float(np.mean(psnr_list))
        average_duration_dict[scale] = float(np.mean(duration_list))
        print("x%d, psnr=%.2f, duration=%.4f"
              % (scale, average_psnr_dict[scale], average_duration_dict[scale]))
        if int8_report:
            mean_delta = float(np.mean(int8_deltas))
            worst = float(np.min(int8_deltas))
            print("x%d, int8-vs-exact: mean delta %+.4f dB, worst %+.4f dB "
                  "(threshold --int8_max_drop %.3f)"
                  % (scale, mean_delta, worst, args.int8_max_drop))
            int8_verdicts.append((scale, mean_delta, worst))
        if args.report_json:
            report.setdefault("scales", {})[str(scale)] = {
                "mean_psnr": average_psnr_dict[scale],
                "per_image": dict(zip(name_list, map(float, psnr_list))),
            }
            if int8_report:
                report["scales"][str(scale)]["int8_vs_exact"] = {
                    "mean_delta_db": float(np.mean(int8_deltas)),
                    "worst_delta_db": float(np.min(int8_deltas)),
                    "per_image_delta": dict(zip(name_list, map(float, int8_deltas))),
                }
    if args.report_json:
        import json

        os.makedirs(os.path.dirname(args.report_json) or ".", exist_ok=True)
        with open(args.report_json, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print("finished")
    for scale, mean_delta, worst in int8_verdicts:
        if -mean_delta > args.int8_max_drop:
            print("int8 REFUSED: x%d mean PSNR drop %.4f dB exceeds "
                  "--int8_max_drop %.3f — do not serve this quantized model"
                  % (scale, -mean_delta, args.int8_max_drop))
            raise SystemExit(3)
    if int8_verdicts:
        print("int8 OK: within --int8_max_drop on every scale")
    return average_psnr_dict


if __name__ == "__main__":
    main()
