"""Inference-only CLI: PNG dir -> SR PNG dir (reference get_sr.py).

Reads every PNG under --input_path, upscales (optionally chop-forward
or batched tiles), writes PNGs to --output_path, reports mean latency
(reference get_sr.py:62-97).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.data import io
from larvanet_tpu.eval.pipeline import pipelined_upscale
from larvanet_tpu.eval.tiling import TiledUpscaler, upscale_with_chop_forward


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="edsr", help="Name of the model.")
    parser.add_argument("--scales", type=str, default="4", help="Scales of the input images.")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored.")
    parser.add_argument("--input_path", type=str, required=True,
                        help="Base path of the input images.")
    parser.add_argument("--output_path", type=str, required=True,
                        help="Base path of the output images.")
    parser.add_argument("--restore_path", type=str, required=True,
                        help="Checkpoint path to be restored.")
    parser.add_argument("--restore_target", type=str, help="Target of the restoration.")
    parser.add_argument("--restore_global_step", type=int, default=0,
                        help="Global step of the restored model.")
    parser.add_argument("--chop_forward", action="store_true",
                        help="Employ chop-forward to reduce the memory usage.")
    parser.add_argument("--chop_overlap_size", type=int, default=20,
                        help="The overlapping size for the chop-forward process.")
    parser.add_argument("--tile_forward", action="store_true",
                        help="Batched fixed-shape tiled inference (TPU fast path).")
    parser.add_argument("--tile_size", type=int, default=128)
    parser.add_argument("--tile_overlap", type=int, default=24)
    parser.add_argument("--spatial_shard", type=int, default=0,
                        help="Shard full-frame inference height across N devices with halo exchange (0 = off).")
    parser.add_argument("--spatial_halo", type=int, default=32,
                        help="Halo rows exchanged between spatial shards; should exceed the model's receptive radius.")
    parser.add_argument("--collapsed_tail", type=int, default=1,
                        help="Exact collapsed linear tail for EDSR-family inference (1.6x on TPU; ops/collapsed_tail.py).")
    parser.add_argument("--packed_trunk", type=int, default=1,
                        help="Width-packed trunk for EDSR-family inference (exact; ~1.45x on TPU; ops/packed_trunk.py).")
    parser.add_argument("--int8_trunk", type=int, default=0,
                        help="Opt-in W8A8 quantized trunk (EDSR/LarvaNet families; calibrated "
                             "on the first input; NOT float-exact, ~-0.06 dB measured).")
    parser.add_argument("--dp_devices", type=int, default=0,
                        help="Shard tile batches across N devices (data-parallel serving; "
                             "use with --tile_forward; 0 = off).")
    parser.add_argument("--ema", type=int, default=0,
                        help="Serve the EMA weights from a --ema_decay checkpoint.")
    parser.add_argument("--device_uint8", type=int, default=1,
                        help="Quantize SR frames to uint8 ON DEVICE before the "
                             "device->host pull (direct mode): 4x less transfer, "
                             "byte-exact vs host quantization (the PNG writer "
                             "quantizes identically). 0 pulls f32 frames.")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="Dispatch-ahead in the direct loop: overlap each "
                             "frame's device->host pull (and the next frame's "
                             "PNG decode) with device compute; N bounds "
                             "dispatched-but-unpulled frames (1 = serial).")
    common.add_serving_dtype_flag(parser)
    common.add_plain_frame_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    scale = scale_list[0]
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False,
        global_step=args.restore_global_step,
    )
    common.warn_leftovers(remaining)
    model.restore(ckpt_path=args.restore_path, target=args.restore_target)
    common.maybe_use_ema(model, args)
    common.apply_serving_dtype(model, args)
    print("restored the model")
    common.maybe_collapse_tail(model, args)

    image_names = io.list_pngs(args.input_path)
    common.maybe_int8_trunk(model, args, lambda: io.load_image_chw(
        os.path.join(args.input_path, image_names[0] + ".png")).transpose(1, 2, 0)[None])
    common.maybe_plain_full_frame(model, args)
    common.maybe_spatial_shard(model, args, scale_list[0])
    if args.dp_devices > 1:
        import jax

        from larvanet_tpu.parallel.mesh import make_mesh, use_data_parallel_eval

        mesh = make_mesh((args.dp_devices,), ("data",),
                         devices=jax.devices()[: args.dp_devices])
        use_data_parallel_eval(model, mesh)
        print("serving: tile batches sharded over %d devices" % (args.dp_devices,))

    print("%d images are prepared" % (len(image_names),))
    os.makedirs(args.output_path, exist_ok=True)

    tiler = None
    if args.tile_forward:
        tiler = TiledUpscaler(
            lambda batch: model.fwd_runtime(np.asarray(batch, np.float32)),
            scale=scale, tile_size=args.tile_size, overlap=args.tile_overlap,
            min_batch=max(1, args.dp_devices),
        )

    # direct device_uint8 mode pushes the LR frame as uint8 (1 byte/px
    # H2D, f32 cast on device — exact, base._input_to_device); tiling/
    # chop arithmetic keeps the f32 loader contract
    direct_u8 = (args.device_uint8 and not args.chop_forward
                 and tiler is None and hasattr(model, "upscale_device"))

    duration_list = []
    if direct_u8 and args.pipeline_depth > 1:
        # dispatch-ahead: frame i's D2H pull (and i+1's PNG decode)
        # overlap frame i+1's device compute (eval/pipeline.py)
        def _frames():
            for name in image_names:
                p = os.path.join(args.input_path, name + ".png")
                yield name, io.load_image_u8(p).transpose(2, 0, 1)

        total = len(image_names)
        for i, (name, output, duration) in enumerate(pipelined_upscale(
                model, _frames(), scale, uint8=True,
                depth=args.pipeline_depth)):
            duration_list.append(duration)
            io.save_image_chw(output, os.path.join(args.output_path, name + ".png"))
            print("%d/%d, %s, duration=%.4f" % (i + 1, total, name, duration))
        image_names = []  # handled
    for i, name in enumerate(image_names):
        p = os.path.join(args.input_path, name + ".png")
        input_image = (io.load_image_u8(p).transpose(2, 0, 1) if direct_u8
                       else io.load_image_chw(p))
        start_time = time.perf_counter()
        if args.chop_forward:
            output = upscale_with_chop_forward(model, input_image, scale, args.chop_overlap_size)
        elif tiler is not None:
            output = tiler.upscale_chw(input_image)
        elif args.device_uint8:
            output = model.upscale_uint8(input_list=[input_image], scale=scale)[0]
        else:
            output = model.upscale(input_list=[input_image], scale=scale)[0]
        duration = time.perf_counter() - start_time
        duration_list.append(duration)
        io.save_image_chw(output, os.path.join(args.output_path, name + ".png"))
        print("%d/%d, %s, duration=%.4f" % (i + 1, len(image_names), name, duration))

    print("mean duration=%.4f" % (float(np.mean(duration_list)),))
    print("finished")


if __name__ == "__main__":
    main()
