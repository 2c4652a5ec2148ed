"""Forward-latency benchmark CLI (reference runtime.py).

Measures per-image forward latency, properly synchronized: the
reference brackets with torch.cuda.synchronize (runtime.py:63-67); the
JAX equivalent is block_until_ready on the output. Warmup iterations
exclude XLA compile time from the measurement.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from larvanet_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_val_loader", default_model="edsr")
    parser.add_argument("--restore_path", type=str,
                        help="Checkpoint path to be restored (optional: random init if omitted).")
    parser.add_argument("--restore_target", type=str)
    parser.add_argument("--restore_global_step", type=int, default=0)
    parser.add_argument("--input_width", type=int, default=0,
                        help="Fixed input width (0 = use the dataloader's real images).")
    parser.add_argument("--input_height", type=int, default=0)
    parser.add_argument("--num_warmup", type=int, default=2,
                        help="Warmup forwards (compile excluded from timing).")
    parser.add_argument("--num_iters", type=int, default=10,
                        help="Timed iterations per image/shape.")
    parser.add_argument("--collapsed_tail", type=int, default=1,
                        help="Exact collapsed linear tail for EDSR-family inference (1.6x on TPU; ops/collapsed_tail.py).")
    parser.add_argument("--packed_trunk", type=int, default=1,
                        help="Width-packed trunk for EDSR-family inference (exact; ~1.45x on TPU; ops/packed_trunk.py).")
    parser.add_argument("--int8_trunk", type=int, default=0,
                        help="Opt-in W8A8 quantized trunk (EDSR/LarvaNet families; calibrated "
                             "on the first input; NOT float-exact, ~-0.06 dB measured).")
    parser.add_argument("--wino_trunk", type=int, default=0,
                        help="Opt-in fused Pallas Winograd trunk for EDSR: 2 = "
                             "F(2,3), 4 = F(4,3) (ops/wino_pallas.py; float-"
                             "tolerance equal, TPU only; 0 = off). MEASURED "
                             "7-9x SLOWER than the default packed trunk on "
                             "v5e — negative-result record, see BASELINE.md.")
    parser.add_argument("--ema", type=int, default=0,
                        help="Serve the EMA weights from a --ema_decay checkpoint.")
    common.add_serving_dtype_flag(parser)
    common.add_plain_frame_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    use_loader = args.input_width == 0

    dataloader = None
    if use_loader:
        dataloader, _, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False,
        global_step=args.restore_global_step,
    )
    common.warn_leftovers(remaining)
    if args.restore_path:
        model.restore(ckpt_path=args.restore_path, target=args.restore_target)
        common.maybe_use_ema(model, args)
        print("restored the model")
    common.apply_serving_dtype(model, args)
    common.maybe_collapse_tail(model, args)
    common.maybe_wino_trunk(model, args)
    if args.int8_trunk:
        if dataloader is not None:
            common.maybe_int8_trunk(model, args, lambda: dataloader.get_image_pair(
                image_index=0, scale=scale_list[0])[0].transpose(1, 2, 0)[None])
        else:
            import numpy as _np
            common.maybe_int8_trunk(model, args, lambda: _np.random.default_rng(0).uniform(
                0, 255, (1, args.input_height, args.input_width, 3)).astype(_np.float32))
    common.maybe_plain_full_frame(model, args)

    scale = scale_list[0]
    durations = []
    megapixels = []

    def bench_one(batch_nhwc):
        for _ in range(args.num_warmup):
            jax.block_until_ready(model.fwd_runtime(batch_nhwc))
        t0 = time.perf_counter()
        for _ in range(args.num_iters):
            out = model.fwd_runtime(batch_nhwc)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.num_iters
        durations.append(dt)
        megapixels.append(batch_nhwc.shape[1] * batch_nhwc.shape[2] / 1e6)

    if use_loader:
        for i in range(dataloader.get_num_images()):
            inp, _, name = dataloader.get_image_pair(i, scale)
            x = np.ascontiguousarray(inp.transpose(1, 2, 0))[None].astype(np.float32)
            bench_one(x)
            print("%d/%d %s: %.4f sec" % (i + 1, dataloader.get_num_images(), name, durations[-1]))
    else:
        x = np.zeros((1, args.input_height, args.input_width, 3), np.float32)
        bench_one(x)

    mean_dur = float(np.mean(durations))
    total_mp = float(np.sum(megapixels))
    mp_per_sec = total_mp / float(np.sum(durations))
    print("mean duration=%.4f sec; throughput=%.2f LR megapixels/sec" % (mean_dur, mp_per_sec))
    return mean_dur, mp_per_sec


if __name__ == "__main__":
    main()
