"""Step-driven training CLI (reference train.py).

Flag-compatible: --dataloader --model --batch_size --input_patch_size
--scales --cuda_device --train_path --max_steps --log_freq
--summary_freq --save_freq --sleep_ratio --restore_path --restore_target
--global_step (reference train.py:17-34).

TPU notes: the hot loop feeds device-ready NHWC batches straight into
the jitted train step; `--sleep_ratio` (a GPU-cooling throttle,
reference train.py:30,97-98) is accepted and honored but defaults to 0
— TPUs don't need it.
"""

from __future__ import annotations

import argparse
import os
import time

from larvanet_tpu.cli import common
from larvanet_tpu.core.config import dump_arguments_json
from larvanet_tpu.utils.summary import SummaryWriter


def main(argv=None):
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_loader="div2k_train_loader", default_model="edsr")
    parser.add_argument("--batch_size", type=int, default=16,
                        help="Size of the batches for each training step.")
    parser.add_argument("--input_patch_size", type=int, default=48,
                        help="Size of each input image patch.")
    parser.add_argument("--train_path", type=str, required=True,
                        help="Base path of the trained model to be saved.")
    parser.add_argument("--async_checkpoint", type=int, default=0,
                        help="Write checkpoints on a background thread (device snapshot is "
                             "immediate; serialization+IO never stall the train loop).")
    parser.add_argument("--orbax_checkpoint", type=int, default=0,
                        help="Orbax-backed checkpoint directories (tensorstore per-leaf "
                             "storage; multi-host coordinated under jax.distributed; "
                             "combines with --async_checkpoint; restore auto-detects).")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Accumulate gradients over N equal microbatches inside one "
                             "jit (lax.scan): full-batch mean gradient at batch/N peak "
                             "activation memory. batch_size must be divisible by N.")
    parser.add_argument("--max_steps", type=int, default=300000,
                        help="The maximum number of training steps.")
    parser.add_argument("--log_freq", type=int, default=10,
                        help="The frequency of logging.")
    parser.add_argument("--summary_freq", type=int, default=1000,
                        help="The frequency of logging on TensorBoard.")
    parser.add_argument("--save_freq", type=int, default=10000,
                        help="The frequency of saving the trained model.")
    parser.add_argument("--sleep_ratio", type=float, default=0.0,
                        help="Per-step sleep ratio (GPU-era thermal throttle; default off on TPU).")
    parser.add_argument("--restore_path", type=str,
                        help="Checkpoint path to be restored; 'latest' auto-resumes from the newest ckpt in --train_path.")
    parser.add_argument("--restore_target", type=str,
                        help="Target of the restoration.")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Emit a jax.profiler device trace into this directory (new; TPU-native observability).")
    parser.add_argument("--device_pipeline", type=int, default=0,
                        help="Steps per fused device call: uploads the whole uint8 dataset to HBM once and runs sampling+augmentation+optimizer inside one jit (0 = host pipeline). Requires the dataset to fit in HBM.")
    parser.add_argument("--global_step", type=int, default=0,
                        help="Initial global step. Specify this to resume the training.")
    common.add_ema_decay_flag(parser)
    common.add_fused_opt_flag(parser)
    common.add_dp_train_flag(parser)
    common.add_widen_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    os.makedirs(args.train_path, exist_ok=True)

    dataloader, loader_args, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    model, model_args, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=True, global_step=args.global_step, ema_decay=args.ema_decay,
        fused_opt=args.fused_opt
    )
    model.async_checkpoints = bool(args.async_checkpoint)
    model.orbax_checkpoints = bool(args.orbax_checkpoint)
    model.grad_accum = args.grad_accum
    common.warn_leftovers(remaining)

    common.maybe_widen_from(model, args)

    from larvanet_tpu.utils.checkpoints import resolve_restore_path

    restore_path = resolve_restore_path(args.restore_path, args.train_path)
    if restore_path is not None:
        model.restore(ckpt_path=restore_path, target=args.restore_target)
        print("restored the model")

    common.maybe_dp_train(model, args)

    summary_writers = {
        scale: SummaryWriter(os.path.join(args.train_path, "x%d" % scale))
        for scale in scale_list
    }
    dump_arguments_json(os.path.join(args.train_path, "arguments.json"), args, loader_args, model_args)

    from larvanet_tpu.utils.profiling import trace

    print("begin training")
    if args.device_pipeline > 0:
        _train_device_pipeline(args, dataloader, model, scale_list[0])
        # The async writer thread is a daemon: returning without this
        # would drop a final --async_checkpoint save submitted mid-write.
        model.wait_for_checkpoints()
        for w in summary_writers.values():
            w.close()
        return

    local_step = 0
    with trace(args.profile_dir):
        while model.global_step < args.max_steps:
            local_step += 1
            start_time = time.time()

            scale = model.get_next_train_scale()
            summary = summary_writers[scale] if (local_step % args.summary_freq == 0) else None
            dataloader.reseed_for_step(model.global_step)  # exact-resume stream
            input_list, truth_list = dataloader.get_patch_batch(
                batch_size=args.batch_size, scale=scale, input_patch_size=args.input_patch_size
            )
            loss = model.train_step(input_list=input_list, scale=scale, truth_list=truth_list, summary=summary)

            duration = time.time() - start_time
            if args.sleep_ratio > 0 and duration > 0:
                time.sleep(min(10.0, duration * args.sleep_ratio))

            if local_step % args.log_freq == 0:
                print("step %d, lr %f, loss %.6f (%.3f sec/batch)"
                      % (model.global_step, model.get_learning_rate(), loss, duration))
            if local_step % args.save_freq == 0:
                model.save(base_path=args.train_path)
                print("saved a model checkpoint at step %d" % (model.global_step,))

    model.wait_for_checkpoints()
    print("finished")
    for w in summary_writers.values():
        w.close()


def _train_device_pipeline(args, dataloader, model, scale):
    """Fused on-device loop: dataset resident in HBM, N steps per jit call."""
    import jax

    from larvanet_tpu.data.device_pipeline import DevicePipeline, make_device_train_fn

    ds = dataloader.dataset
    lr_imgs = [ds.input_u8(scale, i) for i in range(len(ds))]
    # Trim truth to LR*scale: datasets may carry a few extra HR rows/cols
    # (the reference eval protocol crops truth to output size,
    # validate.py:20-21); training patches never sample past LR*scale.
    hr_imgs = [ds.truth_u8(i)[: l.shape[0] * scale, : l.shape[1] * scale]
               for i, l in enumerate(lr_imgs)]
    if len({a.shape[:2] for a in lr_imgs}) > 1:
        from larvanet_tpu.data.device_pipeline import BucketedDevicePipeline

        pipe = BucketedDevicePipeline.from_arrays(lr_imgs, hr_imgs, scale)
    else:
        pipe = DevicePipeline.from_arrays(lr_imgs, hr_imgs, scale)
    print("device pipeline: %d images, %.1f MB resident in HBM"
          % (len(lr_imgs), pipe.nbytes() / 1e6))
    chunk = make_device_train_fn(
        model, pipe, batch_size=args.batch_size, patch=args.input_patch_size,
        steps_per_call=args.device_pipeline,
    )
    # stateless chunk keys: fold_in(base, global_step) makes a resumed run
    # reproduce the uninterrupted run's sample stream exactly
    base_key = jax.random.PRNGKey(getattr(dataloader.args, "data_seed", None) or 0)
    import time as _time

    from larvanet_tpu.cli.common import ChunkRateMeter

    meter = ChunkRateMeter()
    while model.global_step < args.max_steps:
        t0 = _time.time()
        sub = jax.random.fold_in(base_key, model.global_step)
        lr = model.get_learning_rate()
        model.params, model.opt_state, loss = chunk(model.params, model.opt_state, lr, sub)
        model.global_step += args.device_pipeline
        # realize the loss before timing — but even that readback can ack
        # early on this tunnel, so the meter differenciates wall clock and
        # flags implausible instantaneous rates (CLAUDE.md methodology)
        loss_val = float(loss)
        dt = _time.time() - t0
        inst, avg, trusted = meter.update(model.global_step, args.device_pipeline, dt)
        print("step %d, lr %f, mean loss %.6f (%.1f steps/s)%s"
              % (model.global_step, lr, loss_val, inst, meter.suffix(avg, trusted)))
        if args.save_freq and model.global_step % args.save_freq < args.device_pipeline:
            model.save(base_path=args.train_path)
            print("saved a model checkpoint at step %d" % (model.global_step,))
    print("finished")


if __name__ == "__main__":
    main()
