"""Training with inline validation-driven LR scheduling (reference
train_schedule.py and train_schedule_tensor.py).

Every 10 epochs (epoch = 300 MiB of consumed patches / batch bytes,
reference train_schedule.py:103-106) the full val set is scored and the
model's plateau scheduler (`model.lr_scheduler`, e.g. hrsr) is stepped
with the mean PSNR (:139-164), then a checkpoint is saved. The reference
also has a `_tensor` variant whose only difference is the tensor-
returning loader — covered here by `--dataloader div2k_train_loader_tensor`.

Note: the reference script has two latent NameError bugs in rarely-hit
branches (train_schedule.py:175,186); those branches are implemented
correctly here rather than replicated.
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np

from larvanet_tpu.cli import common
from larvanet_tpu.core.config import dump_arguments_json
from larvanet_tpu.eval import metrics
from larvanet_tpu.eval.pipeline import pipelined_upscale
from larvanet_tpu.utils.summary import SummaryWriter


def round_to_1(x):
    return round(x, -int(math.floor(math.log10(abs(x)))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataloader", type=str, default="div2k_train_loader")
    parser.add_argument("--dataloader_val", type=str, default="div2k_val_loader")
    parser.add_argument("--val_data_input_path", type=str, default="data/DIV2K_valid_LR_bicubic")
    parser.add_argument("--val_data_truth_path", type=str, default="data/DIV2K_valid_HR")
    parser.add_argument("--model", type=str, default="hrsr")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--input_patch_size", type=int, default=48)
    parser.add_argument("--step_per_epoch", type=float, default=None,
                        help="Steps per epoch; default derives from 300 MiB of data.")
    parser.add_argument("--scales", type=str, default="4")
    parser.add_argument("--cuda_device", type=str, default="-1")
    parser.add_argument("--train_path", type=str, required=True)
    parser.add_argument("--async_checkpoint", type=int, default=0,
                        help="Write checkpoints on a background thread.")
    parser.add_argument("--orbax_checkpoint", type=int, default=0,
                        help="Orbax-backed checkpoint directories (restore auto-detects).")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Accumulate gradients over N equal microbatches inside one jit.")
    parser.add_argument("--max_steps", type=int, default=300000)
    parser.add_argument("--log_freq", type=int, default=10)
    parser.add_argument("--summary_freq", type=int, default=1000)
    parser.add_argument("--val_freq_epochs", type=int, default=10,
                        help="Validate every N epochs (reference uses 10).")
    parser.add_argument("--device_pipeline", type=int, default=0,
                        help="Steps per fused device call: dataset resident in HBM, "
                             "sampling+augmentation+optimizer in one jit (0 = host "
                             "pipeline). Chunks land exactly on each validation "
                             "epoch boundary, so the plateau-LR cadence is preserved.")
    parser.add_argument("--restore_path", type=str)
    parser.add_argument("--restore_target", type=str)
    parser.add_argument("--global_step", type=int, default=0)
    common.add_ema_decay_flag(parser)
    common.add_fused_opt_flag(parser)
    common.add_dp_train_flag(parser)
    common.add_widen_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    scale = scale_list[0]
    os.makedirs(args.train_path, exist_ok=True)

    dataloader, loader_args, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    val_loader, _, _ = common.setup_loader(
        args.dataloader_val,
        ["--data_input_path", args.val_data_input_path,
         "--data_truth_path", args.val_data_truth_path],
        scale_list,
    )
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

    summary = SummaryWriter(os.path.join(args.train_path, "x%d" % scale))
    dump_arguments_json(os.path.join(args.train_path, "arguments.json"), args, loader_args, model_args)

    if getattr(dataloader, "is_threaded", False):
        dataloader.start_training_queue_runner(args.batch_size, args.input_patch_size)

    if args.step_per_epoch is None:
        batch_data_size = (args.input_patch_size ** 2) * args.batch_size * 3
        step_per_epoch = round_to_1(300 * (1024 ** 2) / batch_data_size)
    else:
        step_per_epoch = args.step_per_epoch
    print("%s steps equal to 1 epoch" % (step_per_epoch,))
    val_every = int(args.val_freq_epochs * step_per_epoch)

    print("begin training")
    if args.device_pipeline > 0:
        _train_schedule_device(args, dataloader, val_loader, model, scale,
                               step_per_epoch, val_every, summary)
        model.wait_for_checkpoints()
        summary.close()
        return
    try:
        while model.global_step < args.max_steps:
            t0 = time.time()
            if getattr(dataloader, "is_threaded", False):
                inputs, truths = dataloader.get_queue_data(scale)
            else:
                dataloader.reseed_for_step(model.global_step)  # exact-resume stream
                inputs, truths = dataloader.get_patch_batch(
                    args.batch_size, scale, args.input_patch_size)
            use_summary = summary if model.global_step % args.summary_freq == 0 else None
            loss = model.train_step(inputs, scale, truths, use_summary)
            duration = time.time() - t0

            if model.global_step % val_every == 0:
                _validate_and_step_scheduler(args, val_loader, model, scale, step_per_epoch)

            if model.global_step % args.log_freq == 0:
                print("step %d, lr %.8f, loss %.6f (%.3f sec/batch)"
                      % (model.global_step, model.get_learning_rate(), loss, duration))
    except KeyboardInterrupt:
        print("interrupted")
    finally:
        if getattr(dataloader, "is_threaded", False):
            dataloader.stop_queue_runners()
    model.wait_for_checkpoints()
    print("finished")
    summary.close()


def _validate_and_step_scheduler(args, val_loader, model, scale, step_per_epoch):
    """Full val-set PSNR -> model.lr_scheduler.step(psnr) -> save
    (reference train_schedule.py:139-164 semantics)."""
    print("begin validation")
    psnr_list = []
    if hasattr(model, "upscale_device"):
        # device-uint8 + dispatch-ahead (eval/pipeline.py): the protocol
        # quantizes to uint8 before PSNR, so the on-device quantize is
        # byte-exact, and overlapping each frame's D2H pull + host PSNR
        # with the next frame's compute keeps the device busy — this
        # loop runs every --val_freq_epochs inside training time.
        def _items():
            for idx in range(val_loader.get_num_images()):
                inp, tru, _ = val_loader.get_image_pair(image_index=idx, scale=scale)
                yield tru, inp

        for tru, o8, _dt in pipelined_upscale(model, _items(), scale,
                                              uint8=True, depth=2, chw=True):
            t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
            psnr_list.append(metrics.psnr_rgb(o8, t8))
    else:
        for idx in range(val_loader.get_num_images()):
            inp, tru, _ = val_loader.get_image_pair(image_index=idx, scale=scale)
            out = model.upscale([inp], scale)[0]
            o8 = metrics.image_to_uint8(out)
            t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
            psnr_list.append(metrics.psnr_rgb(o8, t8))
    average_psnr = float(np.mean(psnr_list))
    print("step %d, epoch %.0f, psnr=%.8f, lr = %.10f"
          % (model.global_step, model.global_step / step_per_epoch,
             average_psnr, model.get_learning_rate()))
    if getattr(model, "lr_scheduler", None) is not None:
        model.lr_scheduler.step(average_psnr)
    model.save(base_path=args.train_path)
    print("saved a model checkpoint at step %d" % (model.global_step,))


def _train_schedule_device(args, dataloader, val_loader, model, scale,
                           step_per_epoch, val_every, summary):
    """Validation-scheduled training with the device-resident pipeline:
    fused step chunks sized to land exactly on each --val_freq_epochs
    boundary so the plateau scheduler sees the same cadence as the host
    loop (mirrors cli/train_larva._train_larva_device)."""
    import jax

    from larvanet_tpu.data.device_pipeline import (
        BucketedDevicePipeline, DevicePipeline, make_device_train_fn)

    if getattr(dataloader, "is_threaded", False):
        dataloader.stop_queue_runners()
    ds = dataloader.dataset
    lr_imgs = [ds.input_u8(scale, i) for i in range(len(ds))]
    hr_imgs = [ds.truth_u8(i) for i in range(len(ds))]
    if len({a.shape[:2] for a in lr_imgs}) > 1:
        pipe = BucketedDevicePipeline.from_arrays(lr_imgs, hr_imgs, scale)
    else:
        pipe = DevicePipeline.from_arrays(lr_imgs, hr_imgs, scale)
    print("device pipeline: %d images, %.1f MB resident in HBM"
          % (len(lr_imgs), pipe.nbytes() / 1e6))

    chunk_fns = {}

    def run_chunk(n_steps, key, lr):
        if n_steps not in chunk_fns:
            chunk_fns[n_steps] = make_device_train_fn(
                model, pipe, batch_size=args.batch_size,
                patch=args.input_patch_size, steps_per_call=n_steps)
        return chunk_fns[n_steps](model.params, model.opt_state, lr, key)

    # stateless chunk keys -> exact-resume sample stream
    base_key = jax.random.PRNGKey(getattr(dataloader.args, "data_seed", None) or 0)
    meter = common.ChunkRateMeter()
    while model.global_step < args.max_steps:
        to_val = val_every - (model.global_step % val_every) or val_every
        n = max(1, min(args.device_pipeline, to_val,
                       args.max_steps - model.global_step))
        t0 = time.time()
        sub = jax.random.fold_in(base_key, model.global_step)
        model.params, model.opt_state, loss = run_chunk(
            n, sub, model.get_learning_rate())
        model.global_step += n
        loss_val = float(loss)  # realize before timing; meter flags early acks
        dt = time.time() - t0
        inst, avg, trusted = meter.update(model.global_step, n, dt)
        print("step %d, lr %.8f, mean loss %.6f (%.1f steps/s)%s"
              % (model.global_step, model.get_learning_rate(), loss_val, inst,
                 meter.suffix(avg, trusted)))
        if model.global_step % val_every == 0 or model.global_step >= args.max_steps:
            _validate_and_step_scheduler(args, val_loader, model, scale, step_per_epoch)
            summary.scalar("loss", float(loss), model.global_step)
            summary.scalar("lr", model.get_learning_rate(), model.global_step)
    print("finished")


if __name__ == "__main__":
    main()
