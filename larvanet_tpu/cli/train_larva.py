"""Volume-driven multi-exit training CLI (reference train_larva.py).

Loads a train loader (default combined_loader, threaded) AND a val
loader (default div2k_val_loader), computes volume_per_step =
patch^2 * batch * 3 (reference train_larva.py:73), starts queue runners
when the loader is threaded (:99-100), then loops
model.train_step_larva forever until KeyboardInterrupt (:140) or
--max_steps. Per-phase timing (dataload / host->device+train) is
printed during early steps like the reference's
dataload_time/np2ts_time/train_time breakdown (:113-139).
"""

from __future__ import annotations

import argparse
import math
import os
import time

from larvanet_tpu.cli import common
from larvanet_tpu.core.config import dump_arguments_json
from larvanet_tpu.utils.summary import SummaryWriter


def round_to_1(x):
    if x <= 0:
        return x
    return round(x, -int(math.floor(math.log10(abs(x)))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataloader", type=str, default="combined_loader",
                        help="Name of the data loader.")
    parser.add_argument("--val_dataloader", type=str, default="div2k_val_loader",
                        help="Name of the validation data loader.")
    parser.add_argument("--val_data_input_path", type=str, default="data/DIV2K_valid_LR_bicubic",
                        help="Base path of the validation input images (the reference hardcoded "
                             "c:/aim2020 paths in div2k_val_loader.py:28; here it is a flag).")
    parser.add_argument("--val_data_truth_path", type=str, default="data/DIV2K_valid_HR",
                        help="Base path of the validation ground-truth images.")
    parser.add_argument("--model", type=str, default="LarvaNet",
                        help="Name of the model.")
    parser.add_argument("--batch_size", type=int, default=16,
                        help="Size of the batches for each training step.")
    parser.add_argument("--input_patch_size", type=int, default=48,
                        help="Size of each input image patch.")
    parser.add_argument("--scales", type=str, default="4",
                        help="Scale of the input images.")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored.")
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
                             "jit (lax.scan); batch_size must be divisible by N.")
    parser.add_argument("--max_steps", type=int, default=0,
                        help="Stop after this many steps (0 = run until interrupted, like the reference).")
    parser.add_argument("--log_freq", type=int, default=10,
                        help="The frequency of logging.")
    parser.add_argument("--summary_freq", type=int, default=1000,
                        help="The frequency of logging on TensorBoard.")
    parser.add_argument("--device_pipeline", type=int, default=0,
                        help="Steps per fused device call: dataset resident in HBM, sampling+augmentation+multi-exit step in one jit (0 = host pipeline). Volume-driven validation cadence preserved.")
    parser.add_argument("--restore_path", type=str,
                        help="Checkpoint path to be restored; 'latest' auto-resumes from the newest ckpt in --train_path.")
    parser.add_argument("--restore_target", type=str,
                        help="Target of the restoration.")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Emit a jax.profiler device trace into this directory (new; TPU-native observability).")
    parser.add_argument("--global_step", type=int, default=0,
                        help="Initial global step.")
    common.add_ema_decay_flag(parser)
    common.add_fused_opt_flag(parser)
    common.add_dp_train_flag(parser)
    common.add_widen_flag(parser)
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    os.makedirs(args.train_path, exist_ok=True)

    dataloader, loader_args, remaining = common.setup_loader(args.dataloader, remaining, scale_list)
    print("prepare validation data loader - %s" % (args.val_dataloader,))
    val_loader, _, _ = common.setup_loader(
        args.val_dataloader,
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
    model.volume_per_step = args.input_patch_size ** 2 * args.batch_size * 3

    common.maybe_widen_from(model, args)

    from larvanet_tpu.utils.checkpoints import resolve_restore_path

    restore_path = resolve_restore_path(args.restore_path, args.train_path)
    if restore_path is not None:
        model.restore(ckpt_path=restore_path, target=args.restore_target)
        print("restored the model")

    common.maybe_dp_train(model, args)

    summary = SummaryWriter(os.path.join(args.train_path, "x%d" % scale_list[0]))
    dump_arguments_json(os.path.join(args.train_path, "arguments.json"), args, loader_args, model_args)

    scale = scale_list[0]
    threaded = getattr(dataloader, "is_threaded", False)
    if threaded:
        dataloader.start_training_queue_runner(
            batch_size=args.batch_size, input_patch_size=args.input_patch_size
        )

    from larvanet_tpu.utils.profiling import trace

    print("begin training")
    if args.device_pipeline > 0:
        _train_larva_device(args, dataloader, val_loader, model, scale,
                            threaded, summary)
        # The async writer thread is a daemon: returning without this
        # would drop a final --async_checkpoint save submitted mid-write.
        model.wait_for_checkpoints()
        summary.close()
        return

    local_step = 0
    try:
      with trace(args.profile_dir):
        while True:
            local_step += 1
            t0 = time.perf_counter()
            if threaded:
                inputs, truths = dataloader.get_queue_data(scale)
            else:
                dataloader.reseed_for_step(model.global_step)  # exact-resume stream
                inputs, truths = dataloader.get_patch_batch_nhwc(
                    args.batch_size, scale, args.input_patch_size
                )
            t1 = time.perf_counter()
            loss = model.train_step_larva(args, val_loader, inputs, truths,
                                          summary if local_step % args.summary_freq == 0 else None)
            t2 = time.perf_counter()

            if local_step % args.log_freq == 0:
                print(
                    "step %d, loss %.6f, lr %.8f (data %ss, train %ss)"
                    % (model.global_step, loss, model.get_learning_rate(),
                       round_to_1(t1 - t0), round_to_1(t2 - t1))
                )
            if args.max_steps and model.global_step >= args.max_steps:
                break
    except KeyboardInterrupt:
        print("interrupted")
    finally:
        if threaded:
            dataloader.stop_queue_runners()
    model.wait_for_checkpoints()
    print("finished")
    summary.close()


def _train_larva_device(args, dataloader, val_loader, model, scale, threaded, summary):
    """Volume-driven training with the device-resident pipeline: chunks of
    fused steps sized to land exactly on each --val_volume boundary."""
    import math
    import time

    import jax

    from larvanet_tpu.data.device_pipeline import DevicePipeline, make_device_train_fn

    if threaded:
        dataloader.stop_queue_runners()
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

    chunk_fns = {}

    def run_chunk(n_steps, key, lr):
        if n_steps not in chunk_fns:
            chunk_fns[n_steps] = make_device_train_fn(
                model, pipe, batch_size=args.batch_size,
                patch=args.input_patch_size, steps_per_call=n_steps)
        return chunk_fns[n_steps](model.params, model.opt_state, lr, key)

    # stateless chunk keys -> exact-resume sample stream
    base_key = jax.random.PRNGKey(getattr(dataloader.args, "data_seed", None) or 0)
    if model.global_step == 0 and val_loader is not None:
        model.validate_for_train(args, val_loader)
    meter = common.ChunkRateMeter()
    while True:
        steps_to_val = max(1, math.ceil(
            (model.args.val_volume - model.temp_volume) / model.volume_per_step))
        n = min(args.device_pipeline, steps_to_val)
        t0 = time.time()
        sub = jax.random.fold_in(base_key, model.global_step)
        model.params, model.opt_state, loss = run_chunk(n, sub, model.get_learning_rate())
        model.global_step += n
        model.temp_volume += n * model.volume_per_step
        # realize the loss before timing — but even that readback can ack
        # early on this tunnel, so the meter differenciates wall clock and
        # flags implausible instantaneous rates (CLAUDE.md methodology)
        loss_val = float(loss)
        dt = time.time() - t0
        inst, avg, trusted = meter.update(model.global_step, n, dt)
        print("step %d, mean loss %.6f, lr %.8f (%.1f steps/s)%s"
              % (model.global_step, loss_val, model.get_learning_rate(), inst,
                 meter.suffix(avg, trusted)))

        if model.temp_volume >= model.args.val_volume:
            model.total_volume += model.temp_volume
            model.temp_volume = 0
            if val_loader is not None:
                model.validate_for_train(args, val_loader)
            model.save(base_path=args.train_path)
            print("saved a model checkpoint at volume %.0fG" % (model.total_volume / 1e9,))
            summary.scalar("loss", float(loss), model.global_step)
            summary.scalar("lr", model.get_learning_rate(), model.global_step)
        if args.max_steps and model.global_step >= args.max_steps:
            break
    print("finished")


if __name__ == "__main__":
    main()
