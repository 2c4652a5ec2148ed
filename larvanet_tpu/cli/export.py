"""Export a trained checkpoint as a reference-loadable `.pth` — or as a
self-contained StableHLO serving artifact (`--stablehlo`).

The reverse of the `.pth` restore path: models trained in this framework
deploy through the reference workbench's own restore flow —
`self.model.load_state_dict(torch.load(ckpt_path))` (reference
models/base.py:66), which is strict, so the export is key-complete
including the reference's MeanShift and dead-module parameters
(utils/torch_convert.export_state_dict). The reference has no such
script (its users save .pth natively); this closes the interchange loop
so weights move in BOTH directions between the frameworks.

    python -m larvanet_tpu.cli.export --model edsr \
        --restore_path /runs/edsr/model_300000.ckpt \
        --output edsr_300000.pth

`--restore_path latest --train_path DIR` picks the newest checkpoint
(msgpack, orbax directory, or .pth all restore transparently).

StableHLO serving artifact (TPU-native deployment; utils/aot.py): the
fast-path serving graph (packed trunk / collapsed tail / optionally
int8) lowered for ONE input geometry with the weights baked in — loads
and runs WITHOUT the model zoo:

    python -m larvanet_tpu.cli.export --model edsr \
        --restore_path ... --stablehlo edsr_serve.lvt \
        --export_batch 1 --export_height 256 --export_width 256 \
        [--int8_trunk 1 --calib_path LR_DIR] [--platforms tpu,cpu]
"""

from __future__ import annotations

import argparse

from larvanet_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="edsr", help="Name of the model.")
    parser.add_argument("--scales", type=str, default="4", help="Scale of the input images.")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored.")
    parser.add_argument("--restore_path", type=str, required=True,
                        help="Checkpoint to export ('latest' with --train_path).")
    parser.add_argument("--train_path", type=str, default=None,
                        help="Run directory for --restore_path latest.")
    parser.add_argument("--output", type=str, default=None,
                        help="Destination .pth file.")
    parser.add_argument("--stablehlo", type=str, default=None,
                        help="Destination StableHLO serving artifact "
                             "(utils/aot.py) instead of / in addition to "
                             "the .pth.")
    parser.add_argument("--export_batch", type=int, default=1,
                        help="Artifact input batch size.")
    parser.add_argument("--export_height", type=int, default=256,
                        help="Artifact input (LR) height.")
    parser.add_argument("--export_width", type=int, default=256,
                        help="Artifact input (LR) width (even for the "
                             "packed/int8 paths).")
    parser.add_argument("--packed_trunk", type=int, default=1,
                        help="Artifact path: width-packed trunk (exact).")
    parser.add_argument("--collapsed_tail", type=int, default=1,
                        help="Artifact path: collapsed linear tail (exact, "
                             "EDSR family).")
    parser.add_argument("--int8_trunk", type=int, default=0,
                        help="Artifact path: W8A8 quantized trunk (NOT "
                             "float-exact); requires --calib_path.")
    parser.add_argument("--calib_path", type=str, default=None,
                        help="Directory of LR PNGs for int8 calibration.")
    parser.add_argument("--platforms", type=str, default=None,
                        help="Comma-separated lowering platforms for the "
                             "artifact (e.g. 'tpu,cpu'); default = current "
                             "backend.")
    parser.add_argument("--ema", type=int, default=0,
                        help="Export the EMA weights of a --ema_decay "
                             "checkpoint (bakes the +dB averaged weights "
                             "into the .pth / artifact).")
    parser.add_argument("--export_dtype", type=str, default="f32",
                        choices=["f32", "bf16"],
                        help="Artifact compute dtype: f32 = parity; bf16 = "
                             "the ~2x TPU throughput configuration "
                             "BASELINE.md measures (NOT bit-identical).")
    args, remaining = parser.parse_known_args(argv)
    if not args.output and not args.stablehlo:
        raise SystemExit("nothing to do: pass --output (.pth) and/or "
                         "--stablehlo (serving artifact)")

    scale_list = common.scales_of(args)
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False
    )
    common.warn_leftovers(remaining)

    from larvanet_tpu.utils.checkpoints import resolve_restore_path

    if args.output:
        # fail fast, BEFORE the (slow on this tunnel) checkpoint restore
        from larvanet_tpu.utils.torch_convert import EXPORT_RULES

        if args.model not in EXPORT_RULES:
            raise SystemExit("no .pth export rules for model %r (supported: %s)"
                             % (args.model, ", ".join(sorted(EXPORT_RULES))))

    ckpt = resolve_restore_path(args.restore_path, args.train_path)
    if ckpt is None:
        raise SystemExit("no checkpoint found to export")
    model.restore(ckpt)
    common.maybe_use_ema(model, args)
    print("restored the model")

    if args.output:
        from larvanet_tpu.utils.torch_convert import save_pth

        out = save_pth(model.params, args.model, args.output)
        print("exported %s -> %s" % (ckpt, out))

    if args.stablehlo:
        from larvanet_tpu.utils.aot import export_serving, save_artifact

        calib = None
        if args.int8_trunk:
            if not args.calib_path:
                raise SystemExit("--int8_trunk requires --calib_path "
                                 "(LR PNGs for activation calibration)")
            calib = _calib_from_dir(args.calib_path, args.export_height,
                                    args.export_width)
        shape = (args.export_batch, args.export_height, args.export_width, 3)
        platforms = (tuple(p.strip() for p in args.platforms.split(","))
                     if args.platforms else None)
        exported, header = export_serving(
            model, shape, packed_trunk=bool(args.packed_trunk),
            collapsed_tail=bool(args.collapsed_tail),
            int8_trunk=bool(args.int8_trunk), calib=calib,
            platforms=platforms,
            dtype="bfloat16" if args.export_dtype == "bf16" else "float32")
        save_artifact(args.stablehlo, exported, header)
        print("exported serving artifact %s (%s; input %s; platforms %s)"
              % (args.stablehlo, header["path_desc"], shape,
                 ",".join(header["platforms"])))


def _calib_from_dir(path, height, width, num_images=4):
    """Centre-crop the first PNGs of a directory to the export geometry
    for int8 activation calibration (cli/common.int8_calib_batch rules:
    even width, NHWC float32)."""
    import os

    import numpy as np

    from larvanet_tpu.data import io

    names = sorted(f for f in os.listdir(path) if f.lower().endswith(".png"))
    if not names:
        raise SystemExit("no PNGs in --calib_path %s" % path)
    out = []
    for f in names[:num_images]:
        im = io.load_image_u8(os.path.join(path, f)).astype(np.float32)
        if im.shape[0] < height or im.shape[1] < width:
            raise SystemExit("calibration image %s (%dx%d) is smaller than "
                             "the export geometry %dx%d"
                             % (f, im.shape[0], im.shape[1], height, width))
        top = (im.shape[0] - height) // 2
        left = (im.shape[1] - width) // 2
        out.append(im[top:top + height, left:left + width])
    return np.asarray(out, np.float32)


if __name__ == "__main__":
    main()
