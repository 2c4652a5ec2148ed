"""Export a trained checkpoint as a reference-loadable `.pth`.

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
    parser.add_argument("--output", type=str, required=True,
                        help="Destination .pth file.")
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False
    )
    common.warn_leftovers(remaining)

    from larvanet_tpu.utils.checkpoints import resolve_restore_path
    from larvanet_tpu.utils.torch_convert import EXPORT_RULES, save_pth

    if args.model not in EXPORT_RULES:
        raise SystemExit("no .pth export rules for model %r (supported: %s)"
                         % (args.model, ", ".join(sorted(EXPORT_RULES))))

    ckpt = resolve_restore_path(args.restore_path, args.train_path)
    if ckpt is None:
        raise SystemExit("no checkpoint found to export")
    model.restore(ckpt)
    print("restored the model")

    out = save_pth(model.params, args.model, args.output)
    print("exported %s -> %s" % (ckpt, out))


if __name__ == "__main__":
    main()
