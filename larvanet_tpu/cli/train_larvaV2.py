"""Volume-driven training for the V2 family (reference train_larvaV2.py).

Identical to train_larva except it computes and injects
`model.steps_per_epoch` (epoch = 300 MiB of data,
reference train_larvaV2.py:74-81) before prepare, and defaults to
LarvaNetV2. Delegates to the train_larva main with the extra injection.
"""

from __future__ import annotations

import argparse
import math
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", type=str, default="LarvaNetV2")
    pre.add_argument("--steps_per_epoch", type=float, default=None)
    pre.add_argument("--batch_size", type=int, default=16)
    pre.add_argument("--input_patch_size", type=int, default=48)
    known, _ = pre.parse_known_args(argv)

    if known.steps_per_epoch is None:
        batch_data_size = (known.input_patch_size ** 2) * known.batch_size * 3
        spe = 300 * (1024 ** 2) / batch_data_size
        spe = round(spe, -int(math.floor(math.log10(abs(spe)))))
    else:
        spe = known.steps_per_epoch
    print("%s steps equal to 1 epoch" % (spe,))

    if "--model" not in argv:
        argv = ["--model", known.model] + argv
    # strip the V2-only flag before handing off
    if "--steps_per_epoch" in argv:
        i = argv.index("--steps_per_epoch")
        del argv[i : i + 2]

    from larvanet_tpu.cli import train_larva
    from larvanet_tpu.core import registry

    # inject steps_per_epoch onto the model the moment it is created
    orig_get_model = registry.get_model

    def patched(name):
        model = orig_get_model(name)
        model.steps_per_epoch = int(spe)
        return model

    registry.get_model = patched
    try:
        train_larva.main(argv)
    finally:
        registry.get_model = orig_get_model


if __name__ == "__main__":
    main()
