"""Model summary CLI: params + FLOPs (reference summarize.py).

The reference uses a vendored torchsummaryX for a per-layer table of
kernel shapes / params / MACs (reference summarize.py:44,
utils/torchsummaryX.py:57-61). Here the per-layer table comes from
flax's tabulate, and the authoritative FLOP total comes from XLA's own
cost analysis of the compiled forward — the numbers the TPU actually
executes.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.cli import common


def summarize_model(model, height: int, width: int):
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(model.params))

    flops = None
    try:
        lowered = jax.jit(lambda p, x: model.module.apply({"params": p}, x)).lower(model.params, dummy)
        analysis = lowered.compile().cost_analysis()
        if analysis:
            flops = analysis.get("flops")
    except Exception as exc:  # cost analysis is best-effort across backends
        print("cost analysis unavailable: %s" % (exc,))

    table = None
    try:
        table = model.module.tabulate(
            jax.random.PRNGKey(0), dummy, depth=2,
            console_kwargs={"width": 120},
        )
    except Exception as exc:
        print("tabulate unavailable: %s" % (exc,))
    return n_params, flops, table


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="edsr", help="Name of the model.")
    parser.add_argument("--scales", type=str, default="4", help="Scale of the input images.")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored.")
    parser.add_argument("--input_width", type=int, default=96,
                        help="Width of the dummy input.")
    parser.add_argument("--input_height", type=int, default=96,
                        help="Height of the dummy input.")
    args, remaining = parser.parse_known_args(argv)

    scale_list = common.scales_of(args)
    model, _, remaining = common.setup_model(
        args.model, remaining, scale_list, is_training=False
    )
    common.warn_leftovers(remaining)

    n_params, flops, table = summarize_model(model, args.input_height, args.input_width)
    if table:
        print(table)
    print("input: 1x%dx%dx3 (NHWC)" % (args.input_height, args.input_width))
    print("total params: %s" % ("{:,}".format(n_params),))
    if flops is not None:
        print("XLA forward FLOPs: %s (%.3f GFLOPs)" % ("{:,}".format(int(flops)), flops / 1e9))
        print("approx MACs: %s" % ("{:,}".format(int(flops) // 2),))
    return n_params, flops


if __name__ == "__main__":
    main()
