"""Model summary CLI: per-layer kernel/params/MACs table + FLOPs.

Mirrors the reference's vendored torchsummaryX (reference
summarize.py:44, utils/torchsummaryX.py:57-61,119-167): one row per
parametered leaf module with its kernel shape ([in, out, kh, kw] — the
reference swaps the first two dims of the torch OIHW weight), output
shape (printed NCHW for side-by-side comparability), trainable param
count, and Mult-Adds using torchsummaryX's exact rule — conv MACs =
weight element count x output spatial size; non-conv weights (PReLU
slopes) count their element count. Totals line matches the reference's
"===== total =====" block. Parameter-FREE modules print no row (our
MeanShift is a fold, not a frozen conv, so the reference's 24
non-trainable meanshift params and their rows don't exist here — the
trainable totals are identical).

Shapes come from `jax.eval_shape` over the flax module with
capture_intermediates — no real compute, any input size. The
authoritative FLOP total still comes from XLA's cost analysis of the
compiled forward (the numbers the TPU actually executes).
"""

from __future__ import annotations

import argparse
import re

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.cli import common


def _natural_key(path):
    return tuple(
        tuple(int(t) if t.isdigit() else t for t in re.split(r"(\d+)", p))
        for p in path
    )


def per_layer_table(model, height: int, width: int):
    """Rows of (layer_name, kernel_shape, output_shape_nchw, params, macs).

    MAC rule per reference utils/torchsummaryX.py:57-61.
    """
    dummy = jax.ShapeDtypeStruct((1, height, width, 3), jnp.float32)

    def fwd(p, x):
        return model.module.apply({"params": p}, x, capture_intermediates=True)

    _, state = jax.eval_shape(fwd, model.params, dummy)

    shapes = {}

    def walk_inter(node, path):
        if not isinstance(node, dict):
            return
        if "__call__" in node:
            out = node["__call__"][0]  # first invocation
            while isinstance(out, (tuple, list)):
                out = out[0]
            shapes[path] = out.shape
        for k, v in node.items():
            if k != "__call__":
                walk_inter(v, path + (k,))

    walk_inter(state["intermediates"], ())

    rows = []

    def walk_params(node, path):
        leaves = {k: v for k, v in node.items() if not isinstance(v, dict)}
        if leaves:
            params = sum(int(np.prod(np.shape(v))) for v in leaves.values())
            out_shape = shapes.get(path)
            kernel = leaves.get("kernel")
            if kernel is not None and np.ndim(kernel) == 4:
                kh, kw, ci, co = np.shape(kernel)
                ksize = [ci, co, kh, kw]
                out_spatial = (
                    int(np.prod(out_shape[1:3])) if out_shape is not None else 0)
                macs = int(np.prod(np.shape(kernel))) * out_spatial
            else:  # PReLU slope etc.: macs = element count (torchsummaryX rule)
                ksize = list(np.shape(next(iter(leaves.values()))))
                macs = sum(int(np.prod(np.shape(v))) for k, v in leaves.items()
                           if k != "bias")
            nchw = None
            if out_shape is not None and len(out_shape) == 4:
                n, h, w, c = out_shape
                nchw = [n, c, h, w]
            rows.append(("/".join(path), ksize, nchw, params, macs))
        for k, v in node.items():
            if isinstance(v, dict):
                walk_params(v, path + (k,))

    from flax import serialization

    walk_params(serialization.to_state_dict(model.params), ())
    rows.sort(key=lambda r: _natural_key(tuple(r[0].split("/"))))
    return rows


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

    rows = []
    try:
        rows = per_layer_table(model, args.input_height, args.input_width)
    except Exception as exc:  # a model the shape-walk can't traverse
        print("per-layer table unavailable: %s" % (exc,))
    if rows:
        # The reference torchsummaryX's "===== summary =====" format
        # (utils/torchsummaryX.py:133-141).
        print("")
        print("===== summary =====")
        print("layer_name\tmultiadds\tparams\tkernel_shape\toutput_shape")
        for name, ksize, out_nchw, params, macs in rows:
            print("%s\t%d\t%d\t%s\t%s" % (name, macs, params, ksize, out_nchw))
        print("===== ======= =====")
        print("===== total =====")
        print("- multiadds: %d" % (sum(r[4] for r in rows),))
        print("- params: %d" % (sum(r[3] for r in rows),))
        print("===== ===== =====")

    n_params, flops, table = summarize_model(model, args.input_height, args.input_width)
    if table:
        print(table)
    print("input: 1x%dx%dx3 (NHWC)" % (args.input_height, args.input_width))
    print("total params: %s" % ("{:,}".format(n_params),))
    if flops is not None:
        print("XLA forward FLOPs: %s (%.3f GFLOPs)" % ("{:,}".format(int(flops)), flops / 1e9))
        print("approx MACs: %s" % ("{:,}".format(int(flops) // 2),))
    return n_params, flops, rows


if __name__ == "__main__":
    main()
