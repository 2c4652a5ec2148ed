"""Optional tensor (channel) parallelism for conv layers.

SURVEY.md §2.5: the reference has no TP and these ≤2M-param convnets
don't need it at training scale; it exists for the 8K-streaming stretch
case where one chip's VMEM/HBM cannot hold a full-frame activation at
full channel width. Strategy: shard the conv's OUTPUT channels across a
'model' mesh axis — each device convolves the full (or spatially-
sharded) input against its kernel slice, producing its channel shard.
Elementwise ops and the next conv's contraction need the full feature
vector, so an all_gather over 'model' runs between layers (XLA lowers
it onto ICI). Composes with halo.py's spatial axis: a 2-D
('spatial', 'model') mesh shards H and C simultaneously.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P


def tp_conv3x3(x, kernel, bias, axis_name: str = "model"):
    """Channel-sharded 3x3 SAME conv, called inside shard_map.

    x: full-feature local input (N, H, W, C); kernel: this device's
    output-channel shard (3, 3, C, F/ndev); bias: (F/ndev,).
    Returns the local output shard, then gathers the full feature map.
    """
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    # next layer needs the full channel vector: gather shards over ICI
    return jax.lax.all_gather(out, axis_name, axis=3, tiled=True)


def make_tp_forward(apply_local, mesh: Mesh, axis_name: str = "model"):
    """Wrap a per-device forward (using tp_conv3x3 internally) into an
    SPMD function with kernels sharded on their last (output) dim."""

    def shard_kernels(tree):
        def spec(leaf):
            if leaf.ndim == 4:  # HWIO conv kernels: shard output channels
                return P(None, None, None, axis_name)
            if leaf.ndim == 1:  # biases
                return P(axis_name)
            return P()

        return jax.tree_util.tree_map(spec, tree)

    def wrap(params, x):
        return jax.shard_map(
            apply_local, mesh=mesh,
            in_specs=(shard_kernels(params), P()),
            out_specs=P(), check_vma=False,
        )(params, x)

    return jax.jit(wrap)
