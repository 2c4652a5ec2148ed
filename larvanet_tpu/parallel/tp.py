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


def _kernel_specs(params, axis_name):
    def spec(leaf):
        if leaf.ndim == 4:  # HWIO conv kernels: shard output channels
            return P(None, None, None, axis_name)
        if leaf.ndim == 1:  # biases
            return P(axis_name)
        return P()

    return jax.tree_util.tree_map(spec, params)


def tp_stack_apply(params, x, scale: int, axis_name: str = "model"):
    """A conv-relu chain + PixelShuffle tail with every conv
    output-channel sharded (tp_conv3x3). params: {"conv0": {kernel,bias},
    "conv1": ...} applied in index order; the last conv maps to
    3*scale**2 channels (no activation) and feeds the shuffle. Runs
    inside shard_map; channel counts must divide the 'model' axis size.
    """
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    names = sorted((n for n in params if n.startswith("conv")),
                   key=lambda n: int(n[4:]))
    h = x
    for i, name in enumerate(names):
        p = params[name]
        h = tp_conv3x3(h, p["kernel"], p["bias"], axis_name)
        if i < len(names) - 1:
            h = jax.nn.relu(h)
    return pixel_shuffle(h, scale)


def make_tp_spatial_forward(mesh: Mesh, halo: int, scale: int,
                            model_axis: str = "model",
                            spatial_axis: str = "spatial"):
    """2-D ('spatial', 'model') composition: the image's H axis shards
    over `spatial_axis` with ppermute halo exchange (parallel/halo.py)
    while every conv's output channels shard over `model_axis` with an
    all_gather between layers — H and C sharded SIMULTANEOUSLY, the
    composition the round-1 docstring only claimed. Validated by
    tests/test_tp.py (4-conv + PixelShuffle equivalence on a 2x2 virtual
    mesh) and dryrun_multichip.

    Cost model (why this is an 8K-stretch capability, not a default):
    each 3x3 conv at C channels does 18*C FLOPs per gathered element but
    the all_gather moves the FULL (H_local+2*halo, W, C) feature map over
    ICI once per layer, so the compute:communication ratio is fixed at
    ~18C flops/(C*(g-1)/g * 2 bytes) ≈ 9*g/(g-1) FLOP/byte for g-way
    model sharding — far below a v5e's ~4400 FLOP/byte ICI balance
    point. TP-conv is therefore bandwidth-bound BY CONSTRUCTION and only
    pays when the alternative is not running at all (activation memory:
    one chip cannot hold the full-frame HR activations); for pure
    throughput use data/spatial sharding (parallel/halo.py, mesh.py).
    Measured context in BASELINE.md (round-2 TP note).
    """

    def local_fn(params, x_local):
        from larvanet_tpu.parallel.halo import halo_exchange

        ext = halo_exchange(x_local, halo, spatial_axis)
        y = tp_stack_apply(params, ext, scale, model_axis)
        trim = halo * scale
        return jax.lax.slice_in_dim(y, trim, y.shape[1] - trim, axis=1)

    def wrap(params, x):
        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(_kernel_specs(params, model_axis), P(None, spatial_axis)),
            out_specs=P(None, spatial_axis), check_vma=False,
        )(params, x)

    return jax.jit(wrap)
