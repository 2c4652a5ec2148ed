"""Spatially-sharded inference/training with halo exchange.

The spatial analog of sequence parallelism (SURVEY.md §2.5): the image's
H axis is sharded across a 'spatial' mesh axis, each device runs the
full conv net on its strip extended by a `halo` of neighbor rows
(exchanged over ICI with `jax.lax.ppermute` inside `jax.shard_map`),
then trims the halo from the output. This generalizes the reference's
host-side 2x2 chop-forward (utils/image_utils.py:7-65) to N devices
with device-resident exchange — full frames (4K/8K) never have to fit
on one chip.

Exactness: interior strip boundaries are bit-exact versus a full-frame
forward when `halo >= the model's receptive radius`. At the two *outer*
image borders the exchanged halo is zero-filled (ppermute edge), which
differs from SAME-conv progressive padding within `halo` rows of the
border — the same class of boundary approximation every production
tiled-SR system makes; eval protocols that shave borders are unaffected.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange(x: jax.Array, halo: int, axis_name: str, spatial_axis: int = 1) -> jax.Array:
    """Extend a local strip with `halo` rows from each mesh neighbor.

    Must be called inside shard_map. Edge devices receive zeros (the
    ppermute identity), matching SAME-conv zero padding at image borders.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    del idx
    lo = jax.lax.slice_in_dim(x, 0, halo, axis=spatial_axis)
    hi_start = x.shape[spatial_axis] - halo
    hi = jax.lax.slice_in_dim(x, hi_start, hi_start + halo, axis=spatial_axis)
    # my top rows go to my upper neighbor's bottom halo and vice versa
    from_above = jax.lax.ppermute(hi, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(lo, axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_above, x, from_below], axis=spatial_axis)


def spatial_sharded_forward(
    apply_fn: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    halo: int,
    scale: int,
    axis_name: str = "spatial",
    spatial_axis: int = 1,
    batch_axis_name: str | None = None,
):
    """Wrap an NHWC forward into an H-sharded SPMD forward.

    apply_fn(params, x_local_extended) -> y: full-model forward on a
    local halo-extended strip. Returns a jitted function
    (params, image_nhwc) -> sr_nhwc with the image's H axis sharded over
    `axis_name` (optionally batch over `batch_axis_name`); params are
    replicated.
    """
    in_spec = [None, None, None, None]
    in_spec[spatial_axis] = axis_name
    if batch_axis_name:
        in_spec[0] = batch_axis_name
    spec = P(*in_spec)

    def local_fn(params, x_local):
        ext = halo_exchange(x_local, halo, axis_name, spatial_axis)
        y = apply_fn(params, ext)
        trim = halo * scale
        size = y.shape[spatial_axis] - 2 * trim
        return jax.lax.slice_in_dim(y, trim, trim + size, axis=spatial_axis)

    sharded = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(sharded)
