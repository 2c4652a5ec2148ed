"""Batched model-ensemble inference (BASELINE.json stretch config 5).

Runs K checkpoints of the same topology over the same input in ONE jit
call: parameter pytrees are stacked on a leading axis and the forward is
`jax.vmap`-ed over it, so XLA batches the ensemble's convs into single
larger contractions (K multiplies the matmul M dimension — better MXU
fill than K separate dispatches). Combine with the tile engine for
full-frame ensemble SR: `TiledUpscaler(EnsembleForward(...).mean, ...)`.

Also hosts self-ensemble (x8 dihedral test-time augmentation), the
SR-community trick the reference lacks: all eight orientations are
batched into one forward.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def stack_params(param_trees: Sequence) -> object:
    """Stack K compatible param pytrees on a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_trees)


class EnsembleForward:
    """vmapped multi-checkpoint forward over a shared input batch."""

    def __init__(self, apply_fn: Callable, param_trees: Sequence):
        self.apply_fn = apply_fn
        self.stacked = stack_params(param_trees)
        self.k = len(param_trees)
        self._jit = jax.jit(jax.vmap(apply_fn, in_axes=(0, None)))
        self._jit_mean = jax.jit(
            lambda p, x: jnp.mean(jax.vmap(apply_fn, in_axes=(0, None))(p, x), axis=0)
        )

    def all(self, x) -> jax.Array:
        """(K, N, H*s, W*s, C) — per-member outputs."""
        return self._jit(self.stacked, x)

    def mean(self, x) -> jax.Array:
        """(N, H*s, W*s, C) — ensemble average, reduced on device."""
        return self._jit_mean(self.stacked, x)


def _orient(x, k, flip):
    if flip:
        x = x[:, :, ::-1, :]
    return jnp.rot90(x, k=k, axes=(1, 2))


def _unorient(x, k, flip):
    x = jnp.rot90(x, k=-k, axes=(1, 2))
    if flip:
        x = x[:, :, ::-1, :]
    return x


def self_ensemble_forward(apply_fn: Callable):
    """x8 dihedral test-time augmentation in one jitted call.

    apply_fn(params, x_nhwc) -> y; the returned fn averages the
    de-augmented SR of all 8 orientations.
    """

    def fn(params, x):
        outs = []
        for flip in (False, True):
            for k in range(4):
                xo = _orient(x, k, flip)
                yo = apply_fn(params, xo)
                outs.append(_unorient(yo, k, flip))
        return jnp.mean(jnp.stack(outs), axis=0)

    return jax.jit(fn)
