"""Function-preserving width transfer: warm-start LarvaNet_w64 from a
trained 48-channel checkpoint (net2net-style widening).

docs/SERVING.md recommends the MXU-native w64 trunk (1.7-1.9x at
identical params/FLOPs — BASELINE.md) but raw weights are not
transferable across widths, which stranded existing 48ch checkpoints on
the slower exact path. This closes that gap: each conv kernel
(kh, kw, Cin, Cout) embeds into the wider template as

    new[:, :, :Cin, :Cout] = old        # the trained function
    new[:, :, Cin:, :Cout] = 0          # old outputs IGNORE new channels
    new[:, :, :,    Cout:] = eps*normal # new outputs start near-silent
    bias: new[:Cout] = old, new[Cout:] = 0

so the widened model computes EXACTLY the 48ch model's function at
step 0 (the final projections' new-input rows are zero, and every
existing output's receptive field over new channels is zero) while the
new channels still TRAIN: their small random in-weights make their
activations nonzero, so the zero out-weights reading them receive real
gradients and grow into use (the classic fix for net2net's dead-unit
problem). Exactness and gradient liveness are pinned by
tests/test_width_transfer.py.

CLI: `cli/train*.py --widen_from ckpt48` (cli/common.maybe_widen_from);
the optimizer starts fresh (moments don't map across widths).
"""

from __future__ import annotations

import numpy as np
from flax import serialization


def _widen_leaf(old, new, rng, init_scale):
    old = np.asarray(old)
    new_shape = tuple(np.asarray(new).shape)
    if old.shape == new_shape:
        return np.asarray(old)
    if len(old.shape) != len(new_shape) or any(
            o > n for o, n in zip(old.shape, new_shape)):
        raise ValueError("cannot widen leaf %s -> %s" % (old.shape, new_shape))
    if old.ndim == 1:  # bias: new output slots start at 0
        out = np.zeros(new_shape, old.dtype)
        out[: old.shape[0]] = old
        return out
    if old.ndim == 4:  # HWIO conv kernel
        kh, kw, ci, co = old.shape
        nh, nw, nci, nco = new_shape
        if (kh, kw) != (nh, nw):
            raise ValueError("kernel window changed %s -> %s"
                             % (old.shape, new_shape))
        fan_in = kh * kw * nci
        std = init_scale * np.sqrt(2.0 / fan_in)
        out = np.zeros(new_shape, old.dtype)
        out[:, :, :ci, :co] = old                      # trained function
        # out[:, :, ci:, :co] stays 0: preserved outputs ignore new chans
        if nco > co:                                   # new output slots
            out[:, :, :, co:] = (rng.standard_normal(
                (kh, kw, nci, nco - co)) * std).astype(old.dtype)
        return out
    raise ValueError("unsupported leaf rank %d" % old.ndim)


def widen_params(old_params, new_params_template, seed: int = 0,
                 init_scale: float = 0.1):
    """Embed `old_params` (state dict or pytree) into the structure of
    `new_params_template` (same topology, wider channels). Returns a
    pytree matching the template. Raises with the offending key when the
    topologies differ beyond width (e.g. different --num_blocks)."""
    old_sd = serialization.to_state_dict(old_params)
    new_sd = serialization.to_state_dict(new_params_template)
    rng = np.random.default_rng(seed)

    def rec(o, n, path):
        if isinstance(n, dict):
            if not isinstance(o, dict) or set(o) != set(n):
                raise ValueError(
                    "width transfer needs the SAME topology (only channel "
                    "widths may differ); mismatch at %r: %r vs %r"
                    % (path, sorted(o) if isinstance(o, dict) else type(o),
                       sorted(n)))
            return {k: rec(o[k], n[k], path + "/" + k) for k in n}
        try:
            return _widen_leaf(o, n, rng, init_scale)
        except ValueError as e:
            raise ValueError("width transfer failed at %r: %s" % (path, e))

    widened = rec(old_sd, new_sd, "")
    return serialization.from_state_dict(new_params_template, widened)
