"""Loss functions for the SR zoo.

  * l1_loss          — torch nn.L1Loss parity (every stepwise trainer,
                       reference models/edsr.py:55).
  * robust_sqrt_loss — mean((|o-t|+eps)^0.5), reference models/edsr_loss.py:35-37.
  * multi_exit_l1    — mean of per-exit L1s, the LarvaNet family's
                       training objective (reference models/LarvaNet.py:101-109)
                       and TreeNet's branch-averaged loss (TreeNet.py:115-124);
                       computed over a list of outputs inside one jitted
                       graph so XLA shares trunk activations across exits.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def l1_loss(pred, target):
    """Mean absolute error (torch nn.L1Loss parity)."""
    return jnp.mean(jnp.abs(pred - target))


def robust_sqrt_loss(pred, target, eps: float = 1e-5):
    """mean((|pred-target| + eps)^0.5) — reference models/edsr_loss.py:35-37."""
    return jnp.mean(jnp.sqrt(jnp.abs(pred - target) + eps))


def multi_exit_l1(outputs: Sequence, target):
    """Average L1 over early-exit outputs (LarvaNet/TreeNet objective)."""
    losses = [l1_loss(o, target) for o in outputs]
    return sum(losses) / len(losses)
