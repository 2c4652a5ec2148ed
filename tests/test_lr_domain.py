"""--lr_domain_loss rollout across the packed families (round 3).

pixel_shuffle is a pure permutation and mean-L1 is permutation-
invariant, so computing the training loss PRE-SHUFFLE against
pixel-unshuffled targets yields IDENTICAL per-element gradients and a
loss equal up to f32 summation order — while the output depth-to-space
transpose (the largest non-conv cost in the round-3 train-step anatomy,
BASELINE.md) leaves the step's fwd AND bwd. EDSR / LarvaNet equivalents
live in tests/test_collapsed_tail.py / tests/test_models.py; this file
covers the round-3 family rollout (ops/packed/branchy.py,
ops/packed/msrr.py, ops/packed/mamnet.py LR-domain branches).
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model

# (model name, tiny-config flags) — every packed family that grew an
# --lr_domain_loss flag in round 3. Flags keep compile time small.
FAMILIES = [
    ("TreeNet", ["--num_common_blocks", "1", "--num_branches", "2",
                 "--num_branch_blocks", "1"]),
    ("REGO-Net", ["--len_side", "2", "--num_filters", "8"]),
    ("ebrn_rm", ["--num_brms", "2", "--num_filters", "8"]),
    ("ebrn_rm_BLI", ["--num_brms", "2", "--num_filters", "8"]),
    ("msrr_reduced", ["--num_blocks", "1"]),
    ("mamnet", ["--mamnet_res_blocks", "1", "--mamnet_conv_features", "16"]),
]


@pytest.mark.parametrize("name,flags", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_lr_domain_loss_equals_hr(name, flags, rng):
    """_compute_loss with --lr_domain_loss 1 has grads ARRAY-EQUAL to the
    HR-domain loss (--lr_domain_loss 0) and a loss scalar equal up to
    f32 summation order, on identical params/batch."""
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32))
    got = {}
    for flag in (0, 1):
        m = get_model(name)
        m.parse_args(list(flags) + ["--lr_domain_loss", str(flag)])
        m.prepare(is_training=True, scales=[4])
        loss, grads = jax.value_and_grad(m._compute_loss)(m.params, x, t)
        got[flag] = (float(loss),
                     np.asarray(jax.flatten_util.ravel_pytree(grads)[0]))
    assert abs(got[0][0] - got[1][0]) < 1e-4 * max(got[0][0], 1.0), name
    np.testing.assert_array_equal(got[1][1], got[0][1], err_msg=name)


def test_lr_domain_ignored_for_msrr_without_trailing_shuffle(rng):
    """The msrr / msrr_test kinds end in HR-domain convs AFTER their
    shuffles — no trailing permutation to commute, so --lr_domain_loss
    must be a no-op there (same loss bitwise, no error)."""
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32))
    losses = {}
    for flag in (0, 1):
        m = get_model("msrr")
        m.parse_args(["--num_blocks", "1", "--lr_domain_loss", str(flag)])
        m.prepare(is_training=True, scales=[4])
        losses[flag] = float(m._compute_loss(m.params, x, t))
    assert losses[0] == losses[1]
