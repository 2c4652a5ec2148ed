"""Collapsed linear tail: exact equivalence with the original EDSR
forward (including borders, via halo-strip stitching)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_matches_original_forward(scale, rng):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "16", "--edsr_res_blocks", "2"])
    m.prepare(is_training=False, scales=[scale])
    fwd = make_collapsed_edsr_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (1, 13, 17, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    assert got.shape == ref.shape
    # float-reassociation tolerance: composed conv sums ~1600 products at
    # once; relative error ~1e-4 on the [0,255] scale.
    np.testing.assert_allclose(got, ref, atol=0.1)


def test_multiple_shapes_share_kernel(rng):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_edsr_forward(m)
    for hw in [(9, 9), (12, 20)]:
        x = jnp.asarray(rng.uniform(0, 255, (1, *hw, 3)).astype(np.float32))
        ref = np.asarray(m.module.apply({"params": m.params}, x))
        got = np.asarray(jax.jit(fwd)(m.params, x))
        np.testing.assert_allclose(got, ref, atol=0.1)


def test_res_weight_respected(rng):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "2",
                  "--edsr_res_weight", "0.1"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_edsr_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 10, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.1)


def test_larvanet_base_fold_exact(rng):
    """Exactness of the (measured-slower, unwired) LarvaNet base fold."""
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_larvanet_forward

    m = get_model("LarvaNet")
    m.parse_args(["--num_blocks", "2,3"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_larvanet_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (1, 13, 17, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_larvanet_base_fold_rejects_other_configs():
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_larvanet_forward

    m = get_model("LarvaNetV2")
    m.parse_args(["--num_blocks", "1,1"])
    m.prepare(is_training=False, scales=[4])
    with pytest.raises(ValueError):
        make_collapsed_larvanet_forward(m)
