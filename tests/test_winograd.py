"""Winograd F(2x2,3x3) trunk correctness (VERDICT r2 #2).

The Winograd path is an opt-in serving mode whose f32 output must agree
with direct convolution at float tolerance (the summation order
differs, so bit-identity is not expected — same standard as the packed
trunk's float-tolerance contract, BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _direct_conv(x, k, b):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (5, 6), (1, 1), (2, 3)])
def test_wino_conv_matches_direct(rng, hw):
    from larvanet_tpu.ops.winograd import transform_weights, wino_conv3x3

    h, w = hw
    c, k = 8, 8
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32)) * 100
    kern = jnp.asarray(rng.normal(size=(3, 3, c, k)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))

    want = np.asarray(_direct_conv(x, kern, bias))
    got = np.asarray(wino_conv3x3(x, transform_weights(kern), bias, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


def test_wino_conv_zero_border_semantics(rng):
    # borders must equal SAME zero-padded direct conv exactly (same
    # padding model), including odd sizes where the last tile is partial
    from larvanet_tpu.ops.winograd import transform_weights, wino_conv3x3

    c = 4
    x = jnp.asarray(rng.normal(size=(1, 5, 5, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32))
    bias = jnp.zeros((c,), jnp.float32)
    want = np.asarray(_direct_conv(x, kern, bias))
    got = np.asarray(wino_conv3x3(x, transform_weights(kern), bias, jnp.float32))
    np.testing.assert_allclose(got[:, 0, :, :], want[:, 0, :, :], rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(got[:, :, -1, :], want[:, :, -1, :], rtol=2e-5, atol=1e-3)


def test_winograd_edsr_forward_matches_module(rng):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.winograd import make_winograd_edsr_forward

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "2"])
    m.prepare(is_training=False, scales=[4])

    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 12, 3)).astype(np.float32))
    want = np.asarray(m.module.apply({"params": m.params}, x))
    fwd = make_winograd_edsr_forward(m, dtype=jnp.float32)
    got = np.asarray(jax.jit(fwd)(m.params, x))
    # float-tolerance, not bit-identity: Winograd reorders the summation
    # (docstring in ops/winograd.py); 0.15 on the 0-255 output scale is
    # ~1/1700 of a grey level per pixel — measured PSNR deltas are
    # reported like the int8 path's
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.15)


def test_winograd_edsr_res_weight(rng):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.winograd import make_winograd_edsr_forward

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1",
                  "--edsr_res_weight", "0.1"])
    m.prepare(is_training=False, scales=[4])
    x = jnp.asarray(rng.uniform(0, 255, (1, 8, 8, 3)).astype(np.float32))
    want = np.asarray(m.module.apply({"params": m.params}, x))
    fwd = make_winograd_edsr_forward(m, dtype=jnp.float32)
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.15)
