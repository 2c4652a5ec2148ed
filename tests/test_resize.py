"""Bit-parity of larvanet_tpu.ops.resize against torch.nn.functional.interpolate.

The interpolated base image is added directly to model outputs
(reference models/LarvaNet.py:283-285), so resampler parity is load-bearing
for the 0.02 dB PSNR budget.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from larvanet_tpu.ops.resize import upsample


def _torch_upsample(x_nhwc, scale, mode):
    t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    out = F.interpolate(t, scale_factor=scale, mode=mode, **kwargs)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("scale", [2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 8, 8, 3), (2, 5, 7, 3), (1, 1, 1, 3)])
def test_matches_torch(rng, mode, scale, shape):
    x = rng.uniform(0, 255, size=shape).astype(np.float32)
    ours = np.asarray(upsample(x, scale, mode))
    ref = _torch_upsample(x, scale, mode)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-5)


def test_upscale_identity_scale1(rng):
    x = rng.uniform(0, 255, size=(1, 6, 6, 3)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(upsample(x, 1, "bicubic")), x)


def test_chw_axes(rng):
    # CHW arrays (host contract) upsample via axes=(-2, -1).
    x = rng.uniform(0, 255, size=(3, 6, 6)).astype(np.float32)
    ours = np.asarray(upsample(x, 4, "bicubic", axes=(-2, -1)))
    ref = _torch_upsample(x[None].transpose(0, 2, 3, 1), 4, "bicubic")[0].transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-5)
