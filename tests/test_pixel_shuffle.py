"""PixelShuffle parity with torch.nn.PixelShuffle channel ordering."""

import numpy as np
import pytest
import torch

from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle


@pytest.mark.parametrize("r", [2, 3, 4])
def test_matches_torch(rng, r):
    n, h, w, c = 2, 4, 5, 3
    x = rng.standard_normal((n, h, w, c * r * r)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(x, r))
    t = torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), r)
    ref = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("r", [2, 4])
def test_roundtrip(rng, r):
    x = rng.standard_normal((1, 3, 3, 48)).astype(np.float32)
    y = pixel_unshuffle(pixel_shuffle(x, r), r)
    np.testing.assert_array_equal(np.asarray(y), x)
