"""Tiled-inference tests: reference chop-forward semantics and the
batched fixed-shape tile engine's exactness vs a full-frame forward."""

import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.eval.tiling import (
    TiledUpscaler,
    combine_images_2x2,
    split_image_2x2,
    upscale_with_chop_forward,
)


class _IdentityX4:
    """Fake model: nearest x4 upscale (linear, shift-free)."""

    def upscale(self, input_list, scale):
        return [np.repeat(np.repeat(im, 4, axis=1), 4, axis=2) for im in input_list]


def test_split_combine_roundtrip(rng):
    img = rng.uniform(0, 255, (3, 40, 56)).astype(np.float32)
    splits = split_image_2x2(img, overlap_size=8)
    assert len(splits) == 4
    assert splits[0].shape == (3, 24, 32)  # h/2+4, w/2+4
    outs = [np.repeat(np.repeat(s, 4, axis=1), 4, axis=2) for s in splits]
    combined = combine_images_2x2(outs, img, scale=4, overlap_size=8)
    ref = np.repeat(np.repeat(img, 4, axis=1), 4, axis=2)
    np.testing.assert_array_equal(combined, ref)


def test_chop_forward_api(rng):
    img = rng.uniform(0, 255, (3, 30, 34)).astype(np.float32)
    out = upscale_with_chop_forward(_IdentityX4(), img, scale=4, overlap_size=8)
    ref = np.repeat(np.repeat(img, 4, axis=1), 4, axis=2)
    np.testing.assert_array_equal(out, ref)


def _small_edsr():
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "2", "--edsr_conv_features", "8"])
    m.prepare(is_training=False, scales=[4])
    return m


def test_tiled_upscaler_matches_full_forward(rng):
    """With overlap/2 >= receptive radius, tiled == full frame exactly
    (away from nothing — tile borders at image edges coincide with the
    image border, so even edges match)."""
    m = _small_edsr()
    # receptive radius: 2 resblocks (2 convs each) + 3 standalone 3x3 convs
    # => 7 px; overlap 16 gives margin 8 per side.
    tiler = TiledUpscaler(
        lambda b: m.fwd_runtime(np.asarray(b, np.float32)),
        scale=4, tile_size=24, overlap=16, max_batch=4,
    )
    img = rng.uniform(0, 255, (40, 52, 3)).astype(np.float32)
    tiled = tiler.upscale_hwc(img)
    full = np.asarray(m.fwd_runtime(img[None]))[0]
    assert tiled.shape == full.shape == (160, 208, 3)
    np.testing.assert_allclose(tiled, full, atol=2e-3)


def test_tiled_upscaler_small_image_fallback(rng):
    m = _small_edsr()
    tiler = TiledUpscaler(lambda b: m.fwd_runtime(np.asarray(b, np.float32)),
                          scale=4, tile_size=64, overlap=16)
    img = rng.uniform(0, 255, (20, 24, 3)).astype(np.float32)
    out = tiler.upscale_hwc(img)
    full = np.asarray(m.fwd_runtime(img[None]))[0]
    np.testing.assert_allclose(out, full, atol=1e-4)


def test_tiled_upscaler_chw_wrapper(rng):
    m = _small_edsr()
    tiler = TiledUpscaler(lambda b: m.fwd_runtime(np.asarray(b, np.float32)),
                          scale=4, tile_size=24, overlap=16)
    img = rng.uniform(0, 255, (3, 40, 40)).astype(np.float32)
    out = tiler.upscale_chw(img)
    assert out.shape == (3, 160, 160)


def test_overlap_must_be_smaller_than_tile():
    with pytest.raises(ValueError):
        TiledUpscaler(lambda b: b, scale=4, tile_size=16, overlap=16)
