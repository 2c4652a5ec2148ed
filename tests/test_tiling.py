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


# ---------------------------------------------------------------------------
# Device-resident batched strips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chunk", [1, 2, 4])
def test_strip_batched_forward_exact_vs_full_frame(rng, chunk):
    """halo >= receptive radius => bit-level (float-tolerance) parity
    with the full-frame forward, including the outer image borders
    (outer windows put SAME padding on the true frame edge) — at every
    chunking (1 = sequential scan, 4 = fully batched)."""
    import jax
    from larvanet_tpu.eval.tiling import make_strip_batched_forward

    m = _small_edsr()  # receptive radius 7 (see above); halo 8 covers it
    fwd = make_strip_batched_forward(
        m._forward_impl, scale=4, n_strips=4, halo=8, height=48, width=36,
        chunk=chunk)
    x = rng.uniform(0, 255, (2, 48, 36, 3)).astype(np.float32)
    got = np.asarray(jax.jit(fwd)(m.params, x))
    full = np.asarray(jax.jit(m._forward_impl)(m.params, x))
    assert got.shape == full.shape == (2, 192, 144, 3)
    np.testing.assert_allclose(got, full, atol=2e-3)


def test_strip_batched_forward_under_halo_is_bounded_approximation(rng):
    """halo < receptive radius: interior rows far from strip seams are
    still exact; only rows within (radius - halo) of a seam may differ
    (the documented tiled-SR approximation)."""
    import jax
    from larvanet_tpu.eval.tiling import make_strip_batched_forward

    m = _small_edsr()
    fwd = make_strip_batched_forward(
        m._forward_impl, scale=4, n_strips=2, halo=4, height=48, width=36)
    x = rng.uniform(0, 255, (1, 48, 36, 3)).astype(np.float32)
    got = np.asarray(jax.jit(fwd)(m.params, x))
    full = np.asarray(jax.jit(m._forward_impl)(m.params, x))
    # seam at LR row 24; rows >= (7-4)=3 LR rows away from it are exact
    sl = np.s_[:, : (24 - 4) * 4], np.s_[:, (24 + 4) * 4:]
    for region in sl:
        np.testing.assert_allclose(got[region], full[region], atol=2e-3)


def test_strip_batched_forward_validates_geometry():
    from larvanet_tpu.eval.tiling import make_strip_batched_forward

    with pytest.raises(ValueError):  # height not divisible
        make_strip_batched_forward(lambda p, x: x, 4, n_strips=5, halo=4,
                                   height=48, width=36)
    with pytest.raises(ValueError):  # window exceeds frame
        make_strip_batched_forward(lambda p, x: x, 4, n_strips=2, halo=16,
                                   height=48, width=36)
    with pytest.raises(ValueError):  # chunk must divide n_strips
        make_strip_batched_forward(lambda p, x: x, 4, n_strips=4, halo=4,
                                   height=48, width=36, chunk=3)
    fwd = make_strip_batched_forward(lambda p, x: x, 1, n_strips=2, halo=4,
                                     height=48, width=36)
    with pytest.raises(ValueError):  # frame mismatch at call time
        fwd(None, np.zeros((1, 40, 36, 3), np.float32))


# ---------------------------------------------------------------------------
# Device-resident 2-D tile scan
# ---------------------------------------------------------------------------

def test_tile_scan_forward_exact_vs_full_frame(rng):
    """halo >= receptive radius => float-tolerance parity with the
    full-frame forward on a grid that exercises edge-shifted windows on
    BOTH axes (outer windows put SAME padding on the true frame edge)."""
    import jax
    from larvanet_tpu.eval.tiling import make_tile_scan_forward

    m = _small_edsr()  # receptive radius 7; halo 8 covers it
    fwd = make_tile_scan_forward(
        m._forward_impl, scale=4, tile_h=16, tile_w=12, halo=8,
        height=48, width=36)
    x = rng.uniform(0, 255, (2, 48, 36, 3)).astype(np.float32)
    got = np.asarray(jax.jit(fwd)(m.params, x))
    full = np.asarray(jax.jit(m._forward_impl)(m.params, x))
    assert got.shape == full.shape == (2, 192, 144, 3)
    np.testing.assert_allclose(got, full, atol=2e-3)


def test_tile_scan_forward_single_row_and_column(rng):
    """Degenerate grids (1 tile-row / 1 tile-column) still cover the
    frame exactly."""
    import jax
    from larvanet_tpu.eval.tiling import make_tile_scan_forward

    m = _small_edsr()
    for th, tw in ((48, 12), (16, 36)):
        fwd = make_tile_scan_forward(
            m._forward_impl, scale=4, tile_h=th, tile_w=tw, halo=8,
            height=48, width=36)
        x = rng.uniform(0, 255, (1, 48, 36, 3)).astype(np.float32)
        got = np.asarray(jax.jit(fwd)(m.params, x))
        full = np.asarray(jax.jit(m._forward_impl)(m.params, x))
        np.testing.assert_allclose(got, full, atol=2e-3)


def test_tile_scan_forward_under_halo_seam_locality(rng):
    """halo < receptive radius: pixels >= (radius - halo) from every
    tile seam are still exact (the documented tiled-SR approximation)."""
    import jax
    from larvanet_tpu.eval.tiling import make_tile_scan_forward

    m = _small_edsr()
    fwd = make_tile_scan_forward(
        m._forward_impl, scale=4, tile_h=24, tile_w=18, halo=4,
        height=48, width=36)
    x = rng.uniform(0, 255, (1, 48, 36, 3)).astype(np.float32)
    got = np.asarray(jax.jit(fwd)(m.params, x))
    full = np.asarray(jax.jit(m._forward_impl)(m.params, x))
    # seams at LR row 24 / col 18; margin (7-4)=3 LR px
    r0, r1 = (24 - 4) * 4, (24 + 4) * 4
    c0, c1 = (18 - 4) * 4, (18 + 4) * 4
    np.testing.assert_allclose(got[:, :r0, :c0], full[:, :r0, :c0], atol=2e-3)
    np.testing.assert_allclose(got[:, r1:, c1:], full[:, r1:, c1:], atol=2e-3)


def test_tile_scan_forward_validates_geometry():
    from larvanet_tpu.eval.tiling import make_tile_scan_forward

    with pytest.raises(ValueError):  # height not divisible
        make_tile_scan_forward(lambda p, x: x, 4, tile_h=5, tile_w=12,
                               halo=4, height=48, width=36)
    with pytest.raises(ValueError):  # width not divisible
        make_tile_scan_forward(lambda p, x: x, 4, tile_h=16, tile_w=5,
                               halo=4, height=48, width=36)
    # oversized windows CLAMP to the frame (more context, still exact)
    make_tile_scan_forward(lambda p, x: x, 4, tile_h=16, tile_w=36,
                           halo=16, height=48, width=36)
    fwd = make_tile_scan_forward(lambda p, x: x, 1, tile_h=16, tile_w=12,
                                 halo=4, height=48, width=36)
    with pytest.raises(ValueError):  # frame mismatch at call time
        fwd(None, np.zeros((1, 40, 36, 3), np.float32))
