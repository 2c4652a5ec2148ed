"""The realistic-geometry fixture tier (VERDICT r2 weak#2 / next#4).

The tiny frozen fixture (25-40 px) is border-dominated: chop-forward,
TiledUpscaler, halo sharding and the border operators all spend most of
their pixels in the border path there, and per-family soaks converge
onto ~1 MB of data. This tier pins 48 natural-statistics images at
~320x480 HR (1/f spectrum, luma-dominant chroma correlation, segment
edges, multi-scale texture) so every geometry-sensitive measurement can
run at sizes a user would actually serve.

Fast tier: statistics of a single rendered image (cheap). Slow tier:
full-tree determinism against the frozen manifest
(tests/data/fixture_real_manifest.json) and tiling/halo bit-exactness
at the realistic geometry.
"""

import json
import os

import numpy as np
import pytest

from larvanet_tpu.data import fixture

FROZEN = os.path.join(os.path.dirname(__file__), "data",
                      "fixture_real_manifest.json")


def test_natural_statistics_of_one_render():
    """The renderer must produce natural-image statistics: ~1/f^2 power
    spectrum, luma-dominant channel correlation, full dynamic range,
    heavy-ish gradient tails (edges)."""
    rng = np.random.default_rng(123)
    img = fixture._render_hr_natural(rng, 320, 480).astype(np.float64)
    assert img.shape == (320, 480, 3)
    assert img.min() == 0.0 and img.max() == 255.0  # percentile-normalized
    assert img.std() > 25.0

    lum = img.mean(-1)
    spec = np.abs(np.fft.rfft2(lum - lum.mean())) ** 2
    fy = np.fft.fftfreq(lum.shape[0])[:, None]
    fx = np.fft.rfftfreq(lum.shape[1])[None, :]
    r = np.sqrt(fy * fy + fx * fx).ravel()
    p = spec.ravel()
    m = (r > 0.01) & (r < 0.4)
    slope = np.polyfit(np.log(r[m]), np.log(p[m] + 1e-12), 1)[0]
    assert -3.5 < slope < -1.4, slope  # natural images: ~ -2

    c = np.corrcoef(img.reshape(-1, 3).T)
    assert c[0, 1] > 0.5 and c[0, 2] > 0.3  # correlated chroma

    gx = np.abs(np.diff(lum, axis=1))
    assert np.percentile(gx, 99) > 3.0 * np.percentile(gx, 50)  # edges


def test_realistic_shapes_are_deterministic_and_sized():
    rng = np.random.default_rng(fixture.REALISTIC_SEED)
    shapes = fixture._realistic_shapes(rng, fixture.REALISTIC_N_IMAGES)
    rng2 = np.random.default_rng(fixture.REALISTIC_SEED)
    assert shapes == fixture._realistic_shapes(rng2, fixture.REALISTIC_N_IMAGES)
    assert len(shapes) == 48
    assert any(lw % 2 == 1 for _, lw, _, _ in shapes)  # odd widths present
    assert any(eh or ew for _, _, eh, ew in shapes)    # truth-crop extras
    for lh, lw, _, _ in shapes:
        assert 72 <= lh <= 88 and 110 <= lw <= 131


@pytest.mark.slow
def test_generator_matches_frozen_manifest(tmp_path):
    """Full 48-image determinism pin (generation ~1-2 min)."""
    manifest = fixture.generate_realistic(str(tmp_path))
    with open(FROZEN) as f:
        frozen = json.load(f)
    assert manifest == frozen, ("realistic fixture generator drifted from "
                                "the frozen manifest")


@pytest.mark.slow
def test_tiling_and_halo_exact_at_realistic_geometry(tmp_path):
    """TiledUpscaler and the spatially-sharded forward must stay exact vs
    the full-frame packed+collapsed EDSR at ~320x480-HR geometry (the
    border/interior ratio the tiny fixture cannot represent)."""
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.data import io
    from larvanet_tpu.eval.tiling import TiledUpscaler
    from larvanet_tpu.ops.fastpath import build_fast_forward
    from larvanet_tpu.parallel.halo import spatial_sharded_forward
    from larvanet_tpu.parallel.mesh import make_mesh

    root = str(tmp_path / "fx")
    fixture.generate_realistic(root, n_images=1, n_test=0)
    with open(os.path.join(root, "MANIFEST.json")) as f:
        man = json.load(f)
    lr_rel = [k for k in man["images"] if k.startswith("x4/input/")][0]
    lr = io.load_image_u8(os.path.join(root, lr_rel)).astype(np.float32)
    x = lr[None]  # NHWC
    # even geometry for the packed path; realistic scale preserved
    x = x[:, : (x.shape[1] // 8) * 8, : (x.shape[2] // 8) * 8]

    model = get_model("edsr")
    model.parse_args(["--edsr_res_blocks", "2", "--edsr_conv_features", "8"])
    model.prepare(is_training=False, scales=[4])
    fwd, _ = build_fast_forward(model, jnp.float32)
    full = np.asarray(jax.jit(fwd)(model.params, x))

    # tiled: one compiled 64x64 tile shape covers the whole frame
    tiler = TiledUpscaler(
        lambda batch: np.asarray(jax.jit(fwd)(model.params,
                                              np.asarray(batch, np.float32))),
        scale=4, tile_size=64, overlap=24)
    tiled = tiler.upscale_chw(x[0].transpose(2, 0, 1)).transpose(1, 2, 0)[None]
    np.testing.assert_allclose(tiled, full, atol=2e-3)

    # halo-sharded over 2 virtual devices: bit-exact incl. borders
    if len(jax.devices()) >= 2:
        mesh = make_mesh((2,), ("spatial",), devices=jax.devices()[:2])
        sfwd = spatial_sharded_forward(lambda p, v: fwd(p, v), mesh,
                                       halo=16, scale=4)
        sharded = np.asarray(sfwd(model.params, x))
        np.testing.assert_allclose(sharded, full, atol=2e-3)
