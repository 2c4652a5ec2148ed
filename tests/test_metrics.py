"""Metric parity tests.

PSNR formulas are checked against hand-computed values and the reference
protocol's semantics (round-to-uint8 first, truth cropped to output).
SSIM is checked against an independent scipy.ndimage implementation of
skimage's algorithm (skimage itself is not in the image).
"""

import numpy as np
import pytest
import scipy.ndimage

from larvanet_tpu.eval import metrics


def test_image_to_uint8_rounds_then_clips():
    x = np.array([[-3.2, 0.49, 0.51, 254.5, 300.0]])
    out = metrics.image_to_uint8(x)
    assert out.dtype == np.uint8
    # np.round is banker's rounding: 254.5 -> 254
    np.testing.assert_array_equal(out, [[0, 0, 1, 254, 255]])


def test_psnr_rgb_known_value():
    a = np.zeros((4, 4, 3), np.uint8)
    b = np.full((4, 4, 3), 16, np.uint8)
    # mse = 256 -> psnr = 10*log10(255^2/256)
    assert metrics.psnr_rgb(a, b) == pytest.approx(10 * np.log10(255.0 ** 2 / 256.0))


def test_psnr_identical_is_inf_y():
    img = (np.arange(4 * 4 * 3).reshape(4, 4, 3) % 255).astype(np.uint8)
    assert metrics.psnr_y(img, img) == float("inf")


def test_fit_truth_crop_hwc_and_chw():
    out_hwc = np.zeros((5, 6, 3))
    truth_hwc = np.zeros((8, 9, 3))
    assert metrics.fit_truth_to_output(out_hwc, truth_hwc).shape == (5, 6, 3)
    out_chw = np.zeros((3, 5, 6))
    truth_chw = np.zeros((3, 8, 9))
    assert metrics.fit_truth_to_output(out_chw, truth_chw).shape == (3, 5, 6)


def test_rgb_to_y_matches_itu():
    # Pure white -> Y=235, pure black -> Y=16 (studio swing).
    white = np.full((1, 1, 3), 255, np.uint8)
    black = np.zeros((1, 1, 3), np.uint8)
    assert metrics.rgb_to_y(white)[0, 0] == pytest.approx(235.0, abs=1e-6)
    assert metrics.rgb_to_y(black)[0, 0] == pytest.approx(16.0, abs=1e-6)


def _ssim_scipy(x, y, data_range=255.0, k1=0.01, k2=0.03, sigma=1.5):
    """Independent reimplementation of skimage.compare_ssim semantics."""
    truncate = 3.5
    r = int(truncate * sigma + 0.5)
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    filt = lambda im: scipy.ndimage.gaussian_filter(im, sigma, truncate=truncate)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx, vy, vxy = uxx - ux * ux, uyy - uy * uy, uxy - ux * uy
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s[r:-r, r:-r].mean()


def test_ssim_matches_scipy_reference(rng):
    x = rng.integers(0, 256, size=(40, 50), dtype=np.uint8)
    noise = rng.normal(0, 10, size=x.shape)
    y = np.clip(x + noise, 0, 255).astype(np.uint8)
    ours = metrics.ssim(x, y)
    ref = _ssim_scipy(x, y)
    assert ours == pytest.approx(ref, abs=1e-6)


def test_ssim_multichannel_averages(rng):
    x = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    y = np.clip(x + rng.normal(0, 5, x.shape), 0, 255).astype(np.uint8)
    per_chan = np.mean([metrics.ssim(x[..., c], y[..., c]) for c in range(3)])
    assert metrics.ssim(x, y) == pytest.approx(per_chan, abs=1e-12)


def test_ssim_identical_is_one(rng):
    x = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    assert metrics.ssim(x, x) == pytest.approx(1.0, abs=1e-9)


def test_psnr_rgb_jax_matches_numpy(rng):
    out = rng.uniform(-10, 265, size=(2, 16, 16, 3)).astype(np.float32)
    truth = rng.uniform(0, 255, size=(2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(metrics.psnr_rgb_jax(out, truth))
    for i in range(2):
        want = metrics.psnr_rgb(
            metrics.image_to_uint8(out[i]), metrics.image_to_uint8(truth[i])
        )
        assert got[i] == pytest.approx(want, abs=1e-3)
