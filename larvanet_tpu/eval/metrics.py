"""Evaluation metrics with bit-parity to the reference's protocols.

Two eval protocols exist in the reference:

* Challenge protocol (reference validate.py:17-27): round/clip both
  images to uint8, crop truth to the output's size, RGB PSNR with peak
  255 — `psnr_rgb` here.
* Paper protocol (reference test.py:30-46,152-170): shave a border of
  `scale` pixels, convert to the Y channel of YCbCr exactly like
  `skimage.color.rgb2ycbcr` (16 + 65.481R' + 128.553G' + 24.966B' with
  R'G'B' in [0,1]), round to uint8, then PSNR and SSIM with K1=0.01,
  K2=0.03, an 11x11 Gaussian window (sigma=1.5, truncated at 3.5 sigma)
  and population (not sample) covariance — `psnr_y` / `ssim` here.

All functions take HWC or CHW uint8/float arrays on host (numpy);
`ssim` uses a slice-shift separable Gaussian filter so there is no
scipy/skimage dependency. Batched on-device (jax) variants used by the
in-training validation path live alongside, suffixed `_jax`.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# uint8 / cropping helpers (reference validate.py:17-21, test.py:27-32)
# ---------------------------------------------------------------------------

def image_to_uint8(image: np.ndarray) -> np.ndarray:
    """Round then clip to [0, 255], uint8 (reference validate.py:17-18)."""
    return np.clip(np.round(image), 0, 255).astype(np.uint8)


def fit_truth_to_output(output_image: np.ndarray, truth_image: np.ndarray) -> np.ndarray:
    """Crop truth to the output's spatial size; works for HWC and CHW."""
    if output_image.ndim != truth_image.ndim:
        raise ValueError("rank mismatch")
    if output_image.shape[-1] <= 4 and output_image.ndim == 3:  # HWC
        return truth_image[: output_image.shape[0], : output_image.shape[1], :]
    return truth_image[:, : output_image.shape[1], : output_image.shape[2]]


def shave(img: np.ndarray, border: int) -> np.ndarray:
    """Trim `border` pixels from each spatial edge (reference test.py:30-32, HWC)."""
    return img[border:-border, border:-border, :]


# ---------------------------------------------------------------------------
# PSNR
# ---------------------------------------------------------------------------

def psnr_rgb(output_image: np.ndarray, truth_image: np.ndarray) -> float:
    """RGB PSNR, peak 255 (reference validate.py:23-27)."""
    diff = np.float32(truth_image) - np.float32(output_image)
    mse = np.mean(np.square(diff))
    return float(10.0 * np.log10(255.0 ** 2 / mse))


_Y_COEFF = np.array([65.481, 128.553, 24.966], dtype=np.float64) / 255.0
_Y_OFFSET = 16.0


def rgb_to_y(image_hwc: np.ndarray) -> np.ndarray:
    """Y channel of YCbCr, matching skimage.color.rgb2ycbcr on uint8 input.

    Input: HWC uint8 (or float in [0,255]). Output: float64 Y in [16, 235].
    """
    img = np.asarray(image_hwc, dtype=np.float64)
    return img @ _Y_COEFF + _Y_OFFSET


def psnr_y(output_hwc: np.ndarray, truth_hwc: np.ndarray) -> float:
    """Y-channel PSNR on uint8-rounded Y planes (reference test.py:159-169).

    The reference converts Y back to uint8 before comparing; data range 255.
    """
    oy = image_to_uint8(rgb_to_y(output_hwc))
    ty = image_to_uint8(rgb_to_y(truth_hwc))
    diff = np.float64(ty) - np.float64(oy)
    mse = np.mean(np.square(diff))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


# ---------------------------------------------------------------------------
# SSIM (skimage compare_ssim parity)
# ---------------------------------------------------------------------------

def _gaussian_kernel(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter_valid(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Separable 'valid' correlation of a 2D array with a 1D kernel."""
    k = len(kernel)
    out = np.zeros((img.shape[0] - k + 1, img.shape[1]), dtype=np.float64)
    for t in range(k):
        out += kernel[t] * img[t : img.shape[0] - k + 1 + t, :]
    out2 = np.zeros((out.shape[0], out.shape[1] - k + 1), dtype=np.float64)
    for t in range(k):
        out2 += kernel[t] * out[:, t : out.shape[1] - k + 1 + t]
    return out2


def _ssim_single(x: np.ndarray, y: np.ndarray, data_range: float, k1: float, k2: float, sigma: float) -> float:
    kernel = _gaussian_kernel(sigma)
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    ux = _filter_valid(x, kernel)
    uy = _filter_valid(y, kernel)
    uxx = _filter_valid(x * x, kernel)
    uyy = _filter_valid(y * y, kernel)
    uxy = _filter_valid(x * y, kernel)
    # use_sample_covariance=False => population moments (cov_norm = 1)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2.0 * ux * uy + c1) * (2.0 * vxy + c2)
    den = (ux * ux + uy * uy + c1) * (vx + vy + c2)
    return float(np.mean(num / den))


def ssim(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float = 255.0,
    k1: float = 0.01,
    k2: float = 0.03,
    sigma: float = 1.5,
) -> float:
    """Structural similarity matching the reference's skimage call
    (reference test.py:43-46): gaussian_weights=True, sigma=1.5,
    use_sample_covariance=False; channels averaged when HWC RGB.

    Note: skimage crops the border (Gaussian radius) before averaging,
    which this reproduces by filtering in 'valid' mode.
    """
    if im1.shape != im2.shape:
        raise ValueError("shape mismatch: %s vs %s" % (im1.shape, im2.shape))
    if im1.ndim == 3 and im1.shape[-1] == 3:
        return float(
            np.mean([
                _ssim_single(im1[..., c], im2[..., c], data_range, k1, k2, sigma)
                for c in range(3)
            ])
        )
    return _ssim_single(im1, im2, data_range, k1, k2, sigma)


# ---------------------------------------------------------------------------
# On-device (jax) batched variants for in-training validation
# ---------------------------------------------------------------------------

def psnr_rgb_jax(output, truth):
    """Batched RGB PSNR on device over uint8-quantized float tensors.

    Matches the challenge protocol: inputs are round/clipped to uint8
    values (kept in float for TPU friendliness). Accepts [..., H, W, C];
    reduces over all but the leading axis.
    """
    import jax.numpy as jnp

    o = jnp.clip(jnp.round(output), 0, 255)
    t = jnp.clip(jnp.round(truth), 0, 255)
    diff = t - o
    axes = tuple(range(1, o.ndim))
    mse = jnp.mean(diff * diff, axis=axes)
    return 10.0 * jnp.log10(255.0 ** 2 / mse)
