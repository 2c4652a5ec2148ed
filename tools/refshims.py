"""Import shims that let the reference repo's eval pipeline run here.

The parity harness (tools/protocol_parity.py) runs the reference's OWN
validate/test flows (reference validate.py:83-123, test.py:152-170) as
the ground truth side of the cross-framework PSNR comparison. Those
modules import `cv2` and `skimage` at module top, neither of which is
installed in this environment — so this module registers minimal,
faithful stand-ins in sys.modules before the reference code is imported:

* ``cv2``: PIL-backed ``imread``/``imwrite`` plus BGR<->RGB ``cvtColor``.
  PNG decoding is lossless; PIL and OpenCV produce byte-identical pixel
  arrays for 8-bit RGB PNGs (the repo's own loader tests pin this for
  the native decoder too, tests/test_native.py), so the shim does not
  weaken the parity claim — the reference side still computes its
  metrics with its own numpy code on identical pixels.
* ``skimage``: ``color.rgb2ycbcr`` implemented here from the published
  BT.601 matrix (same coefficients skimage documents), and
  ``measure.compare_psnr`` / ``compare_ssim`` backed by
  larvanet_tpu.eval.metrics — which were themselves written to the
  skimage formulas (eval/metrics.py docstrings) and verified against
  hand-computed values (tests/test_metrics.py). This means the
  *test.py-protocol* comparison shares the metric implementation across
  both sides (pixels still come from each framework's own pipeline);
  the *validate.py-protocol* comparison is fully independent — the
  reference's RGB PSNR is pure numpy from the reference repo itself.

Only the exact surface the reference eval path touches is provided;
anything else raises loudly.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _make_cv2():
    from PIL import Image

    cv2 = types.ModuleType("cv2")
    cv2.COLOR_BGR2RGB = 4
    cv2.COLOR_RGB2BGR = 4  # both are a channel reversal

    def imread(path):
        try:
            with Image.open(path) as im:
                rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
        except OSError:
            return None  # cv2.imread contract: None on failure
        return rgb[:, :, ::-1].copy()  # OpenCV returns BGR

    def imwrite(path, img):
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
        Image.fromarray(arr[:, :, ::-1], mode="RGB").save(path)
        return True

    def cvtColor(img, code):
        if code != 4:
            raise NotImplementedError("cv2 shim: cvtColor code %r" % (code,))
        return np.asarray(img)[:, :, ::-1].copy()

    cv2.imread = imread
    cv2.imwrite = imwrite
    cv2.cvtColor = cvtColor
    return cv2


# BT.601 YCbCr matrix on R'G'B' in [0,1] (skimage.color.rgb2ycbcr docs).
_YCBCR_M = np.array(
    [
        [65.481, 128.553, 24.966],
        [-37.797, -74.203, 112.0],
        [112.0, -93.786, -18.214],
    ],
    dtype=np.float64,
)
_YCBCR_OFF = np.array([16.0, 128.0, 128.0], dtype=np.float64)


def _rgb2ycbcr(image):
    arr = np.asarray(image)
    img = arr.astype(np.float64)
    if arr.dtype == np.uint8:
        img = img / 255.0  # skimage's img_as_float scaling
    return img @ _YCBCR_M.T + _YCBCR_OFF


def _make_skimage():
    from larvanet_tpu.eval import metrics

    skimage = types.ModuleType("skimage")
    color = types.ModuleType("skimage.color")
    measure = types.ModuleType("skimage.measure")

    color.rgb2ycbcr = _rgb2ycbcr

    def compare_psnr(im_true, im_test, data_range=None):
        if data_range is None:
            if im_true.dtype != np.uint8:
                raise NotImplementedError("skimage shim: pass data_range for non-uint8")
            data_range = 255
        mse = np.mean(np.square(np.float64(im_true) - np.float64(im_test)))
        if mse == 0:
            return float("inf")
        return float(10.0 * np.log10((float(data_range) ** 2) / mse))

    def compare_ssim(im1, im2, K1=0.01, K2=0.03, gaussian_weights=True, sigma=1.5,
                     use_sample_covariance=False, multichannel=False, data_range=None):
        if not gaussian_weights or use_sample_covariance:
            raise NotImplementedError("skimage shim: only the reference test.py call shape")
        if data_range is None:
            if im1.dtype != np.uint8:
                raise NotImplementedError("skimage shim: pass data_range for non-uint8")
            data_range = 255
        return metrics.ssim(np.asarray(im1), np.asarray(im2),
                            data_range=float(data_range), k1=K1, k2=K2, sigma=sigma)

    measure.compare_psnr = compare_psnr
    measure.compare_ssim = compare_ssim
    skimage.color = color
    skimage.measure = measure
    return skimage, color, measure


def install():
    """Register the shims (idempotent; never overwrites a real install)."""
    if "cv2" not in sys.modules:
        try:
            import cv2  # noqa: F401
        except ImportError:
            sys.modules["cv2"] = _make_cv2()
    if "skimage" not in sys.modules:
        try:
            import skimage  # noqa: F401
        except ImportError:
            skimage, color, measure = _make_skimage()
            sys.modules["skimage"] = skimage
            sys.modules["skimage.color"] = color
            sys.modules["skimage.measure"] = measure
