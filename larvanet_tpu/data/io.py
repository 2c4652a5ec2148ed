"""Host-side image IO.

Keeps the reference's data contract: images travel through the framework
as CHW float32 RGB in [0, 255] (reference dataloaders/div2k_train_loader.py:143-148,
which does cv2 BGR->RGB -> transpose -> float32). The reference uses
OpenCV; this framework uses PIL (available in the image) — both decode
the same 8-bit PNG bytes, so values are identical.

For memory efficiency the caches hold uint8 HWC (4x smaller than the
reference's float32 CHW cache); conversion to float happens on device.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image


def load_image_chw(path: str) -> np.ndarray:
    """Read a PNG as CHW float32 RGB in [0,255] (reference loader contract)."""
    return load_image_u8(path).transpose(2, 0, 1).astype(np.float32)


def load_image_u8(path: str) -> np.ndarray:
    """Read a PNG as HWC uint8 RGB (native libpng decoder when built,
    PIL otherwise — bit-identical output, see tests)."""
    if path.lower().endswith(".png"):
        from larvanet_tpu.data import native

        if native.available():
            try:
                return native.decode_png(path)
            except IOError:
                pass  # fall back for odd files
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def save_image_chw(image_chw: np.ndarray, path: str) -> None:
    """Write a CHW uint8/float image as PNG (reference validate.py:29-32)."""
    img = np.asarray(image_chw)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    img = np.transpose(img, (1, 2, 0))
    save_image_hwc(img, path)


def save_image_hwc(image_hwc: np.ndarray, path: str) -> None:
    img = np.asarray(image_hwc)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(img, mode="RGB").save(path)


def list_pngs(directory: str) -> List[str]:
    """Sorted basenames (without extension) of PNGs in a directory
    (reference dataloaders/div2k_train_loader.py:36-37)."""
    return sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(directory)
        if f.lower().endswith(".png")
    )
