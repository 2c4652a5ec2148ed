"""ctypes bindings for the native data path (native/lvt_data.cpp).

Gracefully degrades: if liblvtdata.so hasn't been built (native/build.sh)
or libpng is missing, `available()` is False and callers fall back to
the PIL/numpy path. The native path accelerates the two host-side hot
spots: PNG decode into the uint8 cache and per-step augmented batch
assembly (written straight into float32 NHWC output buffers).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                         "native", "liblvtdata.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.lvt_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.lvt_decode_png.restype = ctypes.c_int
    lib.lvt_free.argtypes = [ctypes.c_void_p]
    lib.lvt_patch_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),  # lr imgs
        ctypes.POINTER(ctypes.c_void_p),  # hr imgs
        ctypes.POINTER(ctypes.c_int),     # lr dims
        ctypes.c_int,                     # num images
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # batch, patch, scale
        ctypes.c_uint64,                  # seed
        ctypes.POINTER(ctypes.c_float),   # out lr
        ctypes.POINTER(ctypes.c_float),   # out hr
        ctypes.c_int,                     # threads
    ]
    lib.lvt_patch_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree; returns availability."""
    script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
    try:
        subprocess.run(["sh", script], check=True,
                       capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return _load() is not None


def available() -> bool:
    return _load() is not None


def decode_png(path: str) -> np.ndarray:
    """Decode a PNG to HWC uint8 RGB via libpng."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native/build.sh)")
    out = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.lvt_decode_png(path.encode(), ctypes.byref(out), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError("lvt_decode_png(%r) failed with code %d" % (path, rc))
    try:
        arr = np.ctypeslib.as_array(out, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.lvt_free(out)
    return arr


class NativeBatcher:
    """Holds pinned references to a dataset's uint8 arrays and assembles
    augmented NHWC float32 batches natively."""

    def __init__(self, lr_images: List[np.ndarray], hr_images: List[np.ndarray],
                 scale: int, seed: Optional[int] = None, num_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (run native/build.sh)")
        if len(lr_images) != len(hr_images) or not lr_images:
            raise ValueError("need matching non-empty image lists")
        self._lib = lib
        self.scale = scale
        self.seed = np.uint64(seed if seed is not None else np.random.SeedSequence().entropy % 2 ** 63)
        self._step = 0
        self.num_threads = num_threads or min(8, os.cpu_count() or 1)
        # keep arrays alive + contiguous
        self._lr = [np.ascontiguousarray(a) for a in lr_images]
        self._hr = [np.ascontiguousarray(a) for a in hr_images]
        n = len(self._lr)
        self._lr_ptrs = (ctypes.c_void_p * n)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in self._lr])
        self._hr_ptrs = (ctypes.c_void_p * n)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in self._hr])
        dims = []
        for a, b in zip(self._lr, self._hr):
            if (a.shape[0] * scale, a.shape[1] * scale) != b.shape[:2]:
                raise ValueError("HR dims must be LR dims * scale")
            dims += [a.shape[0], a.shape[1]]
        self._dims = (ctypes.c_int * (2 * n))(*dims)
        self._n = n

    def seek(self, step: int) -> None:
        """Jump the per-batch counter (each batch() call hashes
        seed + step, so sampling is stateless in the counter)."""
        self._step = int(step)

    def batch(self, batch_size: int, patch: int) -> Tuple[np.ndarray, np.ndarray]:
        out_lr = np.empty((batch_size, patch, patch, 3), np.float32)
        hp = patch * self.scale
        out_hr = np.empty((batch_size, hp, hp, 3), np.float32)
        self._step += 1
        rc = self._lib.lvt_patch_batch(
            self._lr_ptrs, self._hr_ptrs, self._dims, self._n,
            batch_size, patch, self.scale,
            np.uint64(self.seed) + np.uint64(self._step),
            out_lr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_hr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_threads,
        )
        if rc != 0:
            raise RuntimeError("lvt_patch_batch failed with code %d" % (rc,))
        return out_lr, out_hr
