"""Paired LR/HR image dataset with patch sampling and augmentation.

Replicates the reference loader semantics (reference
dataloaders/div2k_train_loader.py):
  * filename schemes: DIV2K ('X{s}/{name}x{s}.png' input vs '{name}.png'
    truth, :109-141) and flat ('{name}.png' both, basic_loader.py:109-142);
  * random crop aligned to the scale (:77-84);
  * augmentation: rot90 with k in 1..4, then 50% horizontal flip (:87-95);
  * images as CHW float32 RGB in [0,255] at the API surface (:143-148).

TPU redesign: the cache holds uint8 HWC (4x smaller than the reference's
float32 cache — the whole DIV2K train set fits in ~3.5 GB), cropping and
augmenting uint8 patches on host (cheap slicing), converting to float32
only at batch-assembly time. Randomness is an explicit
numpy Generator per dataset (seedable; the reference used the global
numpy RNG).
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from larvanet_tpu.data import io


class PairDataset:
    """LR/HR pair store with optional in-RAM uint8 cache."""

    def __init__(
        self,
        input_path: str,
        truth_path: str,
        scheme: str = "div2k",  # 'div2k' | 'flat'
        cached: bool = False,
        seed: Optional[int] = None,
        use_native: bool = True,
    ):
        self.input_path = input_path
        self.truth_path = truth_path
        self.scheme = scheme
        self.cached = cached
        self.seed = seed
        self.use_native = use_native
        self.rng = np.random.default_rng(seed)
        self.image_names: List[str] = []
        self._input_cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._truth_cache: Dict[str, np.ndarray] = {}
        self._native_batchers: Dict[int, object] = {}
        self._cache_lock = threading.Lock()

    def prepare(self, scales: Sequence[int]) -> None:
        self.scale_list = list(scales)
        self.image_names = io.list_pngs(self.truth_path)
        for s in self.scale_list:
            self._input_cache[s] = {}
        print(
            "data: %d images are prepared (%s)"
            % (len(self.image_names), "caching enabled" if self.cached else "caching disabled")
        )

    def __len__(self) -> int:
        return len(self.image_names)

    # -- raw image access ----------------------------------------------------

    def _input_file(self, scale: int, name: str) -> str:
        if self.scheme == "div2k":
            return os.path.join(self.input_path, "X%d" % scale, "%sx%d.png" % (name, scale))
        return os.path.join(self.input_path, "%s.png" % name)

    def _truth_file(self, name: str) -> str:
        return os.path.join(self.truth_path, "%s.png" % name)

    def input_u8(self, scale: int, index: int) -> np.ndarray:
        name = self.image_names[index]
        if self.cached:
            with self._cache_lock:
                img = self._input_cache[scale].get(name)
            if img is not None:
                return img
        img = io.load_image_u8(self._input_file(scale, name))
        if self.cached:
            with self._cache_lock:
                self._input_cache[scale][name] = img
        return img

    def truth_u8(self, index: int) -> np.ndarray:
        name = self.image_names[index]
        if self.cached:
            with self._cache_lock:
                img = self._truth_cache.get(name)
            if img is not None:
                return img
        img = io.load_image_u8(self._truth_file(name))
        if self.cached:
            with self._cache_lock:
                self._truth_cache[name] = img
        return img

    def image_pair_chw(self, index: int, scale: int) -> Tuple[np.ndarray, np.ndarray, str]:
        """Full-image pair as CHW float32 (the reference's get_image_pair)."""
        inp = self.input_u8(scale, index).transpose(2, 0, 1).astype(np.float32)
        tru = self.truth_u8(index).transpose(2, 0, 1).astype(np.float32)
        return inp, tru, self.image_names[index]

    # -- patch sampling --------------------------------------------------------

    def random_patch_pair_u8(
        self, scale: int, input_patch_size: int, index: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One augmented HWC uint8 patch pair (reference :61-98 semantics)."""
        if index is None:
            index = int(self.rng.integers(len(self.image_names)))
        inp = self.input_u8(scale, index)
        tru = self.truth_u8(index)

        h, w = inp.shape[:2]
        p = input_patch_size
        x = int(self.rng.integers(w - p))
        y = int(self.rng.integers(h - p))
        ip = inp[y : y + p, x : x + p]
        tp = tru[y * scale : (y + p) * scale, x * scale : (x + p) * scale]

        k = int(self.rng.integers(4)) + 1
        ip = np.rot90(ip, k=k, axes=(0, 1))
        tp = np.rot90(tp, k=k, axes=(0, 1))
        if self.rng.uniform() < 0.5:
            ip = ip[:, ::-1]
            tp = tp[:, ::-1]
        return np.ascontiguousarray(ip), np.ascontiguousarray(tp)

    def patch_batch_nhwc(
        self, batch_size: int, scale: int, input_patch_size: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch of augmented patches as NHWC float32 (device-ready).

        Uses the native C++ batcher (3x faster assembly) when the library
        is built and the dataset is fully cached; numpy otherwise.
        """
        nb = self._native_batcher(scale)
        if nb is not None:
            return nb.batch(batch_size, input_patch_size)
        ins = np.empty((batch_size, input_patch_size, input_patch_size, 3), np.float32)
        trs = np.empty(
            (batch_size, input_patch_size * scale, input_patch_size * scale, 3), np.float32
        )
        for i in range(batch_size):
            ip, tp = self.random_patch_pair_u8(scale, input_patch_size)
            ins[i] = ip
            trs[i] = tp
        return ins, trs

    def reseed_for_step(self, step: int) -> None:
        """Stateless re-key: numpy stream from SeedSequence((seed, step)),
        native batchers seek their (seed + step) counter — both make
        resume-at-step-N draw exactly what an uninterrupted run would."""
        if self.seed is None:
            return
        self.rng = np.random.default_rng((self.seed, step))
        for nb in self._native_batchers.values():
            nb.seek(step)

    def _native_batcher(self, scale: int):
        """Build (once) a native batch assembler over the full uint8 cache."""
        if not self.use_native or not self.cached:
            return None
        cached = self._native_batchers.get(scale)
        if cached is not None:
            return cached
        from larvanet_tpu.data import native

        if not native.available():
            self.use_native = False
            return None
        # Pre-decode everything (the cache must be complete to pin pointers).
        lr = [self.input_u8(scale, i) for i in range(len(self.image_names))]
        hr = [self.truth_u8(i) for i in range(len(self.image_names))]
        try:
            nb = native.NativeBatcher(
                lr, hr, scale=scale,
                seed=None if self.seed is None else self.seed + scale,
            )
        except ValueError:
            # e.g. HR dims not exactly LR*scale — fall back silently
            self.use_native = False
            return None
        self._native_batchers[scale] = nb
        return nb
