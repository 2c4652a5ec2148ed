"""Tiled full-frame inference.

Three device-resident/batched engines + the reference-parity chop:

1. `upscale_with_chop_forward` — exact reference semantics (reference
   utils/image_utils.py:7-65): split the CHW image into 2x2 quadrants,
   each extended by overlap/2, upscale each separately, paste trimmed
   quadrants. Kept for CLI/flag parity (--chop_forward).

2. `TiledUpscaler` — the TPU-native generalization (SURVEY.md §5
   "long-context" analog): fixed-size overlapping tiles gathered into
   ONE batched NHWC tensor and pushed through a single jitted forward.
   Fixed tile shape means one XLA compilation covers every image size
   (the per-image-shape recompilation a naive full-frame eval would hit),
   and the batch dimension keeps the MXU fed. Tiles are clamped to lie
   fully inside the image (no padding), so with `overlap/2 >= the
   model's receptive radius` outputs are bit-identical to a full-frame
   forward; ownership of overlapping rows/cols is split at the midpoint
   between neighboring tiles.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Device-resident batched strips (single chip)
# ---------------------------------------------------------------------------

def make_strip_batched_forward(
    apply_fn: Callable,
    scale: int,
    n_strips: int,
    halo: int,
    height: int,
    width: int,
    chunk: int = 1,
) -> Callable:
    """Full-frame SR as ONE jittable call over a batch of height strips.

    The single-device analog of parallel/halo.spatial_sharded_forward's
    windowed scheme (same uniform-window math, batch dim instead of mesh
    shards): the (N, H, W, 3) frame is cut into `n_strips` uniform
    windows of `H/n_strips + 2*halo` rows — shifted to stay inside the
    image, so the outer windows' SAME-conv padding falls on the TRUE
    frame boundary — pushed through `apply_fn` as one batch, and the
    owned rows are re-concatenated. Everything is static slicing: no
    host round-trips, no dynamic shapes, one XLA compile per frame size.

    Why: a full-frame forward keeps ~H*W-sized activations live through
    every conv, which measures several times slower per pixel than the
    batched-patch shapes the packed kernels were tuned on (BASELINE.md
    round-4 8K table); strip batching restores patch-like working sets
    while the frame stays resident in HBM.

    Exactness: bit-identical to the full-frame forward when `halo >=
    the model's receptive radius` (same argument as parallel/halo.py —
    every owned row is >= halo real rows from any non-true window edge).
    Smaller halos are the standard tiled-SR boundary approximation (the
    class the reference's own chop_forward, utils/image_utils.py:7-27,
    accepts); measure the delta on your eval set (tools/tile8k_bench.py
    reports it vs the full-frame graph on a trained checkpoint).

    Memory: strips are processed `chunk` at a time under `lax.scan`, so
    only one chunk's activations are ever live — batching ALL strips at
    once holds (1 + 2*halo*n/H)x the full frame's activations and
    measured an HBM compile OOM at the flagship 1080p geometry.
    """
    import jax
    import jax.numpy as jnp

    if height % n_strips:
        raise ValueError("height %d not divisible by n_strips %d"
                         % (height, n_strips))
    if n_strips % chunk:
        raise ValueError("n_strips %d not divisible by chunk %d"
                         % (n_strips, chunk))
    sh = height // n_strips
    win = sh + 2 * halo
    if win > height:
        raise ValueError("strip window %d exceeds frame height %d — fewer "
                         "strips or a smaller halo" % (win, height))
    starts = [min(max(i * sh - halo, 0), height - win) for i in range(n_strips)]
    offs = [i * sh - starts[i] for i in range(n_strips)]  # owned offset in window
    n_chunks = n_strips // chunk

    def forward(params, x):
        n_frames = x.shape[0]
        if x.shape[1] != height or x.shape[2] != width:
            raise ValueError("frame shape %s does not match the traced "
                             "(%d, %d) geometry" % (x.shape[1:3], height, width))
        starts_c = jnp.asarray(starts, jnp.int32).reshape(n_chunks, chunk)
        offs_c = jnp.asarray(offs, jnp.int32).reshape(n_chunks, chunk)
        out_shape = (n_frames, height * scale, width * scale, 3)

        def one_strip(s, o):
            wnd = jax.lax.dynamic_slice(
                x, (0, s, 0, 0), (n_frames, win, width, 3))
            out = apply_fn(params, wnd)
            return jax.lax.dynamic_slice(
                out, (0, o * scale, 0, 0),
                (n_frames, sh * scale, width * scale, 3))

        def body(carry, idx):
            s_vec, o_vec, row = idx
            # (chunk, n_frames, sh*scale, W*scale, 3) owned slabs; strips
            # in a chunk are consecutive, so their owned rows concatenate
            # into one contiguous slab written with a single update.
            if chunk == 1:
                owned = one_strip(s_vec[0], o_vec[0])[None]
            else:
                wnds = jax.vmap(lambda s: jax.lax.dynamic_slice(
                    x, (0, s, 0, 0), (n_frames, win, width, 3)))(s_vec)
                outs = apply_fn(params, wnds.reshape(
                    chunk * n_frames, win, width, 3)).reshape(
                    chunk, n_frames, win * scale, width * scale, 3)
                owned = jax.vmap(lambda out, o: jax.lax.dynamic_slice(
                    out, (0, o * scale, 0, 0),
                    (n_frames, sh * scale, width * scale, 3)))(outs, o_vec)
            slab = jnp.moveaxis(owned, 0, 1).reshape(
                n_frames, chunk * sh * scale, width * scale, 3)
            carry = jax.lax.dynamic_update_slice(
                carry, slab.astype(carry.dtype), (0, row, 0, 0))
            return carry, None

        rows = jnp.arange(n_chunks, dtype=jnp.int32) * (chunk * sh * scale)
        probe = jax.eval_shape(lambda: one_strip(0, 0))
        init = jnp.zeros(out_shape, probe.dtype)
        out, _ = jax.lax.scan(init=init, xs=(starts_c, offs_c, rows), f=body)
        return out

    return forward


# ---------------------------------------------------------------------------
# Device-resident 2-D tile scan (single chip)
# ---------------------------------------------------------------------------

def make_tile_scan_forward(
    apply_fn: Callable,
    scale: int,
    tile_h: int,
    tile_w: int,
    halo: int,
    height: int,
    width: int,
) -> Callable:
    """Full-frame SR as a `lax.scan` over TILE-ROWS of patch-shaped
    halo windows, frame resident in HBM.

    Why a third engine: the full-frame forward's convs run near patch
    rate, but ~65% of its device time is UNFUSED elementwise/layout
    passes — XLA materializes the packed trunk's mask-multiply /
    residual-add / relu epilogues (ops/packed/core.py) as standalone
    ~200 MB memory passes at monolithic 1080p shapes, while at the
    batched-patch serving shapes (16x192²) the same ops fuse into the
    conv to 95% conv-fusion occupancy (trace anatomy in BASELINE.md
    round-4). Height-only strips kept W monolithic and measured
    NEGATIVE (TILE8K_*.json); 2-D tiles restore the exact shape class
    the fusion evidence comes from.

    Scheme: the (N, H, W, 3) frame is cut into a (H/tile_h, W/tile_w)
    grid. Each tile's window is extended by `halo` on every side and
    SHIFTED to stay inside the frame (parallel/halo.py's edge-window
    scheme on both axes: outer windows put SAME padding on the TRUE
    frame boundary). One scan step processes one tile-row — the row's
    windows stacked on the batch axis through `apply_fn` — and writes
    the row's owned pixels as one contiguous slab into the carried
    output buffer. Column geometry is static per step; only the row
    start rides the scan xs.

    Exactness: identical-taps to the full-frame forward when `halo >=
    the model's receptive radius` (every owned pixel is >= halo real
    pixels from any non-true window edge; same argument as
    parallel/halo.py / make_strip_batched_forward — bf16 deltas at the
    1e-2 pixel level remain from shape-dependent conv tiling). Smaller
    halos are the standard tiled-SR seam approximation (the class the
    reference's own chop_forward, utils/image_utils.py:7-27, accepts);
    tools/tile8k_bench.py measures the dB on a trained checkpoint.

    Constraints: tile_h | height, tile_w | width, and window sides must
    not exceed the frame. Packed trunks need an even window width:
    keep tile_w and halo even.
    """
    import jax
    import jax.numpy as jnp

    if height % tile_h:
        raise ValueError("height %d not divisible by tile_h %d" % (height, tile_h))
    if width % tile_w:
        raise ValueError("width %d not divisible by tile_w %d" % (width, tile_w))
    gh, gw = height // tile_h, width // tile_w
    # clamp windows to the frame: a clamped window only GAINS context
    # (its non-owned side reaches the true frame edge), so exactness is
    # preserved — and the gh==1 / gw==1 degenerate grids just work
    wh, ww = min(tile_h + 2 * halo, height), min(tile_w + 2 * halo, width)
    # edge-shifted window starts + owned offset inside each window
    rstarts = [min(max(i * tile_h - halo, 0), height - wh) for i in range(gh)]
    roffs = [i * tile_h - rstarts[i] for i in range(gh)]
    cstarts = [min(max(j * tile_w - halo, 0), width - ww) for j in range(gw)]
    coffs = [j * tile_w - cstarts[j] for j in range(gw)]  # static per column

    def forward(params, x):
        n_frames = x.shape[0]
        if x.shape[1] != height or x.shape[2] != width:
            raise ValueError("frame shape %s does not match the traced "
                             "(%d, %d) geometry" % (x.shape[1:3], height, width))
        out_shape = (n_frames, height * scale, width * scale, 3)

        def body(carry, idx):
            rs, ro, orow = idx  # row window start, owned offset, out row
            # (gw*n, wh, ww, 3) batch: the row's windows; column starts
            # are STATIC python ints, only rs is traced
            wnds = jnp.concatenate([
                jax.lax.dynamic_slice(x, (0, rs, 0, 0), (n_frames, wh, width, 3))
                [:, :, cs:cs + ww, :]
                for cs in cstarts], axis=0)
            outs = apply_fn(params, wnds)
            # owned pixels: rows via the traced ro, cols static per tile
            owned = jax.lax.dynamic_slice(
                outs, (0, ro * scale, 0, 0),
                (gw * n_frames, tile_h * scale, ww * scale, 3))
            slab = jnp.concatenate([
                owned[j * n_frames:(j + 1) * n_frames,
                      :, co * scale:(co + tile_w) * scale, :]
                for j, co in enumerate(coffs)], axis=2)
            carry = jax.lax.dynamic_update_slice(
                carry, slab.astype(carry.dtype), (0, orow, 0, 0))
            return carry, None

        xs = (jnp.asarray(rstarts, jnp.int32),
              jnp.asarray(roffs, jnp.int32),
              jnp.arange(gh, dtype=jnp.int32) * (tile_h * scale))
        probe = jax.eval_shape(
            lambda: apply_fn(params, jnp.zeros((1, wh, ww, 3), x.dtype)))
        init = jnp.zeros(out_shape, probe.dtype)
        out, _ = jax.lax.scan(init=init, xs=xs, f=body)
        return out

    return forward


# ---------------------------------------------------------------------------
# Reference-parity chop forward (2x2 + overlap)
# ---------------------------------------------------------------------------

def split_image_2x2(image_chw: np.ndarray, overlap_size: int) -> List[np.ndarray]:
    """2x2 overlapping quadrants (reference utils/image_utils.py:30-45)."""
    _, height, width = image_chw.shape
    sh, sw = height // 2, width // 2
    ho = overlap_size // 2
    return [
        image_chw[:, : sh + ho, : sw + ho].copy(),
        image_chw[:, : sh + ho, sw - ho :].copy(),
        image_chw[:, sh - ho :, : sw + ho].copy(),
        image_chw[:, sh - ho :, sw - ho :].copy(),
    ]


def combine_images_2x2(
    outputs: Sequence[np.ndarray], input_image_chw: np.ndarray, scale: int, overlap_size: int
) -> np.ndarray:
    """Paste trimmed quadrants (reference utils/image_utils.py:47-65)."""
    _, height, width = input_image_chw.shape
    sh, sw = (height // 2) * scale, (width // 2) * scale
    nh, nw = height * scale, width * scale
    ho = (overlap_size // 2) * scale
    out = np.zeros((3, nh, nw), dtype=outputs[0].dtype)
    out[:, :sh, :sw] = outputs[0][:, :sh, :sw]
    out[:, :sh, sw:] = outputs[1][:, :sh, ho:]
    out[:, sh:, :sw] = outputs[2][:, ho:, :sw]
    out[:, sh:, sw:] = outputs[3][:, ho:, ho:]
    return out


def upscale_with_chop_forward(model, input_image: np.ndarray, scale: int, overlap_size: int) -> np.ndarray:
    """Reference-parity chop-forward (utils/image_utils.py:7-27)."""
    splits = split_image_2x2(input_image, overlap_size)
    outputs = [model.upscale(input_list=[s], scale=scale)[0] for s in splits]
    return combine_images_2x2(outputs, input_image, scale, overlap_size)


# ---------------------------------------------------------------------------
# TPU-native batched tiling
# ---------------------------------------------------------------------------

def _tile_starts(extent: int, tile: int, stride: int) -> List[int]:
    """Clamped tile starts covering [0, extent) with tiles fully inside."""
    if extent <= tile:
        return [0]
    n = math.ceil((extent - tile) / stride) + 1
    return [min(i * stride, extent - tile) for i in range(n)]


def _owned_ranges(starts: List[int], tile: int, extent: int) -> List[Tuple[int, int, int, int]]:
    """(out_start, out_end, tile_off_start) ownership per tile: overlap is
    split at the midpoint between neighboring tile starts."""
    ranges = []
    for i, s in enumerate(starts):
        lo = 0 if i == 0 else (starts[i - 1] + tile + s) // 2
        hi = extent if i == len(starts) - 1 else (s + tile + starts[i + 1]) // 2
        ranges.append((lo, hi, lo - s, hi - s))
    return ranges


class TiledUpscaler:
    """Batched overlapping-tile SR over a jitted NHWC forward function."""

    def __init__(
        self,
        forward_nhwc: Callable[[np.ndarray], np.ndarray],
        scale: int,
        tile_size: int = 128,
        overlap: int = 24,
        max_batch: int = 64,
        min_batch: int = 1,
    ):
        if overlap >= tile_size:
            raise ValueError("overlap must be smaller than tile_size")
        self.forward = forward_nhwc
        self.scale = scale
        self.tile = tile_size
        self.stride = tile_size - overlap
        self.max_batch = max_batch
        # min_batch: round every bucketed tile batch up to a multiple of
        # this (zero-padded) — lets a data-parallel eval mesh divide the
        # batch evenly (parallel/mesh.use_data_parallel_eval)
        self.min_batch = min_batch

    def upscale_hwc(self, image_hwc: np.ndarray) -> np.ndarray:
        """SR one HWC image of arbitrary size; returns HWC float32."""
        h, w, c = image_hwc.shape
        t, s = self.tile, self.scale
        if h < t or w < t:
            # Small image: single full-frame call (shape-specific compile),
            # padded to min_batch so a dp-eval mesh still divides it.
            x = np.asarray(image_hwc, np.float32)[None]
            if self.min_batch > 1:
                x = np.concatenate(
                    [x, np.zeros((self.min_batch - 1,) + x.shape[1:], np.float32)])
            out = self.forward(x)
            return np.asarray(out[0])

        ys = _tile_starts(h, t, self.stride)
        xs = _tile_starts(w, t, self.stride)
        tiles = np.empty((len(ys) * len(xs), t, t, c), np.float32)
        k = 0
        for y in ys:
            for x in xs:
                tiles[k] = image_hwc[y : y + t, x : x + t]
                k += 1

        outs = []
        for i in range(0, len(tiles), self.max_batch):
            chunk = tiles[i : i + self.max_batch]
            # Pad to a power-of-two bucket so the number of distinct
            # compiled batch shapes is O(log max_batch), not O(#images).
            bucket = min(self.max_batch, 1 << max(0, (len(chunk) - 1).bit_length()))
            if bucket % self.min_batch:
                bucket = -(-bucket // self.min_batch) * self.min_batch
            if len(chunk) < bucket:
                pad = np.zeros((bucket - len(chunk), t, t, c), np.float32)
                out = np.asarray(self.forward(np.concatenate([chunk, pad])))[: len(chunk)]
            else:
                out = np.asarray(self.forward(chunk))
            outs.append(out)
        out_tiles = np.concatenate(outs)

        result = np.empty((h * s, w * s, c), np.float32)
        yr = _owned_ranges(ys, t, h)
        xr = _owned_ranges(xs, t, w)
        k = 0
        for (oy0, oy1, ty0, ty1) in yr:
            for (ox0, ox1, tx0, tx1) in xr:
                result[oy0 * s : oy1 * s, ox0 * s : ox1 * s] = out_tiles[k][
                    ty0 * s : ty1 * s, tx0 * s : tx1 * s
                ]
                k += 1
        return result

    def upscale_chw(self, image_chw: np.ndarray) -> np.ndarray:
        out = self.upscale_hwc(np.asarray(image_chw, np.float32).transpose(1, 2, 0))
        return out.transpose(2, 0, 1)
