"""Exact collapse of linear upsample tails into a single conv + shuffle.

EDSR's tail — upsample conv(64->256) -> PixelShuffle(2) -> conv(64->256)
-> PixelShuffle(2) -> final conv(64->3) -> inverse mean-shift
(reference models/edsr.py:195-207) — contains NO nonlinearity, so the
whole chain is one linear, shift-invariant map from trunk features to
the HR image. Device traces show the PixelShuffle transposes around the
256-channel 2x/4x tensors cost ~46% of forward time (BASELINE.md); the
tail also spends 1.53 MFLOPs/LR-px where the composed map needs only
0.15.

This module collapses the chain *numerically*: the composed kernel is
extracted by probing the original tail with per-channel delta images
(64 forwards on a tiny canvas, once), giving an exact
(2R+1, 2R+1, C, 3*s*s) conv whose output pixel-shuffles (torch order)
to the HR image. Biases/mean-shifts are captured as the tail's response
to a zero input — an image-sized field that also reproduces the
reference's border truncation exactly, so the collapsed forward is
bit-equivalent (float tolerance) to the original INCLUDING borders.

Interior exactness follows from linearity + shift invariance; within
`radius` LR px of the border the stages' SAME padding cuts paths whose
endpoint taps are in-bounds, so the border frame is recomputed with the
original tail on thin halo strips (exact — a strip's outer edge IS the
image border). Collapsing linear conv compositions at inference is an
established SR trick (cf. "Collapsible Linear Blocks for Super-Efficient
Super Resolution", arXiv:2103.09404); the device-trace-driven motivation
and the exact border stitching here are specific to this TPU build.

Measured on v5e: EDSR-b x4 forward 12.0 -> 19.4 LR-MP/s (BASELINE.md);
device-time copies drop from 46% to ~23% (the rest is the final 48-ch
shuffle, whose data volume is the output image itself).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle


def make_cpu_probe(tail_fn):
    """Jitted tail probe pinned to the host CPU backend.

    Build-time probes are tiny (<100 GFLOP) but each canvas shape would
    otherwise cost a multi-minute remote TPU compile over this
    environment's AOT tunnel, plus slow D2H readbacks (CLAUDE.md). The
    same jitted callable serves delta and zero probes so their float
    rounding is identical — the zero-ring trim in make_collapsed_tail
    relies on `resp - bias_resp` cancelling exactly.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    jitted = jax.jit(tail_fn)

    def probe(x):
        # ensure_compile_time_eval: builders may run lazily inside a jit
        # trace (e.g. LarvaNet builds its packed graph at the first
        # _compute_loss call); the probes operate on concrete arrays and
        # must evaluate eagerly there, not become traced ops
        with jax.ensure_compile_time_eval():
            if cpu is None:
                return np.asarray(jitted(jnp.asarray(x)))
            with jax.default_device(cpu):
                return np.asarray(jitted(jax.device_put(np.asarray(x), cpu)))

    return probe


def extract_collapsed_kernel(
    tail_fn: Callable[[jnp.ndarray], jnp.ndarray],
    in_channels: int,
    scale: int,
    radius: int,
) -> np.ndarray:
    """Probe a linear tail with delta inputs to obtain the composed kernel.

    tail_fn: (N, H, W, C) LR features -> (N, H*s, W*s, 3) HR image.
    Returns kernel (2R+1, 2R+1, C, 3*s*s) with torch-PixelShuffle output
    channel order (c*s*s + i*s + j), suitable for SAME conv + pixel_shuffle.
    All C deltas probe in ONE batched CPU call (make_cpu_probe).
    """
    k = 2 * radius + 1
    canvas = 4 * radius + 2  # delta centered, responses fully interior
    center = canvas // 2
    probe = make_cpu_probe(tail_fn)
    bias_resp = probe(np.zeros((1, canvas, canvas, in_channels), np.float32))

    deltas = np.zeros((in_channels, canvas, canvas, in_channels), np.float32)
    deltas[np.arange(in_channels), center, center, np.arange(in_channels)] = 1.0
    resps = probe(deltas) - bias_resp  # (C, canvas*s, canvas*s, 3)

    kernel = np.zeros((k, k, in_channels, 3 * scale * scale), np.float32)
    for cin in range(in_channels):
        resp = resps[cin]
        # out[s*(center-U)+i, s*(center-V)+j, c] = K[U, V, cin, (c,i,j)]
        for u in range(-radius, radius + 1):
            for v in range(-radius, radius + 1):
                block = resp[scale * (center - u): scale * (center - u + 1),
                             scale * (center - v): scale * (center - v + 1), :]
                # block[i, j, c] -> channel c*s*s + i*s + j
                kernel[u + radius, v + radius, cin, :] = (
                    block.transpose(2, 0, 1).reshape(-1)
                )
    return kernel


def extract_border_ops(tail_fn, in_channels, scale, r, bias_tile):
    """Probe the exact border behavior of a linear tail as FOUR 1-D convs
    plus dense corner operators (all baked numpy; inference only).

    The collapsed conv is exact only in the interior; the current strip
    stitching recomputes the original tail on 4 thin strips, which costs
    ~12% of the EDSR forward in latency-bound layout ops (device trace,
    BASELINE.md). But the exact LR-domain output on the b=r border rows
    is itself a LINEAR, shift-invariant-along-the-edge map of the
    (b+r)-row input strip — so it collapses into a 1-D conv with the
    strip rows folded into channels (K=(2r+1)·(b+r)·C, MXU-shaped),
    probed the same way as the main kernel. Shift invariance breaks
    within r of the corners; the 2b x 2b corner cells get dense probed
    matrices (one (2b)²C -> b²·3s² matmul per corner).

    Probes run on canvases whose relevant edges ARE true borders, so the
    responses reproduce the original chain's per-stage truncation
    exactly (same argument as the strip halo: a kept output row < b
    depends on input rows <= b-1+r, and the canvas's far-edge truncation
    only reaches outputs within r of that edge).

    Returns a dict of numpy arrays; biases have the interior bias tile
    pre-subtracted (the global post-shuffle tile add restores it, as in
    the strip path).
    """
    b = r
    s = scale
    C = in_channels
    q = 3 * s * s
    Hs = b + r
    Wc = 4 * r + 2
    cc = Wc // 2
    tile_q = np.asarray(bias_tile).transpose(2, 0, 1).reshape(q)  # (c,I,J)

    probe = make_cpu_probe(tail_fn)

    def unshuffle_lr(a):
        # (..., H*s, W*s, 3) -> (..., H, W, q) with q = c*s*s + I*s + J
        # (pure-numpy: builders may run inside an active jit trace)
        a = np.asarray(a)
        lead = a.shape[:-3]
        H, W, c3 = a.shape[-3:]
        a = a.reshape(*lead, H // s, s, W // s, s, c3)
        # -> (..., H/s, W/s, c, i, j); channel index = c*s*s + i*s + j
        a = np.moveaxis(a, (-4, -2), (-2, -1))
        return a.reshape(*lead, H // s, W // s, c3 * s * s)

    # ---- horizontal sides (top & bottom share one probe) ----
    P = Hs * C
    canvas = np.zeros((P, Hs, Wc, C), np.float32)
    idx = np.arange(P)
    canvas[idx, idx // C, cc, idx % C] = 1.0
    bias0 = probe(np.zeros((1, Hs, Wc, C), np.float32))
    resp = probe(canvas) - bias0
    lr = unshuffle_lr(resp)  # (P, Hs, Wc, q)
    win = lr[:, :, cc - r:cc + r + 1, :]          # (P, Hs, 2r+1, q)
    win = win.reshape(Hs, C, Hs, 2 * r + 1, q)     # (u, c, y, w+r, q)
    # runtime conv kernel (kh=Hs, kw=2r+1, C, out): out ch order y-major;
    # t = r - w  =>  flip the w axis
    k_top = win[:, :, :b].transpose(0, 3, 1, 2, 4)[:, ::-1]  # (u, t, c, y, q)
    k_top = np.ascontiguousarray(k_top.reshape(Hs, 2 * r + 1, C, b * q))
    k_bot = win[:, :, r:].transpose(0, 3, 1, 2, 4)[:, ::-1]
    k_bot = np.ascontiguousarray(k_bot.reshape(Hs, 2 * r + 1, C, b * q))
    bias_lr = unshuffle_lr(bias0)[0]               # (Hs, Wc, q)
    bias_top = (bias_lr[:b, cc] - tile_q).reshape(b * q)
    bias_bot = (bias_lr[r:, cc] - tile_q).reshape(b * q)

    # ---- vertical sides (left & right) ----
    canvas = np.zeros((P, Wc, Hs, C), np.float32)
    canvas[idx, cc, idx // C, idx % C] = 1.0
    bias0v = probe(np.zeros((1, Wc, Hs, C), np.float32))
    respv = probe(canvas) - bias0v
    lrv = unshuffle_lr(respv)                      # (P, Wc, Hs, q)
    winv = lrv[:, cc - r:cc + r + 1, :, :]         # (P, 2r+1, Hs, q)
    winv = winv.reshape(Hs, C, 2 * r + 1, Hs, q)   # (v, c, w+r, j, q)
    k_left = winv[:, :, ::-1, :b].transpose(2, 0, 1, 3, 4)  # (t, v, c, j, q)
    k_left = np.ascontiguousarray(k_left.reshape(2 * r + 1, Hs, C, b * q))
    k_right = winv[:, :, ::-1, r:].transpose(2, 0, 1, 3, 4)
    k_right = np.ascontiguousarray(k_right.reshape(2 * r + 1, Hs, C, b * q))
    bias_lrv = unshuffle_lr(bias0v)[0]             # (Wc, Hs, q)
    bias_left = (bias_lrv[cc, :b] - tile_q).reshape(b * q)
    bias_right = (bias_lrv[cc, r:] - tile_q).reshape(b * q)

    # ---- corners: dense operators on (2b)x(2b) patches ----
    n2 = 2 * b
    P3 = n2 * n2 * C
    canvas = np.zeros((P3, n2, n2, C), np.float32)
    idx = np.arange(P3)
    canvas[idx, idx // (n2 * C), (idx // C) % n2, idx % C] = 1.0
    bias0c = probe(np.zeros((1, n2, n2, C), np.float32))
    respc = probe(canvas) - bias0c
    lrc = unshuffle_lr(respc)                      # (P3, n2, n2, q)
    bias_c = unshuffle_lr(bias0c)[0]               # (n2, n2, q)
    rows = {"t": slice(0, b), "b": slice(b, n2)}
    cols = {"l": slice(0, b), "r": slice(b, n2)}
    corner_k = {}
    corner_b = {}
    for rk, rs in rows.items():
        for ck, cs in cols.items():
            cells = lrc[:, rs, cs, :].reshape(P3, b * b * q)
            corner_k[rk + ck] = np.ascontiguousarray(cells)
            corner_b[rk + ck] = (bias_c[rs, cs] - tile_q).reshape(b * b * q)

    return {
        "b": b, "Hs": Hs, "q": q,
        "k_top": k_top, "k_bot": k_bot, "bias_top": bias_top, "bias_bot": bias_bot,
        "k_left": k_left, "k_right": k_right,
        "bias_left": bias_left, "bias_right": bias_right,
        "corner_k": corner_k, "corner_b": corner_b,
    }


def make_collapsed_tail(
    tail_fn: Callable[[jnp.ndarray], jnp.ndarray],
    in_channels: int,
    scale: int,
    radius: int,
):
    """Return fast_tail(h_lr) exactly equal to tail_fn, as one conv + shuffle.

    Biases: in the interior, the tail's response to a zero input is a
    PERIODIC s x s x 3 pattern (shift invariance), added as a broadcast
    that XLA fuses into the shuffle epilogue — an image-sized bias field
    (the first implementation) cost a full extra memory pass (device
    trace, BASELINE.md tail anatomy). The border frame gets its biases
    (and their truncation) from the strip recomputation, which runs the
    original tail.
    """
    kernel_np = extract_collapsed_kernel(tail_fn, in_channels, scale, radius)
    # trim all-zero outer rings (the probe radius is a safe upper bound)
    while kernel_np.shape[0] > 1 and not (
        np.any(kernel_np[0]) or np.any(kernel_np[-1])
        or np.any(kernel_np[:, 0]) or np.any(kernel_np[:, -1])
    ):
        kernel_np = kernel_np[1:-1, 1:-1]
    kernel = jnp.asarray(kernel_np)
    r = kernel_np.shape[0] // 2

    # interior bias tile: central s x s block of the zero response on a
    # canvas large enough that the block is interior
    canvas = 4 * radius + 2
    cc = canvas // 2
    zero = np.zeros((1, canvas, canvas, in_channels), np.float32)
    bias_tile = make_cpu_probe(tail_fn)(zero)[0, cc * scale:(cc + 1) * scale,
                                              cc * scale:(cc + 1) * scale, :]

    # baked path: probed border operators replace the strip recompute
    border = extract_border_ops(tail_fn, in_channels, scale, r, bias_tile)

    def fast_tail(h, packed=False):
        return apply_collapsed_tail(h, kernel, jnp.asarray(bias_tile),
                                    tail_fn, scale, packed=packed,
                                    border=border)

    return fast_tail


def apply_collapsed_tail(h, kernel, bias_tile, tail_fn, scale, packed=False,
                         border=None, lr_domain=False):
    """Collapsed conv for the interior + original tail stitched onto an
    r-wide border frame (r = kernel radius).

    kernel (2r+1, 2r+1, C, 3*s*s) and bias_tile (s, s, 3) may be traced
    values (live weights — see live_collapsed_edsr_tail), in which case
    the whole map is differentiable; with baked constants this is the
    inference fast path (make_collapsed_tail). The main conv runs
    width-packed grid0->grid0 (pack_kernel_same; the plain conv's
    N=3*s*s output underfills the MXU 3x — BASELINE.md tail anatomy).

    packed=True: `h` is already width-packed (grid0, 2C channels at
    half width, even original W) — the main conv consumes it
    directly and the thin border strips unpack only the slices they
    need, avoiding full-tensor relayouts at the 64<->128-channel
    tiling boundary (device trace, BASELINE.md tail anatomy).

    The collapse is exact only where every intermediate tap of the
    original chain is in-bounds; within `r` LR px of the border, the
    original stages' SAME padding cuts paths whose endpoint taps are
    still in-bounds, so those rows/cols are recomputed with the
    original tail on thin halo strips (strip outer edge == true
    border => identical padding; inner halo of `r` isolates it).

    All stitching happens PRE-SHUFFLE in the LR 3s² -channel domain
    (thin in-place row/col updates), followed by ONE pixel shuffle
    with the periodic interior bias fused into its epilogue — the
    first design stitched HR 3-channel tensors and spent more time
    in XLA layout copies than in the conv (device trace,
    BASELINE.md tail anatomy).
    """
    from larvanet_tpu.ops.packed_trunk import (
        conv_same, pack_kernel_same, pack_w, unpack_w)
    from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle

    r = kernel.shape[0] // 2

    if packed:
        h0, hh, ww = h, h.shape[1], h.shape[2] * 2
    else:
        h0, hh, ww = None, h.shape[1], h.shape[2]
    s = scale
    tile = jnp.asarray(bias_tile, h.dtype)  # (s, s, 3)

    b = min(r, hh, ww)  # border band width (LR px)
    if b > 0 and (2 * b >= hh or 2 * b >= ww):
        # image too small for an interior: the original tail is exact
        if packed:
            h = unpack_w(h0)
        out = tail_fn(h).astype(h.dtype)
        return pixel_unshuffle(out, s) if lr_domain else out

    if ww % 2 == 0:
        if h0 is None:
            h0 = pack_w(h)
        kp, kp_pads = pack_kernel_same(kernel.astype(h.dtype))
        out_lr = unpack_w(conv_same(h0, kp, kp_pads))
    else:
        out_lr = jax.lax.conv_general_dilated(
            h, kernel.astype(h.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if b > 0 and border is not None and b == r:
        # probed border operators (extract_border_ops): 4 MXU-shaped 1-D
        # convs + 4 tiny corner matmuls replace the original-tail strip
        # recompute (which cost ~12% of the EDSR forward in latency-bound
        # layout ops — device trace, BASELINE.md)
        q = border["q"]
        hs_ = border["Hs"]
        n = h.shape[0]
        cdt = out_lr.dtype
        n2 = 2 * b
        if packed:
            wb = (hs_ + 1) // 2
            wb2 = (n2 + 1) // 2
            w2 = h0.shape[2]
            top_in, bot_in = unpack_w(h0[:, :hs_]), unpack_w(h0[:, hh - hs_:])
            left_in = unpack_w(h0[:, :, :wb])[:, :, :hs_]
            right_in = unpack_w(h0[:, :, w2 - wb:])[:, :, -hs_:]
            tl_in = unpack_w(h0[:, :n2, :wb2])[:, :, :n2]
            tr_in = unpack_w(h0[:, :n2, w2 - wb2:])[:, :, -n2:]
            bl_in = unpack_w(h0[:, hh - n2:, :wb2])[:, :, :n2]
            br_in = unpack_w(h0[:, hh - n2:, w2 - wb2:])[:, :, -n2:]
        else:
            top_in, bot_in = h[:, :hs_], h[:, hh - hs_:]
            left_in, right_in = h[:, :, :hs_], h[:, :, ww - hs_:]
            tl_in, tr_in = h[:, :n2, :n2], h[:, :n2, ww - n2:]
            bl_in, br_in = h[:, hh - n2:, :n2], h[:, hh - n2:, ww - n2:]

        def side(x_in, k, bias, pad_hw):
            out = jax.lax.conv_general_dilated(
                x_in, jnp.asarray(k, cdt), (1, 1), pad_hw,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + jnp.asarray(bias, cdt)

        top = side(top_in, border["k_top"], border["bias_top"],
                   ((0, 0), (r, r))).reshape(n, ww, b, q).transpose(0, 2, 1, 3)
        bot = side(bot_in, border["k_bot"], border["bias_bot"],
                   ((0, 0), (r, r))).reshape(n, ww, b, q).transpose(0, 2, 1, 3)
        left = side(left_in, border["k_left"], border["bias_left"],
                    ((r, r), (0, 0))).reshape(n, hh, b, q)
        right = side(right_in, border["k_right"], border["bias_right"],
                     ((r, r), (0, 0))).reshape(n, hh, b, q)

        def corner(x_in, key):
            out = x_in.reshape(n, -1) @ jnp.asarray(border["corner_k"][key], cdt)
            return (out + jnp.asarray(border["corner_b"][key], cdt)
                    ).reshape(n, b, b, q)

        tl, tr = corner(tl_in, "tl"), corner(tr_in, "tr")
        bl, br = corner(bl_in, "bl"), corner(br_in, "br")

        row_idx = jnp.arange(hh)[None, :, None, None]
        col_idx = jnp.arange(ww)[None, None, :, None]
        in_band = ((row_idx < b) | (row_idx >= hh - b)
                   | (col_idx < b) | (col_idx >= ww - b))

        def put(block, r0, c0):
            return jnp.pad(block.astype(cdt),
                           ((0, 0), (r0, hh - r0 - block.shape[1]),
                            (c0, ww - c0 - block.shape[2]), (0, 0)))

        frame = (
            put(top[:, :, b:ww - b], 0, b)
            + put(bot[:, :, b:ww - b], hh - b, b)
            + put(left[:, b:hh - b], b, 0)
            + put(right[:, b:hh - b], b, ww - b)
            + put(tl, 0, 0) + put(tr, 0, ww - b)
            + put(bl, hh - b, 0) + put(br, hh - b, ww - b)
        )
        out_lr = jnp.where(in_band, frame, out_lr)
    elif b > 0:
        # halo = r suffices: kept output rows < b need input rows
        # <= b-1+r, and the strip's inner-edge truncation only
        # affects output rows >= strip - r = b
        halo = min(r, hh - b, ww - b)
        strip = b + max(halo, 0)
        bs = b * s
        n = h.shape[0]

        def strip_lr(strip_out, rows=None, cols=None):
            # HR strip -> LR 3s²-channel border block, interior bias
            # removed (it is re-added globally after the shuffle; the
            # subtraction+re-add cancels exactly, so the border keeps
            # the strip's own truncated biases)
            so = strip_out
            if rows is not None:
                so = so[:, rows[0]:rows[1]]
            if cols is not None:
                so = so[:, :, cols[0]:cols[1]]
            nn_, hs_, ws_, c3 = so.shape
            so = (so.reshape(nn_, hs_ // s, s, ws_ // s, s, c3)
                  - tile[None, None, :, None, :, :]).reshape(nn_, hs_, ws_, c3)
            return pixel_unshuffle(so, s)

        if packed:
            # unpack only the thin slices the strips need
            wb = (strip + 1) // 2
            h_t, h_b = unpack_w(h0[:, :strip]), unpack_w(h0[:, hh - strip:])
            h_l = unpack_w(h0[:, :, :wb])[:, :, :strip]
            h_r = unpack_w(h0[:, :, h0.shape[2] - wb:])[:, :, -strip:]
        else:
            h_t, h_b = h[:, :strip], h[:, hh - strip:]
            h_l, h_r = h[:, :, :strip], h[:, :, ww - strip:]
        # opposing strips batched into ONE original-tail call each
        # (its many small layout ops are latency-bound on TPU)
        tb = tail_fn(jnp.concatenate([h_t, h_b], axis=0))
        lr_ = tail_fn(jnp.concatenate([h_l, h_r], axis=0))
        top = strip_lr(tb[:n], rows=(0, bs))
        bot = strip_lr(tb[n:], rows=(tb.shape[1] - bs, tb.shape[1]))
        left = strip_lr(lr_[:n], cols=(0, bs))
        right = strip_lr(lr_[n:], cols=(lr_.shape[2] - bs, lr_.shape[2]))

        # Border replacement as pad+select arithmetic, NOT
        # dynamic-update-slice: thin W-axis DUS at 48 channels
        # measured 1.7 ms of latency-bound masked writes, while
        # pads+selects fuse into the downstream shuffle's read.
        # Regions are disjoint: side strips own the full-height
        # columns (incl. corners), top/bot own the middle columns.
        cdt = out_lr.dtype
        row_idx = jnp.arange(hh)[None, :, None, None]
        col_idx = jnp.arange(ww)[None, None, :, None]
        in_side = (col_idx < b) | (col_idx >= ww - b)
        in_topbot = ((row_idx < b) | (row_idx >= hh - b)) & ~in_side
        frame = (
            jnp.pad(left.astype(cdt), ((0, 0), (0, 0), (0, ww - b), (0, 0)))
            + jnp.pad(right.astype(cdt), ((0, 0), (0, 0), (ww - b, 0), (0, 0)))
            + jnp.pad(top.astype(cdt)[:, :, b:ww - b],
                      ((0, 0), (0, hh - b), (b, b), (0, 0)))
            + jnp.pad(bot.astype(cdt)[:, :, b:ww - b],
                      ((0, 0), (hh - b, 0), (b, b), (0, 0)))
        )
        out_lr = jnp.where(in_side | in_topbot, frame, out_lr)

    if lr_domain:
        # pre-shuffle LR-domain output (3s² channels), ALL biases
        # included: the interior bias tile adds per-LR-channel in torch
        # shuffle order (c = ch*s*s + i*s + j), exactly the post-shuffle
        # per-(i,j) add below — pixel_shuffle is a pure permutation.
        # Callers: make_collapsed_base (zero tile, shares one shuffle)
        # and the LR-domain training loss (mean-L1 is permutation-
        # invariant, so the output shuffle leaves fwd AND bwd entirely;
        # see make_packed_collapsed_edsr_train_forward(lr_domain=True)).
        tile_lr = jnp.transpose(tile, (2, 0, 1)).reshape(1, 1, 1, -1)
        return out_lr + tile_lr
    out = pixel_shuffle(out_lr, s)
    n, hs, ws, c3 = out.shape
    return (out.reshape(n, hs // s, s, ws // s, s, c3)
            + tile[None, None, :, None, :, :]).reshape(n, hs, ws, c3)


def live_collapsed_edsr_tail(sp, scale, dtype=jnp.float32):
    """(kernel, bias_tile, tail_fn) composed from LIVE EDSR tail weights.

    sp: a params state dict holding `upsample/conv{i}` and `final_conv`
    (the chain of reference models/edsr.py:156-173 + :204-206). All
    three returns are traced functions of sp, so the collapsed tail is
    DIFFERENTIABLE — gradients flow to the original upsample/final-conv
    parameters and training through the collapsed map is loss/grad-
    equivalent to the plain chain (tests/test_collapsed_tail.py).

    The composed kernel is obtained by a batched delta probe run inside
    the graph: the response of the bias-less (pure linear) chain to
    per-channel unit deltas IS the composed kernel. With FULL conv
    padding nothing is truncated, so the probe canvas is exactly the
    kernel support — (C, 1, 1, C) identity input, ~0.2 GMAC at EDSR
    size, <1% of a training step. The bias tile is the biased chain's
    zero response at the center of a (2R+1)² canvas (interior by the
    same radius argument as apply_collapsed_tail's border band).
    """
    from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

    f = 2 if scale != 3 else 3
    up = sp["upsample"]
    n_stages = len([k for k in up if k.startswith("conv")])
    C = up["conv0"]["kernel"].shape[2]

    def full_conv(x, w):
        kh = w.shape[0]
        p = kh - 1
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # ---- kernel: delta probe of the bias-less chain, FULL padding ----
    x = jnp.eye(C, dtype=jnp.float32).reshape(C, 1, 1, C)
    start = 0  # true coordinate of probe index 0 (per-stage bookkeeping)
    for i in range(n_stages):
        w = jnp.asarray(up["conv%d" % i]["kernel"], jnp.float32)
        x = full_conv(x, w)
        start -= w.shape[0] // 2
        x = pixel_shuffle(x, f)
        start *= f
    wf = jnp.asarray(sp["final_conv"]["kernel"], jnp.float32)
    x = full_conv(x, wf)
    start -= wf.shape[0] // 2

    s = scale
    T = x.shape[1]
    R = (-start + s - 1) // s  # composed radius in LR px
    pad_l = R * s + start
    pad_r = (2 * R + 1) * s - T - pad_l
    assert pad_l >= 0 and pad_r >= 0, (start, T, R)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (pad_l, pad_r), (0, 0)))
    # padded index q' = (2R - U)*s + I: reshape to (cin, U', I, V', J, c),
    # reorder to (U', V', cin, c, I, J), flip U'/V' (delta response is the
    # spatially flipped kernel)
    k = 2 * R + 1
    kernel = xp.reshape(C, k, s, k, s, 3).transpose(1, 3, 0, 5, 2, 4)
    kernel = jnp.flip(kernel.reshape(k, k, C, 3 * s * s), axis=(0, 1))
    kernel = kernel.astype(dtype)

    # ---- original chain with biases, in the caller's dtype ----
    def tail_fn(h):
        cdt = h.dtype

        def conv(z, w, b):
            return jax.lax.conv_general_dilated(
                z, jnp.asarray(w, cdt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, cdt)

        out = h
        for i in range(n_stages):
            stage = up["conv%d" % i]
            out = conv(out, stage["kernel"], stage["bias"])
            out = pixel_shuffle(out, f)
        out = conv(out, sp["final_conv"]["kernel"], sp["final_conv"]["bias"])
        return out - jnp.asarray(DIV2K_RGB_MEAN, cdt)

    # ---- interior bias tile: zero response at the canvas center ----
    zero = jnp.zeros((1, 2 * R + 1, 2 * R + 1, C), dtype)
    resp = tail_fn(zero)
    bias_tile = resp[0, R * s:(R + 1) * s, R * s:(R + 1) * s, :]

    return kernel, bias_tile, tail_fn


_BASE_CACHE = {}


def make_collapsed_base(scale: int, mode: str = "bicubic"):
    """LR-domain interpolated base: `base_lr(x) -> (N, H, W, 3*s*s)`.

    The reference's `out += F.interpolate(x, scale, mode)` (e.g.
    models/msrr.py:246-247, models/LarvaNet.py:283-285) materializes a
    full HR tensor and adds it in the HR domain — a full HR memory pass
    per exit. But the resampler is a FIXED linear map, so it collapses
    into one tiny (2R+1)² conv producing torch-ordered LR channels plus
    probed border operators that capture the resampler's edge-clamp
    exactly (extract_border_ops: the probe canvas edges ARE clamped
    borders). The LR output adds into any pre-shuffle 3s²-channel tensor
    and shares the caller's single pixel shuffle.

    An earlier HR-domain base fold measured SLOWER (BASELINE.md negative
    result) because its border correction used strip recomputation +
    scatters; the border operators remove exactly that cost.

    The operators depend only on (scale, mode) — no learned parameters —
    so they are probed once per process (cached) and are valid for
    training graphs too (constants w.r.t. autodiff).
    """
    key = (scale, mode)
    if key not in _BASE_CACHE:
        from larvanet_tpu.ops.resize import upsample

        def base_fn(ximg):
            return upsample(ximg.astype(jnp.float32), scale, mode)

        kernel = extract_collapsed_kernel(base_fn, 3, scale, radius=3)
        while kernel.shape[0] > 1 and not (
            np.any(kernel[0]) or np.any(kernel[-1])
            or np.any(kernel[:, 0]) or np.any(kernel[:, -1])
        ):
            kernel = kernel[1:-1, 1:-1]
        r = kernel.shape[0] // 2
        tile = np.zeros((scale, scale, 3), np.float32)  # resampler(0) = 0
        # mode='nearest' collapses to a 1x1 kernel (r=0): the interior
        # conv is exact everywhere (nearest has no edge-clamp divergence)
        # and extract_border_ops would otherwise probe zero-size canvases
        border = extract_border_ops(base_fn, 3, scale, r, tile) if r > 0 else None
        # cache PURE NUMPY: the builder may run inside an active jit
        # trace, where jnp/device arrays would be tracers that escape
        # the trace via the cache (UnexpectedTracerError on reuse)
        _BASE_CACHE[key] = (kernel, tile, base_fn, border)
    kernel, tile, base_fn, border = _BASE_CACHE[key]

    def base_lr(x):
        return apply_collapsed_tail(x, kernel, tile, base_fn, scale,
                                    border=border, lr_domain=True)

    return base_lr


def bicubic_phase_conv_kernel(scale: int, channels: int = 3) -> np.ndarray:
    """Bicubic x`scale` upsampling as a conv kernel + PixelShuffle.

    Bicubic interpolation is a fixed linear, shift-invariant map, so in
    the interior it equals a (2R+1)^2 conv producing channels*scale^2
    torch-ordered channels (c*s*s + i*s + j) followed by pixel_shuffle.
    Borders differ (the resampler edge-clamps, a conv zero-pads); callers
    add a border correction (see make_collapsed_larvanet_forward).
    """
    from larvanet_tpu.ops.resize import bicubic_weights

    w, base = bicubic_weights(scale)  # (s, 4), (s,)
    # tap offsets per phase: base[p] + t - 1 for t in 0..3; union radius:
    radius = int(max(abs(int(base.min()) - 1), abs(int(base.max()) + 2)))
    k = 2 * radius + 1
    kernel = np.zeros((k, k, channels, channels * scale * scale), np.float32)
    for i in range(scale):
        for j in range(scale):
            for ty in range(4):
                for tx in range(4):
                    u = int(base[i]) + ty - 1
                    v = int(base[j]) + tx - 1
                    coeff = float(w[i, ty] * w[j, tx])
                    for c in range(channels):
                        kernel[u + radius, v + radius, c,
                               c * scale * scale + i * scale + j] += coeff
    return kernel


def make_collapsed_larvanet_forward(model, dtype=jnp.float32):
    """LarvaNet forward with the bicubic base folded into a conv. EXACT
    (tests) but MEASURED SLOWER than the module forward on v5e
    (12.0 -> 11.3 MP/s at 16x192², 29.1 -> 20.8 at 1080p): the 3->48
    base conv + LR-space add + border-correction scatters cost more than
    the phase-sliced resampler they replace. Kept as a documented,
    tested negative result (BASELINE.md) — NOT wired into any CLI.

    Mechanics: base = PS4(conv_bicubic(x)) summed with the leg output in
    LR space, one shuffle; the 2-LR-px border frame (where the conv's
    zero padding diverges from the resampler's edge clamp) is corrected
    additively from thin halo strips — the base enters the output
    additively, so no trunk recomputation is needed.
    Plain-body, '2conv'-leg, no-tail configs only (the flagship).
    """
    from flax import serialization

    from larvanet_tpu.models.larvanet import SCALE
    from larvanet_tpu.ops.resize import upsample

    if model.module.body_style != "plain" or model.module.leg_style != "2conv" \
            or model.module.use_tail or model.module.interpolate != "bicubic":
        raise ValueError("collapsed forward supports the flagship LarvaNet config only")

    num_blocks = model.module.num_blocks
    kb = bicubic_phase_conv_kernel(SCALE, 3)
    r = kb.shape[0] // 2  # bicubic radius in LR px (2)
    s = SCALE

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b=None):
            out = jax.lax.conv_general_dilated(
                h, jnp.asarray(w, dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out if b is None else out + jnp.asarray(b, dtype)

        fea = conv(x, sp["head"]["kernel"], sp["head"]["bias"])
        for m in range(len(num_blocks)):
            body = sp["body_%d" % m]
            h = fea
            for bidx in range(num_blocks[m]):
                blk = body["block_%d" % bidx]
                t = conv(h, blk["conv1"]["kernel"], blk["conv1"]["bias"])
                t = jax.nn.relu(t)
                t = conv(t, blk["conv2"]["kernel"], blk["conv2"]["bias"])
                h = h + t
            fea = fea + h

        leg = sp["leg_%d" % (len(num_blocks) - 1)]
        t = conv(fea, leg["recon1"]["kernel"], leg["recon1"]["bias"])
        t = jax.nn.relu(t)
        t = conv(t, leg["recon2"]["kernel"], leg["recon2"]["bias"])

        hh, ww = x.shape[1], x.shape[2]
        b = min(r, hh, ww)
        halo = min(r, hh - b, ww - b)
        if 2 * b >= hh or 2 * b >= ww or halo < r:
            # image too small for disjoint border strips (opposing
            # corrections would overlap and the truncated halo would be
            # wrong): use the exact resampler base directly
            base = upsample(x.astype(jnp.float32), s, "bicubic").astype(dtype)
            return pixel_shuffle(t, s) + base

        base_lr = conv(x, kb)  # bicubic base in LR space (48 channels)
        out = pixel_shuffle(t + base_lr, s)

        # Border correction on thin strips only: the base enters the output
        # additively, so out_exact = out + (base_exact - base_conv), and
        # that difference is nonzero only within r LR px of each border.
        # A strip with r halo rows reproduces the full-image values for
        # both terms (its outer edge IS the image border).
        strip = b + halo
        bs = b * s

        def base_pair(xs):
            exact = upsample(xs.astype(jnp.float32), s, "bicubic").astype(dtype)
            convb = pixel_shuffle(conv(xs, kb), s)
            return exact - convb

        if b > 0:
            top = base_pair(x[:, :strip])[:, :bs]
            bot = base_pair(x[:, hh - strip:])[:, -bs:]
            left = base_pair(x[:, :, :strip])[:, :, :bs]
            right = base_pair(x[:, :, ww - strip:])[:, :, -bs:]
            out = out.at[:, :bs].add(top)
            out = out.at[:, -bs:].add(bot)
            # exclude the corners already corrected by the row frames
            out = out.at[:, bs:-bs, :bs].add(left[:, bs:-bs])
            out = out.at[:, bs:-bs, -bs:].add(right[:, bs:-bs])
        return out

    return forward


def make_collapsed_edsr_forward(model, dtype=jnp.float32):
    """Inference-optimized EDSR forward: trunk unchanged, tail collapsed.

    Returns fn(params, x_nhwc) -> y_nhwc, exactly equal to
    model.module.apply (float tolerance), typically ~1.5-2.5x faster on
    TPU for x4 (tail FLOPs 1.53 -> 0.15 MF/LR-px; no 256-channel
    transposes). Only valid for models whose post-trunk chain is linear
    (EDSR/MAMNet-style upsample + final conv + mean shift).
    """
    from flax import serialization

    scale = model.scale
    p = serialization.to_state_dict(model.params)
    features = p["first_conv"]["kernel"].shape[-1]

    def tail_fn(h):
        # original tail in the CALLER's dtype (f32 during extraction;
        # the border strips at inference run it in the compute dtype —
        # forcing f32 there cost full relayout copies, see BASELINE.md)
        from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

        cdt = h.dtype

        def conv(x, w, b):
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(w, cdt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(b, cdt)

        up = p["upsample"]
        i = 0
        out = h
        while ("conv%d" % i) in up:
            stage = up["conv%d" % i]
            out = conv(out, stage["kernel"], stage["bias"])
            out = pixel_shuffle(out, 2 if scale != 3 else 3)
            i += 1
        out = conv(out, p["final_conv"]["kernel"], p["final_conv"]["bias"])
        return out - jnp.asarray(DIV2K_RGB_MEAN, cdt)

    # tap radius: +1 LR per conv stage in the chain (see module docstring)
    n_stages = len([k for k in p["upsample"] if k.startswith("conv")])
    radius = 1 + n_stages  # final conv contributes <=1 LR, stages 1 each
    fast_tail = make_collapsed_tail(tail_fn, features, scale, radius)

    def forward(params, x):
        sp = serialization.to_state_dict(params)

        def conv(h, w, b):
            return jax.lax.conv_general_dilated(
                h, w.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dtype)

        from larvanet_tpu.models.layers import DIV2K_RGB_MEAN

        h = x + jnp.asarray(DIV2K_RGB_MEAN, dtype)
        h = conv(h, sp["first_conv"]["kernel"], sp["first_conv"]["bias"])
        res = h
        res_weight = float(getattr(model.args, "edsr_res_weight", 1.0))
        i = 0
        while ("res_block_%d" % i) in sp:
            blk = sp["res_block_%d" % i]
            r = conv(res, blk["conv1"]["kernel"], blk["conv1"]["bias"])
            r = jax.nn.relu(r)
            r = conv(r, blk["conv2"]["kernel"], blk["conv2"]["bias"])
            if res_weight != 1.0:
                r = r * res_weight
            res = res + r
            i += 1
        res = conv(res, sp["after_res_conv"]["kernel"], sp["after_res_conv"]["bias"])
        h = h + res
        return fast_tail(h)

    forward.__wrapped_tail__ = fast_tail  # reused by ops/packed_trunk.py
    return forward
