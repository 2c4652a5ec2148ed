"""Fused H-Winograd x W-packed ResBlock — the Pallas attack on the
1.33x packing floor (VERDICT r2 #2).

The floor analysis (BASELINE.md "why the 1.33x is a real floor") binds
any DIRECT MXU mapping of the 3x3 conv: N=128 output tiling forces
pairing two adjacent pixels whose union support is 12 taps for 9 used.
The escape is not a denser direct mapping but fewer true multiplies,
WITHOUT giving up the full-width MXU tiles the packing bought:

  * 1-D Winograd F(2,3) along H factors the packed kernel's kh=3 axis
    into 4 basis taps for 2 output rows (transforms are add-only VPU
    work);
  * the W axis stays WIDTH-PACKED: each basis tap is a kw=2 conv at
    2C=128 channels — full 128-wide MXU tiles, unlike 2-D Winograd
    whose C=64 point-matmuls pad half the tile.

MXU-slot accounting per output pixel (C=64):
    direct packed trunk:        9 taps * 4/3 zeros        = 12 C^2
    2-D Winograd F(2x2,3x3):    16 matmuls / 4 px, N=64   = 16 C^2 eff.
    H-Winograd x packed here:   4 basis * 2 w * 4C^2 / 4  =  8 C^2
so the kernel's compute ceiling is 12/8 = 1.5x over the measured-
at-97%-of-peak packed trunk. (The 4/3 structural zeros survive the
H-transform — they sit in fixed (e,d) blocks across kh — but Winograd
cuts total slots on top of them.)

Why Pallas and not plain XLA: the V/M basis tensors are 2x the
activation size in f32; materialized in HBM they cost ~10 activation
round-trips per conv vs direct's 2, turning a 1.5x compute win into a
~3x bandwidth LOSS (the measured packed conv is compute-bound with only
~1.7x headroom over its own HBM traffic). This kernel keeps the whole
ResBlock pair — B^T transforms, 16 point matmuls, A^T inverses, bias,
ReLU, grid1 overhang mask, residual add — in one VMEM-resident tile
pass: HBM traffic is read h0 + write out, 1 activation unit per conv,
compute-bound by construction.

Mosaic notes (CLAUDE.md + ops/pallas_conv.py precedent):
  * overlapping H-windows (halo 3 per tile) are fed as TWO row-shifted
    aliases of the padded input, tiled disjointly — manual HBM slicing
    of <128-lane channels trips the alignment rule;
  * the lane dim is the packed 2C (=128 for EDSR): aligned by design;
  * even/odd row splits are sublane reshapes, not strided slices.

Exactness: same taps as the direct packed pair up to float summation
order (transforms are exact +/- in f32; F(2,3) G entries are {0, 1/2,
1}, exactly representable). Tests pin f32 agreement to the direct
packed ResBlock at tight tolerance.

MEASURED OUTCOME (v5e, WINO_BENCH.json / WINO_DIAG.json): a NEGATIVE
RESULT — 7-9x slower end-to-end than the packed trunk. The compute
ceiling above is real but unrealizable in this structure: the halo
aliases cost 1.5x the packed path's HBM traffic, Mosaic runs the
looped point matmuls at ~half XLA's fused-conv rate (the skeleton
variant with matmuls alone already matches the WHOLE packed block),
and the f32 VPU transforms + sublane relayouts dominate the real
kernels. Full attribution table and the perfect-kernel bound that
closes the case: BASELINE.md round-3 section. Kept as the opt-in
negative-result record behind --wino_trunk.

Reference trunk being accelerated: models/edsr.py:195-207 (ResBlock
conv-relu-conv + skip), the same walk ops/packed/edsr.py runs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# F(2,3) 1-D Winograd (points {0, 1, -1, inf}): y = A^T [ (G k) * (B^T d) ]
_G4 = np.array([[1.0, 0.0, 0.0],
                [0.5, 0.5, 0.5],
                [0.5, -0.5, 0.5],
                [0.0, 0.0, 1.0]], np.float32)

# F(4,3) 1-D Winograd (points {0, +-1, +-2, inf}; Lavin construction,
# verified exact against direct correlation to 4e-16). B^T/A^T entries
# are small integers (VPU-exact adds/shifts); G's fractions touch only
# the f32 weight transform outside the kernel.
_G6 = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1]], np.float32)
_BT6 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1]], np.float32)
_AT46 = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1]], np.float32)


def h_transform_kernel(kp: jnp.ndarray) -> jnp.ndarray:
    """Packed kernel (3, 2, 2C, 2C) -> H-Winograd basis (4, 2, 2C, 2C):
    u[p, w] = sum_kh G4[p, kh] * kp[kh, w]. Float32."""
    return jnp.einsum("pk,kwij->pwij", jnp.asarray(_G4),
                      kp.astype(jnp.float32))


def h4_transform_kernel(kp: jnp.ndarray) -> jnp.ndarray:
    """Packed kernel (3, 2, 2C, 2C) -> F(4,3) basis (6, 2, 2C, 2C)."""
    return jnp.einsum("pk,kwij->pwij", jnp.asarray(_G6),
                      kp.astype(jnp.float32))


def _bt(d0, d1, d2, d3):
    return d0 - d2, d1 + d2, d2 - d1, d1 - d3


def _at(m0, m1, m2):
    # y0 = m0 + m1 + m2 ; y1 = m1 - m2 - m3 (m3 passed by caller)
    return m0 + m1 + m2


def _stage(xe, xo, u, bias, w_out, acc_dtype=jnp.float32):
    """One H-Winograd packed conv on even/odd row splits.

    xe, xo: (P+1, Win, 2C) even/odd rows of the (2P+2)-row input window;
    pair p consumes rows (xe[p], xo[p], xe[p+1], xo[p+1]).
    u: (4, 2, 2C, 2C) basis kernels — the point matmuls contract in
    u.dtype (bf16 at serving keeps the fast MXU path, f32 in tests) and
    accumulate f32. w_out: output width (Win-1 for the kw=2 conv).
    Returns (t_even, t_odd): (P, w_out, 2C) f32 each.
    """
    p1, w_in, c2 = xe.shape
    p = p1 - 1
    mm = u.dtype
    v = _bt(xe[:-1], xo[:-1], xe[1:], xo[1:])  # 4 x (P, Win, 2C)
    ms = []
    for b in range(4):
        acc = None
        for e in (0, 1):
            lhs = v[b][:, e:e + w_out, :].reshape(p * w_out, c2).astype(mm)
            term = jnp.dot(lhs, u[b, e], preferred_element_type=acc_dtype)
            acc = term if acc is None else acc + term
        ms.append(acc.reshape(p, w_out, c2))
    t_even = ms[0] + ms[1] + ms[2]
    t_odd = ms[1] - ms[2] - ms[3]
    if bias is not None:
        t_even = t_even + bias
        t_odd = t_odd + bias
    return t_even, t_odd


def _resblock_kernel(a0_ref, a6_ref, ua_ref, ub_ref, ba_ref, bb_ref,
                     mask_ref, out_ref, *, tile_rows, w2, c2, res_weight,
                     h_real):
    """One (batch, row-tile) grid step of the fused pair.

    a0/a6: row-shifted aliases of the H-padded input; their union is the
    (tile_rows + 6)-row window [r0-3, r0+TR+3). All math f32 in VMEM.
    """
    from jax.experimental import pallas as pl

    tr = tile_rows
    xw = jnp.concatenate([a0_ref[0], a6_ref[0][tr - 6:]], axis=0)
    xw = xw.astype(jnp.float32)                      # (TR+6, W2, 2C)

    # conv_a: grid0 -> grid1, W-pad (1, 1)
    xa = jnp.pad(xw, ((0, 0), (1, 1), (0, 0)))       # (TR+6, W2+2, 2C)
    half = (tr + 6) // 2
    xa = xa.reshape(half, 2, w2 + 2, c2)
    xe, xo = xa[:, 0], xa[:, 1]                      # (TR/2+3, W2+2, 2C)
    # t pairs cover rows [r0-2, r0+TR+2): P = TR/2 + 2
    t_even, t_odd = _stage(xe, xo, ua_ref[...], ba_ref[...], w2 + 1)

    # epilogue: ReLU + grid1 overhang mask (zero cols -1 / W as next pad)
    mask = mask_ref[...]                             # (W2+1, 2C)
    t_even = jnp.maximum(t_even, 0.0) * mask
    t_odd = jnp.maximum(t_odd, 0.0) * mask

    # H-boundary: conv_b's SAME padding means t rows outside the real
    # image must be ZERO — conv_a applied to padded x would leave
    # relu(bias) there instead. Mask by global t-row index.
    r0 = pl.program_id(1) * tr
    pidx = jax.lax.broadcasted_iota(jnp.int32, (half - 1, 1, 1), 0)
    ge = r0 - 2 + 2 * pidx                            # global even-t rows
    t_even = t_even * ((ge >= 0) & (ge < h_real)).astype(jnp.float32)
    t_odd = t_odd * ((ge + 1 >= 0) & (ge + 1 < h_real)).astype(jnp.float32)

    # conv_b: grid1 -> grid0, W-pad (0, 0); out pair q needs t-local rows
    # [2q+1, 2q+4] -> d = (t_odd[q], t_even[q+1], t_odd[q+1], t_even[q+2])
    y_even, y_odd = _stage(t_odd[:-1], t_even[1:], ub_ref[...], bb_ref[...],
                           w2)
    # _stage pairs (xe[p], xo[p], xe[p+1], xo[p+1]); with xe := t_odd[:-1]
    # and xo := t_even[1:], pair q reads (t_odd[q], t_even[q+1],
    # t_odd[q+1], t_even[q+2]) — exactly the window above.

    y = jnp.stack([y_even, y_odd], axis=1).reshape(tr, w2, c2)
    if res_weight != 1.0:
        y = y * jnp.float32(res_weight)
    out_ref[...] = (xw[3:3 + tr] + y)[None].astype(out_ref.dtype)


def wino_packed_resblock(h0, ka, ba, kb, bb, mask1, res_weight=1.0,
                         tile_rows=8, interpret=False):
    """Fused H-Winograd ResBlock on a grid0-packed tensor.

    h0: (N, H, W2, 2C); ka/kb: packed (3, 2, 2C, 2C) kernels
    (pack_kernel_a/b); ba/bb: packed (2C,) biases; mask1: (1, 1, W2+1,
    2C) grid1 overhang mask (grid1_mask). Exactly the computation of
    ops/packed/core.packed_resblock (act=relu) up to float summation
    order. Even W2*2 widths only (callers fall back); any H.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w2, c2 = h0.shape
    tr = tile_rows
    grid_h = -(-h // tr)
    rows = grid_h * tr

    # point-matmul dtype follows the activation dtype: bf16 serving uses
    # the fast MXU path (f32 would halve MXU rate), f32 tests stay tight
    mm = h0.dtype if h0.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    ua = h_transform_kernel(ka).astype(mm)
    ub = h_transform_kernel(kb).astype(mm)
    ba = jnp.asarray(ba, jnp.float32)
    bb = jnp.asarray(bb, jnp.float32)
    mask = jnp.asarray(mask1, jnp.float32).reshape(w2 + 1, c2)

    # H halo 3 each side + bottom alignment; two shifted aliases whose
    # blocks union to the (TR+6)-row window (ops/pallas_conv.py trick)
    xp = jnp.pad(h0, ((0, 0), (3, 3 + rows - h), (0, 0), (0, 0)))
    a0 = jax.lax.slice_in_dim(xp, 0, rows, axis=1)
    a6 = jax.lax.slice_in_dim(xp, 6, 6 + rows, axis=1)

    x_spec = pl.BlockSpec((1, tr, w2, c2), lambda ni, hi: (ni, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    full = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    kern = functools.partial(_resblock_kernel, tile_rows=tr, w2=w2, c2=c2,
                             res_weight=float(res_weight), h_real=h)
    out = pl.pallas_call(
        kern,
        grid=(n, grid_h),
        in_specs=[x_spec, x_spec, full(), full(), full(), full(), full()],
        out_specs=pl.BlockSpec((1, tr, w2, c2), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows, w2, c2), h0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * rows * w2 * 2 * (4 * 2 * c2 * c2) // 2,
            bytes_accessed=2 * n * rows * w2 * c2 * h0.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a0, a6, ua, ub, ba, bb, mask)
    return out[:, :h] if rows != h else out


def _lincomb(coeffs, terms):
    """Integer-coefficient linear combination, skipping zeros (VPU adds)."""
    acc = None
    for c, t in zip(coeffs, terms):
        if c == 0:
            continue
        term = t if c == 1 else (-t if c == -1 else t * np.float32(c))
        acc = term if acc is None else acc + term
    return acc


def _stage4(d, u, bias, w_out):
    """One F(4,3) H-Winograd packed conv.

    d: 6 tensors (P, Win, 2C) — per group p, input rows start-1..start+4;
    u: (6, 2, 2C, 2C). Returns 4 per-group output-row tensors
    (P, w_out, 2C) f32."""
    p, w_in, c2 = d[0].shape
    mm = u.dtype
    v = [_lincomb(_BT6[b], d) for b in range(6)]
    ms = []
    for b in range(6):
        acc = None
        for e in (0, 1):
            lhs = v[b][:, e:e + w_out, :].reshape(p * w_out, c2).astype(mm)
            term = jnp.dot(lhs, u[b, e], preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        ms.append(acc.reshape(p, w_out, c2))
    ys = [_lincomb(_AT46[j], ms) for j in range(4)]
    if bias is not None:
        ys = [y + bias for y in ys]
    return ys


def _resblock4_kernel(a0_ref, a16_ref, ua_ref, ub_ref, ba_ref, bb_ref,
                      mask_ref, out_ref, *, tile_rows, w2, c2, res_weight,
                      h_real):
    """F(4,3) variant: window [r0-8, r0+TR+8), groups of 4 rows.

    Stage A produces t groups covering [r0-4, r0+TR+4); stage B consumes
    them for out rows [r0, r0+TR). Group p's 6-row input window starts
    at group p row 3 (split[p][3], split[p+1][0..3], split[p+2][0])."""
    from jax.experimental import pallas as pl

    tr = tile_rows
    xw = jnp.concatenate([a0_ref[0], a16_ref[0][tr - 16:]], axis=0)
    xw = xw.astype(jnp.float32)                       # (TR+16, W2, 2C)

    xa = jnp.pad(xw, ((0, 0), (1, 1), (0, 0)))        # W-pad (1,1)
    g1 = (tr + 16) // 4
    sp = xa.reshape(g1, 4, w2 + 2, c2)
    d = [sp[:-2, 3], sp[1:-1, 0], sp[1:-1, 1], sp[1:-1, 2], sp[1:-1, 3],
         sp[2:, 0]]
    ts = _stage4(d, ua_ref[...], ba_ref[...], w2 + 1)  # 4 x (G_t, W2+1, 2C)

    mask = mask_ref[...]                               # (W2+1, 2C)
    r0 = pl.program_id(1) * tr
    gt = g1 - 2
    pidx = jax.lax.broadcasted_iota(jnp.int32, (gt, 1, 1), 0)
    out_ts = []
    for j in range(4):
        t = jnp.maximum(ts[j], 0.0) * mask
        ge = r0 - 4 + 4 * pidx + j                     # global t row
        out_ts.append(t * ((ge >= 0) & (ge < h_real)).astype(jnp.float32))
    # regroup t rows for stage B: group q needs t-local rows 4q+3..4q+8
    tspl = out_ts                                      # tspl[j][p] = t row 4p+j
    db = [tspl[3][:-2], tspl[0][1:-1], tspl[1][1:-1], tspl[2][1:-1],
          tspl[3][1:-1], tspl[0][2:]]
    ys = _stage4(db, ub_ref[...], bb_ref[...], w2)     # 4 x (TR/4, W2, 2C)

    y = jnp.stack(ys, axis=1).reshape(tr, w2, c2)
    if res_weight != 1.0:
        y = y * jnp.float32(res_weight)
    out_ref[...] = (xw[8:8 + tr] + y)[None].astype(out_ref.dtype)


def wino4_packed_resblock(h0, ka, ba, kb, bb, mask1, res_weight=1.0,
                          tile_rows=16, interpret=False):
    """F(4,3) fused H-Winograd ResBlock: 6 C^2 MXU slots/pixel — a 2.0x
    compute ceiling over the direct packed trunk's 12. Same contract as
    wino_packed_resblock; tile_rows must be a multiple of 4 and >= 16
    (the alias-union construction needs TR >= 2*halo = 16)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w2, c2 = h0.shape
    tr = tile_rows
    if tr % 4 or tr < 16:
        raise ValueError("tile_rows must be a multiple of 4 and >= 16")
    grid_h = -(-h // tr)
    rows = grid_h * tr

    mm = h0.dtype if h0.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    ua = h4_transform_kernel(ka).astype(mm)
    ub = h4_transform_kernel(kb).astype(mm)
    ba = jnp.asarray(ba, jnp.float32)
    bb = jnp.asarray(bb, jnp.float32)
    mask = jnp.asarray(mask1, jnp.float32).reshape(w2 + 1, c2)

    xp = jnp.pad(h0, ((0, 0), (8, 8 + rows - h), (0, 0), (0, 0)))
    a0 = jax.lax.slice_in_dim(xp, 0, rows, axis=1)
    a16 = jax.lax.slice_in_dim(xp, 16, 16 + rows, axis=1)

    x_spec = pl.BlockSpec((1, tr, w2, c2), lambda ni, hi: (ni, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    full = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    kern = functools.partial(_resblock4_kernel, tile_rows=tr, w2=w2, c2=c2,
                             res_weight=float(res_weight), h_real=h)
    out = pl.pallas_call(
        kern,
        grid=(n, grid_h),
        in_specs=[x_spec, x_spec, full(), full(), full(), full(), full()],
        out_specs=pl.BlockSpec((1, tr, w2, c2), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows, w2, c2), h0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * rows * w2 * 2 * 6 * c2 * c2 // 4,
            bytes_accessed=2 * n * rows * w2 * c2 * h0.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a0, a16, ua, ub, ba, bb, mask)
    return out[:, :h] if rows != h else out


def wino_pallas_pair(dtype, tile_rows=8, interpret=False, m=2):
    """exact_pair-compatible runner (ops/packed/pairs.py call shape) whose
    'res'-kind ReLU pairs run the fused Pallas kernel. Inference only
    (no custom VJP); other kinds/acts and odd widths raise so routing
    falls back to the XLA packed path."""
    from larvanet_tpu.ops.packed.core import (
        pack_bias, pack_kernel_a, pack_kernel_b)

    block = wino_packed_resblock if m == 2 else wino4_packed_resblock

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        if kind != "res" or act is not jax.nn.relu or mask0 is not None:
            raise ValueError("wino_pallas_pair supports even-width ReLU "
                             "ResBlock pairs only")
        return block(
            hin,
            pack_kernel_a(jnp.asarray(p1["kernel"], jnp.float32)),
            pack_bias(jnp.asarray(p1["bias"], jnp.float32)),
            pack_kernel_b(jnp.asarray(p2["kernel"], jnp.float32)),
            pack_bias(jnp.asarray(p2["bias"], jnp.float32)),
            mask1, res_weight=res_weight, tile_rows=tile_rows,
            interpret=interpret,
        ).astype(dtype)

    return pair


def wino_pallas_pair_with_fallback(dtype, tile_rows=None, interpret=False,
                                   m=2):
    """Mixed pair runner: 'res'-kind ReLU pairs at a 128-multiple packed
    width run the fused Winograd kernel; everything else (leg kinds,
    other activations, odd-width mask0, 96-lane LarvaNet-48 trunks that
    Mosaic's 128-lane tiling cannot block) falls back to exact_pair.
    Lets family walks with heterogeneous pair kinds (LarvaNet legs,
    REGO 'both') adopt the kernel where it applies."""
    from larvanet_tpu.ops.packed.pairs import exact_pair

    if tile_rows is None:
        tile_rows = 8 if m == 2 else 16
    wino = wino_pallas_pair(dtype, tile_rows=tile_rows, interpret=interpret,
                            m=m)
    exact = exact_pair(dtype)

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        if (kind == "res" and act is jax.nn.relu and mask0 is None
                and hin.shape[-1] % 128 == 0
                and p1["kernel"].shape[-1] == p2["kernel"].shape[-2]
                and p1["kernel"].shape[-2] == p2["kernel"].shape[-1]):
            return wino(idx, hin, p1, p2, mask1, kind=kind, act=act,
                        res_weight=res_weight, mask0=mask0)
        return exact(idx, hin, p1, p2, mask1, kind=kind, act=act,
                     res_weight=res_weight, mask0=mask0)

    return pair


def make_wino_pallas_larvanet_forward(model, dtype=jnp.float32,
                                      tile_rows=None, interpret=False, m=2,
                                      all_exits=False):
    """LarvaNet-family inference forward with Winograd-fused body
    ResBlocks (topology in ops/packed/larvanet._larvanet_walk). The
    64-feature configs (LarvaNet_w64, the TPU-native serving
    recommendation) run every body pair through the kernel (2C=128
    lanes); 48-feature configs fall back per-pair to the exact packed
    path (96 lanes — under Mosaic's 128-lane tiling). Legs/tail always
    run exact. Even input widths only."""
    from larvanet_tpu.ops.packed.larvanet import _larvanet_walk

    walk = _larvanet_walk(model, dtype, all_exits=all_exits)
    pair = wino_pallas_pair_with_fallback(dtype, tile_rows=tile_rows,
                                          interpret=interpret, m=m)

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("wino_trunk requires even width")
        return walk(params, x, pair)

    return forward


def make_wino_pallas_edsr_forward(model, dtype=jnp.float32, tile_rows=None,
                                  interpret=False, m=2):
    """EDSR inference forward: fused Pallas Winograd ResBlocks + the
    standard packed head / after_res_conv / collapsed tail (topology in
    ops/packed/edsr._edsr_walk, mode='baked'). Even input widths only.
    m=2: F(2,3), 1.5x compute ceiling; m=4: F(4,3), 2.0x (slightly
    looser numerics — integer B^T/A^T, fractional G in f32).
    """
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward
    from larvanet_tpu.ops.packed.edsr import _edsr_walk

    if tile_rows is None:
        tile_rows = 8 if m == 2 else 16
    fast_tail = make_collapsed_edsr_forward(model, dtype=dtype).__wrapped_tail__
    walk = _edsr_walk(model, dtype, "baked", fast_tail=fast_tail)
    pair = wino_pallas_pair(dtype, tile_rows=tile_rows, interpret=interpret,
                            m=m)

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("wino_trunk requires even width")
        return walk(params, x, pair)

    forward.__wrapped_tail__ = fast_tail
    return forward
