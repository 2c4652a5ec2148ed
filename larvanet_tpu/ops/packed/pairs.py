"""Conv-pair runners: exact / QAT fake-quant / remat-wrapped / int8.

Every family walk calls pair(idx, hin, p1, p2, mask1, kind, act, ...)
per conv pair; these runners decide the arithmetic (see core.py for the
packing itself). Split out of the former ops/packed_trunk.py monolith.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.ops.packed.core import (
    _even_calib, conv_a, conv_b, pack_bias, pack_kernel_a, pack_kernel_b)


def exact_pair(dtype):
    """The float-exact conv-pair runner (same call shape as
    make_pair_runner's pair_bf16/pair_int8; `idx` is unused).

    kind: 'res' (conv-act-conv + skip add), 'none' (no skip),
    'both' (returns (t, hin + t), REGO/ebrn_rm style). mask0 is the
    odd-width grid0 overhang mask (int8 walks never see one — they are
    even-width only by construction).
    """

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        t = conv_a(hin, pack_kernel_a(jnp.asarray(p1["kernel"], dtype)),
                   pack_bias(jnp.asarray(p1["bias"], dtype)))
        t = act(t) * mask1
        t = conv_b(t, pack_kernel_b(jnp.asarray(p2["kernel"], dtype)),
                   pack_bias(jnp.asarray(p2["bias"], dtype)))
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            out = hin + t
            if mask0 is not None:
                t, out = t * mask0, out * mask0
            return t, out
        out = hin + t if kind == "res" else t
        return out if mask0 is None else out * mask0

    return pair


def _ste_round(x):
    """round() with a straight-through gradient (the standard QAT
    estimator: d(round)/dx treated as 1)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _fake_quant(x, s):
    """Symmetric fake-quantization onto the int8 grid with step `s`
    (STE round; the clip's zero gradient outside [-127s, 127s] matches
    the saturation the real int8 path applies)."""
    return _ste_round(jnp.clip(x / s, -127.0, 127.0)) * s


def qat_pair(dtype):
    """Quantization-aware-training conv-pair runner (same call shape as
    exact_pair): emulates make_pair_runner's pair_int8 W8A8 arithmetic
    in float with straight-through rounding, so training learns weights
    robust to the int8 serving path (--int8_trunk).

    Scheme parity with serving: weight scales use the identical
    per-output-channel max|k_packed|/127 rule (_quantize_pair_weights)
    and activation scales the identical 1.05*max/127 headroom — computed
    dynamically per batch and stop_gradient'd (scales are constants
    within a step, the standard QAT recipe; at serving, calibration
    recomputes them statically from a calib batch of the same
    distribution). conv(fq(x), fq(k)) in float equals the int8 conv's
    dequantized int32 accumulation up to float summation order
    (tests/test_qat.py pins the match against the real int8 runner).

    Only the conv pairs that run int8 at serving are fake-quantized;
    heads / tails / residual streams stay exact, mirroring
    make_int8_edsr_forward's scheme. Even width required, like the int8
    path itself.
    """

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        if mask0 is not None:
            raise ValueError(
                "--qat requires an even patch width (the int8 serving "
                "path it trains for is even-width only); got an odd-width "
                "packed walk")
        f32 = jnp.float32
        ka = pack_kernel_a(jnp.asarray(p1["kernel"], f32))
        kb = pack_kernel_b(jnp.asarray(p2["kernel"], f32))
        sa = jax.lax.stop_gradient(
            jnp.max(jnp.abs(ka), axis=(0, 1, 2), keepdims=True)) / 127.0 + 1e-12
        sb = jax.lax.stop_gradient(
            jnp.max(jnp.abs(kb), axis=(0, 1, 2), keepdims=True)) / 127.0 + 1e-12
        s_in = (jax.lax.stop_gradient(jnp.max(jnp.abs(hin))).astype(f32)
                * 1.05 / 127.0 + 1e-12)
        t = conv_a(_fake_quant(hin.astype(f32), s_in).astype(dtype),
                   _fake_quant(ka, sa).astype(dtype),
                   pack_bias(jnp.asarray(p1["bias"], dtype)))
        t = act(t) * mask1
        s_mid = (jax.lax.stop_gradient(jnp.max(jnp.abs(t))).astype(f32)
                 * 1.05 / 127.0 + 1e-12)
        t = conv_b(_fake_quant(t.astype(f32), s_mid).astype(dtype),
                   _fake_quant(kb, sb).astype(dtype),
                   pack_bias(jnp.asarray(p2["bias"], dtype)))
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            return t, hin + t
        return hin + t if kind == "res" else t

    return pair


def remat_pair(pair):
    """Wrap a pair runner in jax.checkpoint: the backward pass recomputes
    each conv pair's activations instead of storing them, so training
    peak memory scales with ONE block instead of the trunk depth — the
    TPU answer to big-patch / full-frame fine-tuning geometries
    (`--remat`; HBM is the budget, MXU recompute is nearly free for
    these conv shapes). Loss/grad-identical to the unwrapped pair;
    forward-only use is unaffected (checkpointing only acts under
    differentiation). Verified by XLA's compiled memory analysis in
    tests/test_remat.py."""

    def wrapped(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
                res_weight=1.0, mask0=None):
        fn = jax.checkpoint(
            lambda h, a, b, m1, m0: pair(idx, h, a, b, m1, kind=kind,
                                         act=act, res_weight=res_weight,
                                         mask0=m0))
        return fn(hin, p1, p2, mask1, mask0)

    return wrapped


def _training_pair(qat, dtype, remat=False):
    """The pair runner a differentiable walk should train through:
    qat_pair when the model opted into --qat, exact_pair otherwise;
    jax.checkpoint-wrapped under --remat."""
    pair = qat_pair(dtype) if qat else exact_pair(dtype)
    return remat_pair(pair) if remat else pair


def _remat_requested(model) -> bool:
    return bool(getattr(getattr(model, "args", None), "remat", 0))


def _make_int8(model, calib_batch, dtype, walk, pairs):
    """Shared int8 scaffolding: one eager bf16 calibration pass through
    the family's walk records per-site activation maxima (jit would turn
    them into tracers), finish() quantizes the `pairs` weights, and the
    returned forward replays the SAME walk with the int8 pair runner.
    """
    pair_bf16, pair_int8, finish = make_pair_runner(dtype)
    _ = walk(model.params, _even_calib(calib_batch), pair_bf16)
    finish(pairs)

    def forward(params, x):
        if x.shape[2] % 2:
            raise ValueError("int8 trunk requires even width")
        return walk(params, x, pair_int8)

    return forward


def _quantize_pair_weights(p1, p2, dtype):
    """Pack + int8-quantize one conv pair (per-output-channel scales)."""
    ka = np.asarray(pack_kernel_a(jnp.asarray(p1["kernel"], jnp.float32)))
    kb = np.asarray(pack_kernel_b(jnp.asarray(p2["kernel"], jnp.float32)))
    sa = np.abs(ka).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    sb = np.abs(kb).max(axis=(0, 1, 2)) / 127.0 + 1e-12
    return dict(
        ka=jnp.asarray(np.rint(ka / sa).astype(np.int8)),
        sa=jnp.asarray(sa, jnp.float32),
        ba=pack_bias(jnp.asarray(p1["bias"], dtype)),
        kb=jnp.asarray(np.rint(kb / sb).astype(np.int8)),
        sb=jnp.asarray(sb, jnp.float32),
        bb=pack_bias(jnp.asarray(p2["bias"], dtype)),
    )


def make_pair_runner(dtype):
    """Returns (pair_bf16, pair_int8, finish_calibration).

    The family walkers (EDSR / LarvaNet / MSRR / ...) call
    `pair(idx, h, p1, p2, mask1, kind, act)` for each conv pair; during
    calibration pair_bf16 records per-site maxima, afterwards
    finish_calibration(pairs) quantizes the weights and pair_int8
    replays the walk W8A8 (quant/dequant fused into conv epilogues).
    kind: 'res' (skip add) | 'none' | 'both' (REGO-style, returns
    (t, hin + t)); act applied between the convs.
    """
    record = {}  # idx -> (input max, mid max); keyed so the calibration
    quant = []   # walk's call order cannot silently diverge from finish()

    def pair_bf16(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
                  res_weight=1.0, mask0=None):
        if mask0 is not None:
            raise ValueError("int8 calibration requires even width (no mask0)")
        if idx in record:
            raise ValueError("pair index %d calibrated twice" % idx)
        ka = pack_kernel_a(jnp.asarray(p1["kernel"], dtype))
        ba = pack_bias(jnp.asarray(p1["bias"], dtype))
        kb = pack_kernel_b(jnp.asarray(p2["kernel"], dtype))
        bb = pack_bias(jnp.asarray(p2["bias"], dtype))
        m_in = jnp.max(jnp.abs(hin)).astype(jnp.float32)
        t = act(conv_a(hin, ka, ba)) * mask1
        record[idx] = (m_in, jnp.max(jnp.abs(t)).astype(jnp.float32))
        t = conv_b(t, kb, bb)
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            return t, hin + t
        return hin + t if kind == "res" else t

    def finish_calibration(pairs):
        if sorted(record) != list(range(len(pairs))):
            raise ValueError("calibration walked pair indices %r but finish() "
                             "got %d pairs" % (sorted(record), len(pairs)))
        for i, (p1, p2) in enumerate(pairs):
            q = _quantize_pair_weights(p1, p2, dtype)
            q["s_in"] = float(record[i][0]) * 1.05 / 127.0
            q["s_mid"] = float(record[i][1]) * 1.05 / 127.0
            quant.append(q)

    def pair_int8(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
                  res_weight=1.0, mask0=None):
        if mask0 is not None:
            raise ValueError("int8 trunk requires even width (no mask0)")
        q = quant[idx]
        s_in, s_mid = q["s_in"], q["s_mid"]
        xq = jnp.clip(jnp.round(hin.astype(jnp.float32) / s_in),
                      -127, 127).astype(jnp.int8)
        t = jax.lax.conv_general_dilated(
            xq, q["ka"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        t = act((t.astype(jnp.float32) * (s_in * q["sa"])).astype(dtype)
                + q["ba"]) * mask1
        tq = jnp.clip(jnp.round(t.astype(jnp.float32) / s_mid),
                      -127, 127).astype(jnp.int8)
        t = jax.lax.conv_general_dilated(
            tq, q["kb"], (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        t = (t.astype(jnp.float32) * (s_mid * q["sb"])).astype(dtype) + q["bb"]
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            return t, hin + t
        return hin + t if kind == "res" else t

    return pair_bf16, pair_int8, finish_calibration
