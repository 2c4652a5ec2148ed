"""Fast-tier smoke of the packed/int8 fast paths + the shared router.

The exhaustive exactness suites (tests/test_packed_trunk.py,
tests/test_collapsed_tail.py) are compile-heavy and live in the slow
tier (--runslow); this file keeps the default loop covering the load-
bearing claims cheaply: the router picks the right builder per family,
one packed forward matches the module graph, and one int8 forward is
close to the exact one. Tiny configs, one input size each.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.ops.fastpath import build_fast_forward


def _model(name, flags):
    m = get_model(name)
    m.parse_args(flags)
    m.prepare(is_training=False, scales=[4])
    return m


def test_router_covers_every_family():
    cases = {
        "edsr": ([], "collapsed"),
        "LarvaNet": (["--num_blocks", "2,2"], "packed"),
        "LarvaNet_w64": (["--num_blocks", "2,2"], "packed"),
        "mamnet": ([], "collapsed"),
        "TreeNet": ([], "packed"),
        "msrr_reduced": (["--num_blocks", "2"], "packed"),
        "hrsr_c3": ([], "packed"),
        "ebrn_rm": ([], "packed"),
        "REGO-Net": ([], "packed"),
    }
    for name, (flags, want) in cases.items():
        m = get_model(name)
        m.parse_args(flags)
        # no prepare needed: routing is name-based and must not build
        fwd_desc = None
        try:
            m.prepare(is_training=False, scales=[4])
            _, fwd_desc = build_fast_forward(m, jnp.float32)
        except Exception as exc:  # pragma: no cover
            pytest.fail("router failed for %s: %s" % (name, exc))
        assert fwd_desc and want in fwd_desc, (name, fwd_desc)


def test_router_dwsr_falls_back_to_plain():
    m = _model("dwsr_reduced", ["--num_blocks", "2"])
    fwd, desc = build_fast_forward(m, jnp.float32)
    assert fwd is None and desc is None  # documented negative result


def test_packed_edsr_smoke_matches_module(rng):
    m = _model("edsr", ["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    fwd, _ = build_fast_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 12, 14, 3)).astype(np.float32))
    ref = m.module.apply({"params": m.params}, x)
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)), np.asarray(ref),
                               atol=0.2, rtol=2e-3)


def test_packed_larvanet_smoke_matches_module(rng):
    m = _model("LarvaNet", ["--num_blocks", "1,1"])
    fwd, _ = build_fast_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 12, 3)).astype(np.float32))
    # reference side must be the PLAIN module graph (the default
    # _forward_impl IS the packed path — comparing to it is vacuous)
    ref = m.module.apply({"params": m.params}, x)
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)), np.asarray(ref),
                               atol=0.1, rtol=1e-4)


def test_packed_larvanet_w64_smoke_matches_module(rng):
    """The MXU-native width extension: 64-wide trunk, narrowing 64->48
    legs (models/larvanet.py LarvaNet_w64)."""
    m = _model("LarvaNet_w64", ["--num_blocks", "1,1"])
    fwd, _ = build_fast_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 13, 3)).astype(np.float32))
    ref = m.module.apply({"params": m.params}, x)
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)), np.asarray(ref),
                               atol=0.1, rtol=1e-4)


def test_make_plain_forward_matches_module(rng):
    from larvanet_tpu.ops.fastpath import make_plain_forward

    m = _model("LarvaNet", ["--num_blocks", "1,1"])
    fwd = make_plain_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 12, 3)).astype(np.float32))
    ref = m.module.apply({"params": m.params}, x)
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)), np.asarray(ref),
                               atol=1e-4, rtol=1e-6)


def test_make_plain_forward_honors_leg(rng):
    """--leg early exits route through the plain graph's exits arg just
    like _forward_impl (models/larvanet.py)."""
    from larvanet_tpu.ops.fastpath import make_plain_forward

    m = _model("LarvaNet", ["--num_blocks", "1,1", "--leg", "0"])
    m.args.packed_trunk = 0  # compare against the plain early-exit path
    fwd = make_plain_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 12, 3)).astype(np.float32))
    ref = m._forward_impl(m.params, x)
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)), np.asarray(ref),
                               atol=1e-4, rtol=1e-6)


def test_plain_full_frame_dispatch_routes_by_pixels(rng):
    """cli/common.maybe_plain_full_frame: frames >= the threshold run the
    plain module graph; smaller inputs keep the installed fast path."""
    import argparse

    from larvanet_tpu.cli import common

    m = _model("LarvaNet", ["--num_blocks", "1,1"])
    calls = []
    real_fast = m._fwd_jit

    def sentinel_fast(params, x):
        calls.append("fast")
        return real_fast(params, x)

    m._fwd_jit = sentinel_fast
    args = argparse.Namespace(plain_frame_px=10 * 12, spatial_shard=0)
    common.maybe_plain_full_frame(m, args)

    small = jnp.asarray(rng.uniform(0, 255, (1, 8, 10, 3)).astype(np.float32))
    large = jnp.asarray(rng.uniform(0, 255, (1, 10, 12, 3)).astype(np.float32))
    m._fwd_jit(m.params, small)
    assert calls == ["fast"]
    out = m._fwd_jit(m.params, large)  # >= threshold: plain graph
    assert calls == ["fast"]
    ref = m.module.apply({"params": m.params}, large)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-6)


def test_plain_frame_crossover_is_family_aware():
    """Underfilled trunks (flagship 48ch -> 96 packed lanes) get the
    measured crossover; full-tile trunks (w64 -> 128 lanes) never route
    — their packed graph measured faster at every frame size
    (XOVER_BENCH.json)."""
    from larvanet_tpu.ops.fastpath import (PLAIN_FRAME_CROSSOVER_PX,
                                           plain_frame_crossover_px)

    m48 = _model("LarvaNet", ["--num_blocks", "1,1"])
    assert plain_frame_crossover_px(m48) == PLAIN_FRAME_CROSSOVER_PX
    m64 = _model("LarvaNet_w64", ["--num_blocks", "1,1"])
    assert plain_frame_crossover_px(m64) == 0


def test_plain_full_frame_dispatch_auto_skips_full_tile_trunks():
    import argparse

    from larvanet_tpu.cli import common

    m = _model("LarvaNet_w64", ["--num_blocks", "1,1"])
    before = m._fwd_jit
    args = argparse.Namespace(plain_frame_px=-1, spatial_shard=0)
    common.maybe_plain_full_frame(m, args)
    assert m._fwd_jit is before  # w64: packed wins at every size


def test_plain_full_frame_dispatch_skips_under_spatial_shard():
    import argparse

    from larvanet_tpu.cli import common

    m = _model("LarvaNet", ["--num_blocks", "1,1"])
    before = m._fwd_jit
    args = argparse.Namespace(plain_frame_px=1, spatial_shard=2)
    common.maybe_plain_full_frame(m, args)
    assert m._fwd_jit is before  # sharded forward owns full frames


def test_int8_edsr_smoke_close_to_exact(rng):
    m = _model("edsr", ["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    calib = rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32)
    q, desc = build_fast_forward(m, jnp.float32, int8_trunk=True, calib=calib)
    assert "int8" in desc
    exact, _ = build_fast_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 12, 12, 3)).astype(np.float32))
    a = np.asarray(q(m.params, x)).astype(np.float64)
    b = np.asarray(exact(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 45.0, psnr  # quantized-vs-exact within the usual envelope


def test_int8_larvanetv2_routes_and_is_close_to_exact(rng):
    """Round 5: the V2 tail topology quantizes its body pairs (tail
    stays bf16 unpacked) instead of silently falling back to exact —
    reference LarvaNetV2.py:108-118 forward-through-tail semantics."""
    m = _model("LarvaNetV2", ["--num_blocks", "2,2"])
    calib = rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32)
    q, desc = build_fast_forward(m, jnp.float32, int8_trunk=True, calib=calib)
    assert "int8" in desc
    exact, _ = build_fast_forward(m, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 12, 12, 3)).astype(np.float32))
    a = np.asarray(q(m.params, x)).astype(np.float64)
    b = np.asarray(exact(m.params, x)).astype(np.float64)
    assert a.shape == b.shape
    diff = np.mean((a - b) ** 2)
    assert diff > 0.0, "int8 output bit-identical to exact: fallback?"
    psnr = 10 * np.log10(255.0 ** 2 / max(diff, 1e-12))
    assert psnr > 45.0, psnr


def test_upscale_uint8_matches_host_quantization(rng):
    """base.upscale_uint8 — the serving D2H path (cli/serve.py,
    cli/get_sr.py --device_uint8) — must byte-match host
    clip(round(.), 0, 255).astype(uint8) on the SAME routed forward,
    across fast-path routings (collapsed EDSR, packed LarvaNet)."""
    import argparse

    from larvanet_tpu.cli import common

    for name, flags in (
            ("edsr", ["--edsr_conv_features", "8", "--edsr_res_blocks", "1"]),
            ("LarvaNet", ["--num_blocks", "1,1"])):
        m = _model(name, flags)
        ns = argparse.Namespace(model=name, packed_trunk=1, collapsed_tail=1)
        common.maybe_collapse_tail(m, ns)
        img = rng.uniform(0, 255, (3, 10, 14)).astype(np.float32)
        u8 = m.upscale_uint8([img], scale=4)[0]
        f32 = m.upscale([img], scale=4)[0]
        assert u8.dtype == np.uint8, name
        np.testing.assert_array_equal(
            u8, np.clip(np.round(f32), 0, 255).astype(np.uint8), err_msg=name)
