"""Fused H-Winograd x W-packed Pallas ResBlock (ops/wino_pallas.py).

Pins: exact agreement (float tolerance) with the direct packed ResBlock
(ops/packed/core.packed_resblock) across tile boundaries, H paddings
and res_weight; the H-boundary zero-mask (conv_b's SAME padding rows
must be 0, not relu(bias)); and the full EDSR forward against the
shipped packed+collapsed path. Runs the Mosaic interpreter on CPU —
the TPU-compiled measurement lands in BASELINE.md with the bench.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from larvanet_tpu.ops.packed.core import (
    grid1_mask, pack_bias, pack_kernel_a, pack_kernel_b, pack_w,
    packed_resblock)
from larvanet_tpu.ops.wino_pallas import (
    h_transform_kernel, make_wino_pallas_edsr_forward, wino_packed_resblock)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _pair(rng, c):
    k1 = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    b1 = rng.randn(c).astype(np.float32) * 0.1
    k2 = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    b2 = rng.randn(c).astype(np.float32) * 0.1
    return (pack_kernel_a(jnp.asarray(k1)), pack_bias(jnp.asarray(b1)),
            pack_kernel_b(jnp.asarray(k2)), pack_bias(jnp.asarray(b2)))


def test_h_transform_is_winograd_g(rng):
    """u[p] = sum_kh G[p,kh] * kp[kh]: basis 0/3 are the outer taps,
    1/2 the half-sum/half-diff — F(2,3)'s G."""
    kp = jnp.asarray(rng.randn(3, 2, 4, 4).astype(np.float32))
    u = np.asarray(h_transform_kernel(kp))
    np.testing.assert_allclose(u[0], kp[0], rtol=1e-6)
    np.testing.assert_allclose(u[3], kp[2], rtol=1e-6)
    np.testing.assert_allclose(u[1], 0.5 * (kp[0] + kp[1] + kp[2]), rtol=1e-5)
    np.testing.assert_allclose(u[2], 0.5 * (kp[0] - kp[1] + kp[2]), rtol=1e-5)


@pytest.mark.parametrize("h,tile", [(16, 8), (20, 8), (13, 8), (8, 8), (30, 16)])
def test_matches_direct_packed_resblock(rng, h, tile):
    """Tile boundaries, ragged last tile, odd H: all must agree with the
    direct packed ResBlock to float tolerance."""
    c, w = 8, 12
    x = rng.randn(2, h, w, c).astype(np.float32)
    ka, ba, kb, bb = _pair(rng, c)
    m1 = grid1_mask(w // 2 + 1, c)
    h0 = pack_w(jnp.asarray(x))
    ref = np.asarray(packed_resblock(h0, ka, ba, kb, bb, m1, res_weight=0.7))
    got = np.asarray(wino_packed_resblock(h0, ka, ba, kb, bb, m1,
                                          res_weight=0.7, tile_rows=tile,
                                          interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_h_boundary_rows_are_same_padded(rng):
    """The first/last output rows depend on conv_b's ZERO t-padding; a
    kernel that lets conv_a(pad) leak relu(bias) there diverges. Large
    biases amplify the leak, so this is a targeted trap."""
    c, w, h = 8, 10, 8
    x = rng.randn(1, h, w, c).astype(np.float32)
    k1 = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    k2 = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    big_b = np.full(c, 7.5, np.float32)  # relu(bias) leak would be ~huge
    ka, kb = pack_kernel_a(jnp.asarray(k1)), pack_kernel_b(jnp.asarray(k2))
    ba = bb = pack_bias(jnp.asarray(big_b))
    m1 = grid1_mask(w // 2 + 1, c)
    h0 = pack_w(jnp.asarray(x))
    ref = np.asarray(packed_resblock(h0, ka, ba, kb, bb, m1))
    got = np.asarray(wino_packed_resblock(h0, ka, ba, kb, bb, m1,
                                          tile_rows=8, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_edsr_forward_matches_packed(rng):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed.edsr import make_packed_edsr_forward

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "2", "--edsr_conv_features", "8",
                  "--scales", "4"])
    m.prepare(is_training=False, scales=[4])
    x = rng.uniform(0, 255, (1, 18, 16, 3)).astype(np.float32)
    ref = np.asarray(jax.jit(make_packed_edsr_forward(m))(m.params, x))
    got = np.asarray(make_wino_pallas_edsr_forward(m, interpret=True)(
        m.params, x))
    # float reordering only: tight on the 0-255 output scale
    np.testing.assert_allclose(got, ref, atol=2e-3)


@pytest.mark.parametrize("h", [16, 20, 37, 48])
def test_f43_matches_direct_packed_resblock(rng, h):
    """F(4,3) variant (2.0x compute ceiling): same agreement bar, with a
    big conv_a bias as the H-boundary leak trap."""
    from larvanet_tpu.ops.wino_pallas import wino4_packed_resblock

    c, w = 8, 12
    x = rng.randn(2, h, w, c).astype(np.float32)
    k1 = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    k2 = rng.randn(3, 3, c, c).astype(np.float32) * 0.2
    ka, kb = pack_kernel_a(jnp.asarray(k1)), pack_kernel_b(jnp.asarray(k2))
    ba = pack_bias(jnp.asarray(np.full(c, 5.0, np.float32)))
    bb = pack_bias(jnp.asarray(rng.randn(c).astype(np.float32) * 0.1))
    m1 = grid1_mask(w // 2 + 1, c)
    h0 = pack_w(jnp.asarray(x))
    ref = np.asarray(packed_resblock(h0, ka, ba, kb, bb, m1, res_weight=0.7))
    got = np.asarray(wino4_packed_resblock(h0, ka, ba, kb, bb, m1,
                                           res_weight=0.7, tile_rows=16,
                                           interpret=True))
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_f43_transform_matrices_exact():
    """A^T[(G g) * (B^T d)] must equal the direct 1-D correlation —
    pins the hardcoded F(4,3) matrices."""
    from larvanet_tpu.ops.wino_pallas import _AT46, _BT6, _G6

    r = np.random.RandomState(3)
    d, g = r.randn(6), r.randn(3)
    y = _AT46 @ ((_G6 @ g) * (_BT6 @ d))
    ref = np.array([np.dot(d[i:i + 3], g) for i in range(4)])
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_edsr_forward_matches_packed_f43(rng):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed.edsr import make_packed_edsr_forward

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "2", "--edsr_conv_features", "8",
                  "--scales", "4"])
    m.prepare(is_training=False, scales=[4])
    x = rng.uniform(0, 255, (1, 18, 16, 3)).astype(np.float32)
    ref = np.asarray(jax.jit(make_packed_edsr_forward(m))(m.params, x))
    got = np.asarray(make_wino_pallas_edsr_forward(m, interpret=True, m=4)(
        m.params, x))
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_larvanet_w64_forward_matches_packed(rng):
    """LarvaNet-family routing: 64-feature trunks (2C=128 lanes) run the
    kernel on body pairs; narrower configs fall back per-pair to the
    exact packed path bit-identically; legs always run exact."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed.larvanet import make_packed_larvanet_forward
    from larvanet_tpu.ops.wino_pallas import (
        make_wino_pallas_larvanet_forward)

    x = rng.uniform(0, 255, (1, 12, 16, 3)).astype(np.float32)

    tiny = get_model("LarvaNet_w64")
    tiny.parse_args(["--num_blocks", "2,2", "--num_features", "16"])
    tiny.prepare(is_training=False, scales=[4])
    ref = np.asarray(jax.jit(make_packed_larvanet_forward(tiny))(
        tiny.params, x))
    got = np.asarray(make_wino_pallas_larvanet_forward(tiny, interpret=True)(
        tiny.params, x))
    np.testing.assert_array_equal(got, ref)  # 32-lane: pure fallback

    w64 = get_model("LarvaNet_w64")
    w64.parse_args(["--num_blocks", "1,1", "--num_features", "64"])
    w64.prepare(is_training=False, scales=[4])
    ref = np.asarray(jax.jit(make_packed_larvanet_forward(w64))(w64.params, x))
    got = np.asarray(make_wino_pallas_larvanet_forward(w64, interpret=True)(
        w64.params, x))
    np.testing.assert_allclose(got, ref, atol=1e-3)  # kernel path


@pytest.mark.slow
def test_wino_bench_quick(tmp_path):
    """tools/wino_bench.py --quick: every variant times and reports a
    PSNR guardrail; failures are recorded per-variant, not fatal."""
    from tools import wino_bench

    out = str(tmp_path / "wb.json")
    report = wino_bench.main(["--quick", "--out", out])
    for name in ("packed", "wino2", "wino4", "wino2d"):
        entry = report["variants"][name]
        assert "error" not in entry, entry
        assert entry["mps"] > 0
        assert entry["psnr_vs_exact_db"] > 40  # bf16 rounding only


def test_odd_width_raises(rng):
    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8",
                  "--scales", "4"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_wino_pallas_edsr_forward(m, interpret=True)
    with pytest.raises(ValueError, match="even width"):
        fwd(m.params, np.zeros((1, 8, 9, 3), np.float32))
