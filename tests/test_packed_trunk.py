"""Width-packed trunk (ops/packed_trunk.py) exactness tests.

The packing is a pure reparametrization of SAME-padded 3x3 convs
(reference trunk loops: models/edsr.py:195-207), so everything here is
exact up to f32 reduction order except the final comparison against module.apply,
which goes through the collapsed tail's reassociated linear algebra
(float tolerance, same as tests/test_collapsed_tail.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy parity tier (--runslow); fast smoke: test_fastpath_smoke.py

from larvanet_tpu.ops import packed_trunk as pt


def _conv(h, w, b):
    return jax.lax.conv_general_dilated(
        h, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)


@pytest.mark.parametrize("shape", [(2, 6, 10, 5), (1, 4, 8, 64), (3, 5, 2, 7)])
def test_packed_resblock_bit_exact(shape):
    rng = np.random.default_rng(1)
    n, h, w, c = shape
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    k1, k2 = (rng.normal(0, 0.3, (3, 3, c, c)).astype(np.float32) for _ in range(2))
    b1, b2 = (rng.normal(0, 0.3, (c,)).astype(np.float32) for _ in range(2))

    ref = x + _conv(jax.nn.relu(_conv(x, k1, b1)), k2, b2)
    out = pt.packed_resblock(
        pt.pack_w(x),
        pt.pack_kernel_a(k1), pt.pack_bias(b1),
        pt.pack_kernel_b(k2), pt.pack_bias(b2),
        pt.grid1_mask(w // 2 + 1, c))
    # identical taps; only f32 reduction order differs (different tiling)
    np.testing.assert_allclose(np.asarray(pt.unpack_w(out)), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_packed_chain_bit_exact():
    # several blocks chained: grid0 alignment must survive depth
    rng = np.random.default_rng(2)
    n, h, w, c = 1, 7, 12, 8
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)).astype(np.float32))
    blocks = [
        [(rng.normal(0, 0.3, (3, 3, c, c)).astype(np.float32),
          rng.normal(0, 0.3, (c,)).astype(np.float32)) for _ in range(2)]
        for _ in range(4)
    ]
    ref = x
    for (k1, b1), (k2, b2) in blocks:
        ref = ref + _conv(jax.nn.relu(_conv(ref, k1, b1)), k2, b2)
    out = pt.pack_w(x)
    m = pt.grid1_mask(w // 2 + 1, c)
    for (k1, b1), (k2, b2) in blocks:
        out = pt.packed_resblock(out, pt.pack_kernel_a(k1), pt.pack_bias(b1),
                                 pt.pack_kernel_b(k2), pt.pack_bias(b2), m)
    np.testing.assert_allclose(np.asarray(pt.unpack_w(out)), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def _tiny_edsr():
    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "3", "--edsr_conv_features", "16"])
    m.prepare(is_training=False, scales=[4])
    return m


def test_packed_edsr_matches_collapsed_bit_exact():
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward
    from larvanet_tpu.ops.packed_trunk import make_packed_edsr_forward

    m = _tiny_edsr()
    fwd = make_packed_edsr_forward(m, dtype=jnp.float32)
    col = make_collapsed_edsr_forward(m, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)),
                               np.asarray(col(m.params, x)),
                               atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize("hw", [(11, 13), (8, 9), (7, 8), (6, 2)])
def test_packed_edsr_odd_widths_match_module(hw):
    from larvanet_tpu.ops.packed_trunk import make_packed_edsr_forward

    m = _tiny_edsr()
    fwd = make_packed_edsr_forward(m, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
    ref = m.module.apply({"params": m.params}, x)
    np.testing.assert_allclose(np.asarray(fwd(m.params, x)), np.asarray(ref),
                               atol=0.2, rtol=2e-3)


@pytest.mark.parametrize("name,flags", [
    ("LarvaNet", ["--num_modules", "2", "--num_blocks", "2,3"]),
    ("LarvaNet_0c", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNet_1c", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNet_skip", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNet_res", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNetV2", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaLeg", ["--num_modules", "3", "--num_blocks", "1,1,1", "--leg", "2"]),
    ("LarvaLeg", ["--num_modules", "2", "--num_blocks", "1,1", "--leg", "0"]),
    ("LarvaNet_w64", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNet_w64", ["--num_modules", "1", "--num_blocks", "2",
                      "--num_features", "32"]),
])
def test_packed_larvanet_matches_module(name, flags):
    """Every LarvaNet topology (bodies, leg styles, V2 tail, early exit,
    res dual-stream, the w64 narrowing legs), even and odd widths."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_packed_larvanet_forward

    m = get_model(name)
    m.parse_args(flags)
    m.prepare(is_training=False, scales=[4])
    fwd = make_packed_larvanet_forward(m, dtype=jnp.float32)
    m.args.packed_trunk = 0  # reference side = the PLAIN module graph
    rng = np.random.default_rng(0)
    for hw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        ref = np.asarray(m._forward_impl(m.params, x))
        got = np.asarray(fwd(m.params, x))
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)


def test_packed_training_loss_and_grad_parity():
    """--packed_trunk training is the SAME optimization problem: loss and
    gradients match the plain module graph (the packing is differentiable
    slicing/concat of the original parameters)."""
    from larvanet_tpu.core.registry import get_model

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32))

    def run(packed):
        m = get_model("LarvaNet")
        m.parse_args(["--num_modules", "2", "--num_blocks", "1,2",
                      "--packed_trunk", str(packed)])
        m.prepare(is_training=True, scales=[4])
        return jax.value_and_grad(m._compute_loss)(m.params, x, t)

    l1, g1 = run(1)
    l0, g0 = run(0)
    # Relative bound: packed vs plain is a different reduction order over
    # ~26k f32 terms, so a few ulp of the ~1e2-magnitude loss is expected.
    assert abs(float(l1) - float(l0)) < 5e-6 * max(1.0, abs(float(l0)))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_edsr_training_loss_and_grad_parity():
    from larvanet_tpu.core.registry import get_model

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 16, 17, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 64, 68, 3)).astype(np.float32))

    def run(packed):
        m = get_model("edsr")
        m.parse_args(["--edsr_res_blocks", "3", "--edsr_conv_features", "16",
                      "--packed_trunk", str(packed)])
        m.prepare(is_training=True, scales=[4])
        return jax.value_and_grad(m._compute_loss)(m.params, x, t)

    l1, g1 = run(1)
    l0, g0 = run(0)
    # Same relative bound as above (measured delta here is ~9e-7 relative —
    # reduction-order rounding; the grad check below is the real claim).
    assert abs(float(l1) - float(l0)) < 5e-6 * max(1.0, abs(float(l0)))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("name,flags", [
    ("msrr", ["--num_blocks", "2", "--num_filters", "16"]),
    ("msrr_test", ["--num_blocks", "2", "--num_filters", "16"]),
    ("msrr_reduced", ["--num_blocks", "2"]),
    ("msrr_reduced_NI", ["--num_blocks", "2"]),
    ("msrr_reduced_linear", ["--num_blocks", "2"]),
    ("msrr_reduced_relu6", ["--num_blocks", "2"]),
    ("msrr_reduced_leaky", ["--num_blocks", "2", "--slope", "0.3"]),
    ("msrr_reduced_meanshift", ["--num_blocks", "2"]),
    ("dwsr_reduced", ["--num_blocks", "2"]),  # depthwise -> plain fallback
])
def test_packed_msrr_family_matches_plain(name, flags):
    from larvanet_tpu.core.registry import get_model

    m = get_model(name)
    m.parse_args(flags + ["--packed_trunk", "1"])
    m.prepare(is_training=False, scales=[4])
    m2 = get_model(name)
    m2.parse_args(flags + ["--packed_trunk", "0"])
    m2.prepare(is_training=False, scales=[4])
    m2.params = m.params
    rng = np.random.default_rng(0)
    for hw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(m._forward_impl(m.params, x)),
            np.asarray(m2._forward_impl(m2.params, x)), atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize("name,flags", [
    ("TreeNet", ["--num_common_blocks", "2", "--num_branches", "2", "--num_branch_blocks", "1"]),
    ("hrsr", ["--num_lr_blocks", "2", "--num_hr_blocks", "2", "--num_hr_filters", "6"]),
    ("hrsr", ["--num_lr_blocks", "2", "--num_hr_blocks", "0"]),
    ("hrsr_", ["--num_lr_blocks", "2", "--num_hr_blocks", "1"]),
    ("hrsr_c3", ["--num_lr_blocks", "2", "--num_hr_blocks", "2"]),
])
def test_packed_treenet_hrsr_matches_plain(name, flags):
    """Forward AND training-loss parity for the TreeNet/HRSR families."""
    from larvanet_tpu.core.registry import get_model

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(flags + ["--packed_trunk", "1"])
    m.prepare(is_training=True, scales=[4])
    m2 = get_model(name)
    m2.parse_args(flags + ["--packed_trunk", "0"])
    m2.prepare(is_training=True, scales=[4])
    m2.params = m.params
    for hw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(m._forward_impl(m.params, x)),
            np.asarray(m2._forward_impl(m2.params, x)), atol=1e-3, rtol=1e-5)
    xt = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    tt = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    assert abs(float(m._compute_loss(m.params, xt, tt))
               - float(m2._compute_loss(m2.params, xt, tt))) < 1e-3


def test_int8_edsr_forward_close_to_float():
    """Opt-in W8A8 trunk: quantization noise must be far below visual
    thresholds (the path is documented as not-float-exact)."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_int8_edsr_forward, make_packed_edsr_forward)

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "4", "--edsr_conv_features", "16"])
    m.prepare(is_training=False, scales=[4])
    rng = np.random.default_rng(0)
    calib = rng.uniform(0, 255, (2, 24, 24, 3)).astype(np.float32)
    f_q = make_int8_edsr_forward(m, calib, dtype=jnp.float32)
    f_ref = make_packed_edsr_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 24, 24, 3)).astype(np.float32))
    a = np.asarray(f_q(m.params, x)).astype(np.float64)
    b = np.asarray(f_ref(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr

    with pytest.raises(ValueError):
        f_q(m.params, jnp.zeros((1, 24, 23, 3), jnp.float32))


@pytest.mark.parametrize("name,flags", [
    ("LarvaNet", ["--num_modules", "2", "--num_blocks", "2,3"]),
    ("LarvaNet_skip", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNet_1c", ["--num_modules", "2", "--num_blocks", "1,2"]),
    ("LarvaNet_0c", ["--num_modules", "2", "--num_blocks", "1,2"]),
])
def test_int8_larvanet_forward_close_to_float(name, flags):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_int8_larvanet_forward, make_packed_larvanet_forward)

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(flags)
    m.prepare(is_training=False, scales=[4])
    calib = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    fq = make_int8_larvanet_forward(m, calib, dtype=jnp.float32)
    fr = make_packed_larvanet_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32))
    a = np.asarray(fq(m.params, x)).astype(np.float64)
    b = np.asarray(fr(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr


def test_int8_larvanet_rejects_tail_configs():
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_int8_larvanet_forward

    m = get_model("LarvaNetV2")
    m.parse_args(["--num_modules", "2", "--num_blocks", "1,1"])
    m.prepare(is_training=False, scales=[4])
    with pytest.raises(ValueError):
        make_int8_larvanet_forward(m, np.zeros((1, 8, 8, 3), np.float32))


@pytest.mark.parametrize("name,flags", [
    ("msrr_reduced", ["--num_blocks", "3"]),
    ("msrr", ["--num_blocks", "2", "--num_filters", "16"]),
    ("msrr_test", ["--num_blocks", "2", "--num_filters", "16"]),
    ("msrr_reduced_leaky", ["--num_blocks", "2", "--slope", "0.3"]),
    ("msrr_reduced_meanshift", ["--num_blocks", "2"]),
])
def test_int8_msrr_forward_close_to_float(name, flags):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_int8_msrr_forward, make_packed_msrr_forward)

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(flags)
    m.prepare(is_training=False, scales=[4])
    calib = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    fq = make_int8_msrr_forward(m, calib, dtype=jnp.float32)
    fr = make_packed_msrr_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32))
    a = np.asarray(fq(m.params, x)).astype(np.float64)
    b = np.asarray(fr(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr


@pytest.mark.parametrize("scale", [2, 3])
def test_packed_edsr_other_scales(scale):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_packed_edsr_forward

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "2", "--edsr_conv_features", "8"])
    m.prepare(is_training=False, scales=[scale])
    fwd = make_packed_edsr_forward(m, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    for hw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(fwd(m.params, x)),
            np.asarray(m.module.apply({"params": m.params}, x)),
            atol=0.5, rtol=1e-4)


def test_int8_treenet_forward_close_to_float():
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_int8_treenet_forward, make_packed_treenet_forward)

    rng = np.random.default_rng(0)
    m = get_model("TreeNet")
    m.parse_args(["--num_common_blocks", "2", "--num_branches", "2",
                  "--num_branch_blocks", "2"])
    m.prepare(is_training=False, scales=[4])
    calib = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    fq = make_int8_treenet_forward(m, calib, dtype=jnp.float32)
    fr = make_packed_treenet_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32))
    a = np.asarray(fq(m.params, x)).astype(np.float64)
    b = np.asarray(fr(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr


@pytest.mark.parametrize("name", ["REGO-Net", "REGO-serial"])
def test_packed_rego_matches_plain(name):
    from larvanet_tpu.core.registry import get_model

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(["--len_side", "3", "--num_filters", "8", "--packed_trunk", "1"])
    m.prepare(is_training=True, scales=[4])
    m2 = get_model(name)
    m2.parse_args(["--len_side", "3", "--num_filters", "8", "--packed_trunk", "0"])
    m2.prepare(is_training=True, scales=[4])
    m2.params = m.params
    for hw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(m._forward_impl(m.params, x)),
            np.asarray(m2._forward_impl(m2.params, x)), atol=1e-2, rtol=1e-5)
    xt = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    tt = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    assert abs(float(m._compute_loss(m.params, xt, tt))
               - float(m2._compute_loss(m2.params, xt, tt))) < 1e-3


@pytest.mark.parametrize("name", ["ebrn_rm", "ebrn_rm_BLI"])
def test_packed_ebrn_rm_matches_plain(name):
    from larvanet_tpu.core.registry import get_model

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(["--num_brms", "3", "--num_filters", "8", "--packed_trunk", "1"])
    m.prepare(is_training=True, scales=[4])
    m2 = get_model(name)
    m2.parse_args(["--num_brms", "3", "--num_filters", "8", "--packed_trunk", "0"])
    m2.prepare(is_training=True, scales=[4])
    m2.params = m.params
    for hw in [(8, 10), (7, 9)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(m._forward_impl(m.params, x)),
            np.asarray(m2._forward_impl(m2.params, x)), atol=1e-2, rtol=1e-5)
    xt = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    tt = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    assert abs(float(m._compute_loss(m.params, xt, tt))
               - float(m2._compute_loss(m2.params, xt, tt))) < 1e-3


def test_packed_mamnet_matches_module():
    """Packed MAM attention (slot-combined variance + decomposed
    depthwise) + collapsed tail vs the plain module graph."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_packed_mamnet_forward

    rng = np.random.default_rng(0)
    m = get_model("mamnet")
    m.parse_args(["--num_blocks", "3", "--num_filters", "32"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_packed_mamnet_forward(m, dtype=jnp.float32)
    for hw in [(8, 10), (12, 16)]:
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(fwd(m.params, x)),
            np.asarray(m.module.apply({"params": m.params}, x)),
            atol=0.3, rtol=2e-3)


@pytest.mark.parametrize("name", ["REGO-Net", "REGO-serial"])
def test_int8_rego_forward_close_to_float(name):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_int8_rego_forward, make_packed_rego_forward)

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(["--len_side", "3", "--num_filters", "8"])
    m.prepare(is_training=False, scales=[4])
    calib = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    fq = make_int8_rego_forward(m, calib, dtype=jnp.float32)
    fr = make_packed_rego_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32))
    a = np.asarray(fq(m.params, x)).astype(np.float64)
    b = np.asarray(fr(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr


@pytest.mark.parametrize("name,flags,maker,ref_maker", [
    ("hrsr", ["--num_lr_blocks", "2", "--num_hr_blocks", "2", "--num_hr_filters", "6"],
     "make_int8_hrsr_forward", "make_packed_hrsr_forward"),
    ("hrsr_c3", ["--num_lr_blocks", "3", "--num_hr_blocks", "1"],
     "make_int8_hrsr_forward", "make_packed_hrsr_forward"),
    ("ebrn_rm", ["--num_brms", "3", "--num_filters", "8"],
     "make_int8_ebrn_rm_forward", "make_packed_ebrn_rm_forward"),
    ("ebrn_rm_BLI", ["--num_brms", "3", "--num_filters", "8"],
     "make_int8_ebrn_rm_forward", "make_packed_ebrn_rm_forward"),
])
def test_int8_hrsr_ebrn_rm_close_to_float(name, flags, maker, ref_maker):
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops import packed_trunk as pt

    rng = np.random.default_rng(0)
    m = get_model(name)
    m.parse_args(flags)
    m.prepare(is_training=False, scales=[4])
    calib = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    fq = getattr(pt, maker)(m, calib, dtype=jnp.float32)
    fr = getattr(pt, ref_maker)(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32))
    a = np.asarray(fq(m.params, x)).astype(np.float64)
    b = np.asarray(fr(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr


def test_packed_imdn_matches_plain():
    """Packed IMDN: grid-alternating convs, packed channel splits,
    identity re-gather for grid1 distills, permuted 1x1 fuse."""
    from larvanet_tpu.core.registry import get_model

    rng = np.random.default_rng(0)
    m = get_model("imdn_aim2019")
    m.parse_args(["--num_blocks", "2", "--num_filters", "16", "--packed_trunk", "1"])
    m.prepare(is_training=True, scales=[4])
    m2 = get_model("imdn_aim2019")
    m2.parse_args(["--num_blocks", "2", "--num_filters", "16", "--packed_trunk", "0"])
    m2.prepare(is_training=True, scales=[4])
    m2.params = m.params
    for hw in [(8, 10), (7, 9)]:  # odd width exercises the fallback
        x = jnp.asarray(rng.uniform(0, 255, (1,) + hw + (3,)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(m._forward_impl(m.params, x)),
            np.asarray(m2._forward_impl(m2.params, x)), atol=1e-2, rtol=1e-5)
    xt = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    tt = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    assert abs(float(m._compute_loss(m.params, xt, tt))
               - float(m2._compute_loss(m2.params, xt, tt))) < 1e-3


def test_int8_mamnet_forward_close_to_float():
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_int8_mamnet_forward, make_packed_mamnet_forward)

    rng = np.random.default_rng(0)
    m = get_model("mamnet")
    m.parse_args(["--mamnet_res_blocks", "3", "--mamnet_conv_features", "16"])
    m.prepare(is_training=False, scales=[4])
    calib = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    fq = make_int8_mamnet_forward(m, calib, dtype=jnp.float32)
    fr = make_packed_mamnet_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32))
    a = np.asarray(fq(m.params, x)).astype(np.float64)
    b = np.asarray(fr(m.params, x)).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(np.mean((a - b) ** 2), 1e-12))
    assert psnr > 55.0, psnr

    with pytest.raises(ValueError):
        fq(m.params, jnp.zeros((1, 16, 15, 3), jnp.float32))


def test_packed_collapsed_mamnet_train_forward_and_grads():
    """Training graph for MAMNet: packed trunk + LIVE collapsed tail must
    be loss/grad-equivalent to the plain module graph."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_packed_collapsed_mamnet_train_forward)

    rng = np.random.default_rng(0)
    m = get_model("mamnet")
    m.parse_args(["--mamnet_res_blocks", "2", "--mamnet_conv_features", "16",
                  "--mamnet_res_weight", "0.5"])
    m.prepare(is_training=True, scales=[4])
    fwd = make_packed_collapsed_mamnet_train_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 14, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 56, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.1)

    gr = jax.grad(lambda p: jnp.mean(jnp.abs(
        m.module.apply({"params": p}, x) - t)))(m.params)
    gn = jax.grad(lambda p: jnp.mean(jnp.abs(fwd(p, x) - t)))(m.params)
    fr = np.asarray(jax.flatten_util.ravel_pytree(gr)[0])
    fn = np.asarray(jax.flatten_util.ravel_pytree(gn)[0])
    scale = max(np.abs(fr).max(), 1.0)
    np.testing.assert_allclose(fn, fr, atol=2e-4 * scale)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_packed_ebrn_full_matches(scale):
    """Full EBRN: packed HR sr_flows/fusions + LR bp_flows are exact."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_packed_ebrn_forward

    rng = np.random.default_rng(0)
    m = get_model("ebrn")
    m.parse_args(["--num_filters", "8", "--num_brms", "3"])
    m.prepare(is_training=False, scales=[scale])
    fwd = make_packed_ebrn_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (2, 6, 8, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.05)

    with pytest.raises(ValueError):
        fwd(m.params, jnp.zeros((1, 6, 7, 3), jnp.float32))


def test_packed_ebrn_full_grads_match():
    """The packed full-EBRN graph is differentiable and grad-equivalent
    (opt-in via --packed_full_ebrn; a documented negative result on v5e,
    kept exact and tested)."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_packed_ebrn_forward

    rng = np.random.default_rng(1)
    m = get_model("ebrn")
    m.parse_args(["--num_filters", "8", "--num_brms", "2"])
    m.prepare(is_training=True, scales=[4])
    fwd = make_packed_ebrn_forward(m, dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(0, 255, (1, 6, 6, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (1, 24, 24, 3)).astype(np.float32))
    gr = jax.grad(lambda p: jnp.mean(jnp.abs(
        m.module.apply({"params": p}, x) - t)))(m.params)
    gn = jax.grad(lambda p: jnp.mean(jnp.abs(fwd(p, x) - t)))(m.params)
    fr = np.asarray(jax.flatten_util.ravel_pytree(gr)[0])
    fn = np.asarray(jax.flatten_util.ravel_pytree(gn)[0])
    scale = max(np.abs(fr).max(), 1.0)
    np.testing.assert_allclose(fn, fr, atol=2e-4 * scale)


def test_collapsed_mamnet_train_forward_and_grads():
    """Default MAMNet training graph: plain trunk + LIVE collapsed tail
    (the fully packed variant is a documented negative result)."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import (
        make_collapsed_mamnet_train_forward)

    rng = np.random.default_rng(0)
    m = get_model("mamnet")
    m.parse_args(["--mamnet_res_blocks", "2", "--mamnet_conv_features", "16"])
    m.prepare(is_training=True, scales=[4])
    fwd = make_collapsed_mamnet_train_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 14, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 56, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.1)

    gr = jax.grad(lambda p: jnp.mean(jnp.abs(
        m.module.apply({"params": p}, x) - t)))(m.params)
    gn = jax.grad(lambda p: jnp.mean(jnp.abs(fwd(p, x) - t)))(m.params)
    fr = np.asarray(jax.flatten_util.ravel_pytree(gr)[0])
    fn = np.asarray(jax.flatten_util.ravel_pytree(gn)[0])
    scale = max(np.abs(fr).max(), 1.0)
    np.testing.assert_allclose(fn, fr, atol=2e-4 * scale)


def test_packed_mamnet_odd_width():
    """Odd-width inputs (common in SR eval sets) must run exactly through
    the default packed MAMNet inference path (regression: it used to
    raise ValueError from inside the CLI-wired jitted forward)."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_packed_mamnet_forward

    rng = np.random.default_rng(0)
    m = get_model("mamnet")
    m.parse_args(["--mamnet_res_blocks", "2", "--mamnet_conv_features", "16"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_packed_mamnet_forward(m, dtype=jnp.float32)
    for hw in [(11, 13), (9, 15)]:
        x = jnp.asarray(rng.uniform(0, 255, (1, *hw, 3)).astype(np.float32))
        ref = np.asarray(m.module.apply({"params": m.params}, x))
        got = np.asarray(jax.jit(fwd)(m.params, x))
        np.testing.assert_allclose(got, ref, atol=0.1)


def test_collapsed_larvanet_small_image():
    """The base-fold must stay exact on images too small for disjoint
    border strips (regression: overlapping corrections double-added)."""
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_larvanet_forward

    rng = np.random.default_rng(0)
    m = get_model("LarvaNet")
    m.parse_args(["--num_blocks", "1,1"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_larvanet_forward(m)
    for hw in [(3, 9), (4, 4), (3, 3)]:
        x = jnp.asarray(rng.uniform(0, 255, (1, *hw, 3)).astype(np.float32))
        ref = np.asarray(m.module.apply({"params": m.params}, x))
        got = np.asarray(jax.jit(fwd)(m.params, x))
        np.testing.assert_allclose(got, ref, atol=0.05)


def test_int8_calib_rejects_odd_width():
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed_trunk import make_int8_treenet_forward

    m = get_model("TreeNet")
    m.parse_args(["--num_common_blocks", "1", "--num_branch_blocks", "1"])
    m.prepare(is_training=False, scales=[4])
    with pytest.raises(ValueError):
        make_int8_treenet_forward(m, np.zeros((1, 8, 7, 3), np.float32))
