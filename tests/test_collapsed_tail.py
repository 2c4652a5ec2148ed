"""Collapsed linear tail: exact equivalence with the original EDSR
forward (including borders, via halo-strip stitching)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy parity tier (--runslow); fast smoke: test_fastpath_smoke.py

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_matches_original_forward(scale, rng):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "16", "--edsr_res_blocks", "2"])
    m.prepare(is_training=False, scales=[scale])
    fwd = make_collapsed_edsr_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (1, 13, 17, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    assert got.shape == ref.shape
    # float-reassociation tolerance: composed conv sums ~1600 products at
    # once; relative error ~1e-4 on the [0,255] scale.
    np.testing.assert_allclose(got, ref, atol=0.1)


def test_multiple_shapes_share_kernel(rng):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_edsr_forward(m)
    for hw in [(9, 9), (12, 20)]:
        x = jnp.asarray(rng.uniform(0, 255, (1, *hw, 3)).astype(np.float32))
        ref = np.asarray(m.module.apply({"params": m.params}, x))
        got = np.asarray(jax.jit(fwd)(m.params, x))
        np.testing.assert_allclose(got, ref, atol=0.1)


def test_res_weight_respected(rng):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "2",
                  "--edsr_res_weight", "0.1"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_edsr_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (1, 10, 10, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.1)


def test_larvanet_base_fold_exact(rng):
    """Exactness of the (measured-slower, unwired) LarvaNet base fold."""
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_larvanet_forward

    m = get_model("LarvaNet")
    m.parse_args(["--num_blocks", "2,3"])
    m.prepare(is_training=False, scales=[4])
    fwd = make_collapsed_larvanet_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (1, 13, 17, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_larvanet_base_fold_rejects_other_configs():
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_larvanet_forward

    m = get_model("LarvaNetV2")
    m.parse_args(["--num_blocks", "1,1"])
    m.prepare(is_training=False, scales=[4])
    with pytest.raises(ValueError):
        make_collapsed_larvanet_forward(m)


def test_live_tail_composition_matches_probe(rng):
    """The in-graph (differentiable) delta-probe composition equals the
    numeric probe extraction for every upsample-chain shape."""
    from flax import serialization

    from larvanet_tpu.ops.collapsed_tail import (
        extract_collapsed_kernel, live_collapsed_edsr_tail)

    for scale in (2, 3, 4):
        m = get_model("edsr")
        m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
        m.prepare(is_training=False, scales=[scale])
        sp = serialization.to_state_dict(m.params)
        kernel, bias_tile, tail_fn = live_collapsed_edsr_tail(sp, scale)
        ref = extract_collapsed_kernel(tail_fn, 8, scale, radius=3)
        r = kernel.shape[0] // 2
        t = 3 - r
        if t > 0:
            assert not np.any(ref[:t]) and not np.any(ref[-t:])
            ref = ref[t:-t, t:-t]
        np.testing.assert_allclose(np.asarray(kernel), ref, atol=1e-5)
        canvas = 14
        cc = canvas // 2
        zr = np.asarray(tail_fn(jnp.zeros((1, canvas, canvas, 8), jnp.float32)))
        np.testing.assert_allclose(
            np.asarray(bias_tile),
            zr[0, cc * scale:(cc + 1) * scale, cc * scale:(cc + 1) * scale],
            atol=1e-5)


@pytest.mark.parametrize("hw", [(12, 16), (11, 13)])
def test_packed_collapsed_train_forward_matches(hw, rng):
    from larvanet_tpu.ops.packed_trunk import (
        make_packed_collapsed_edsr_train_forward)

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "2",
                  "--edsr_res_weight", "0.5"])
    m.prepare(is_training=True, scales=[4])
    fwd = make_packed_collapsed_edsr_train_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (2, *hw, 3)).astype(np.float32))
    ref = np.asarray(m.module.apply({"params": m.params}, x))
    got = np.asarray(jax.jit(fwd)(m.params, x))
    np.testing.assert_allclose(got, ref, atol=0.1)


def test_packed_collapsed_train_grads_match(rng):
    """Gradients through the live collapsed tail equal the plain graph's
    for EVERY parameter (trunk AND the composed upsample/final convs)."""
    from larvanet_tpu.ops.packed_trunk import (
        make_packed_collapsed_edsr_train_forward)

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    m.prepare(is_training=True, scales=[4])
    fwd = make_packed_collapsed_edsr_train_forward(m)
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32))

    gr = jax.grad(lambda p: jnp.mean(jnp.abs(
        m.module.apply({"params": p}, x) - t)))(m.params)
    gn = jax.grad(lambda p: jnp.mean(jnp.abs(fwd(p, x) - t)))(m.params)
    fr = np.asarray(jax.flatten_util.ravel_pytree(gr)[0])
    fn = np.asarray(jax.flatten_util.ravel_pytree(gn)[0])
    scale = max(np.abs(fr).max(), 1.0)
    np.testing.assert_allclose(fn, fr, atol=2e-4 * scale)


def test_lr_domain_loss_equals_hr(rng):
    """--lr_domain_loss: the pre-shuffle LR-domain output is EXACTLY the
    permuted HR output (pixel_shuffle of it is bitwise-equal), so the
    mean-L1 loss against unshuffled targets has identical per-element
    grads and a loss value equal up to f32 summation order (the model-
    level wiring in models/edsr.py _compute_loss)."""
    from larvanet_tpu.ops.packed_trunk import (
        make_packed_collapsed_edsr_train_forward)
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "2"])
    m.prepare(is_training=True, scales=[4])
    fwd_hr = make_packed_collapsed_edsr_train_forward(m)
    fwd_lr = make_packed_collapsed_edsr_train_forward(m, lr_domain=True)
    x = jnp.asarray(rng.uniform(0, 255, (2, 20, 24, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 80, 96, 3)).astype(np.float32))

    o_hr = np.asarray(jax.jit(fwd_hr)(m.params, x))
    o_lr = np.asarray(jax.jit(lambda p, z: pixel_shuffle(fwd_lr(p, z), 4))(
        m.params, x))
    np.testing.assert_array_equal(o_lr, o_hr)

    l1, g1 = jax.value_and_grad(
        lambda p: jnp.mean(jnp.abs(fwd_hr(p, x) - t)))(m.params)
    l2, g2 = jax.value_and_grad(
        lambda p: jnp.mean(jnp.abs(fwd_lr(p, x) - pixel_unshuffle(t, 4))))(
            m.params)
    assert abs(float(l1) - float(l2)) < 1e-4 * max(float(l1), 1.0)
    f1 = np.asarray(jax.flatten_util.ravel_pytree(g1)[0])
    f2 = np.asarray(jax.flatten_util.ravel_pytree(g2)[0])
    np.testing.assert_array_equal(f2, f1)


def test_lr_domain_loss_model_wiring(rng):
    """EDSR._compute_loss with --lr_domain_loss 1 (default) matches the
    HR-domain loss (--lr_domain_loss 0) on the same params/batch."""
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32))
    losses = {}
    for flag in (0, 1):
        m = get_model("edsr")
        m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1",
                      "--lr_domain_loss", str(flag)])
        m.prepare(is_training=True, scales=[4])
        losses[flag] = float(m._compute_loss(m.params, x, t))
    assert abs(losses[0] - losses[1]) < 1e-4 * max(losses[0], 1.0)


@pytest.mark.parametrize("mode,scale", [("bicubic", 4), ("bilinear", 4),
                                        ("bicubic", 3), ("bicubic", 2),
                                        ("nearest", 4), ("nearest", 2)])
def test_collapsed_base_exact(mode, scale, rng):
    """LR-domain collapsed interpolated base (probed conv + border ops,
    incl. the resampler's edge clamp) equals the resampler exactly.
    Measured slightly SLOWER than the phase-sliced resampler when wired
    into the packed LarvaNet forward (BASELINE.md negative result);
    kept as a tested utility."""
    from larvanet_tpu.ops.collapsed_tail import make_collapsed_base
    from larvanet_tpu.ops.resize import upsample
    from larvanet_tpu.ops.pixel_shuffle import pixel_shuffle

    base_lr = make_collapsed_base(scale, mode)
    for hw in [(12, 16), (11, 13), (3, 3)]:
        x = jnp.asarray(rng.uniform(0, 255, (2, *hw, 3)).astype(np.float32))
        ref = np.asarray(upsample(x, scale, mode))
        got = np.asarray(pixel_shuffle(jax.jit(base_lr)(x), scale))
        np.testing.assert_allclose(got, ref, atol=2e-3)
