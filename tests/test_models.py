"""Model zoo structural tests: registration, shapes, parameter-count
parity with the reference's analytically derived budgets (SURVEY.md §6,
BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model, list_models


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def _prepare(name, extra_args=(), scales=(4,), training=False):
    m = get_model(name)
    _, remaining = m.parse_args(list(extra_args))
    assert remaining == []
    m.prepare(is_training=training, scales=list(scales))
    return m


def test_registry_has_core_models():
    names = list_models()
    for required in ["edsr", "edsr_loss", "LarvaNet", "LarvaNetV2", "LarvaLeg"]:
        assert required in names


def test_edsr_param_count_matches_reference():
    # 1,517,571 trainable (reference models/edsr.py:177-193 derived;
    # the reference also carries 24 frozen MeanShift params we fold away).
    m = _prepare("edsr")
    assert _param_count(m.params) == 1_517_571


def test_edsr_output_shape_and_range(rng):
    m = _prepare("edsr")
    x = rng.uniform(0, 255, size=(3, 12, 14)).astype(np.float32)
    out = m.upscale([x], scale=4)
    assert out.shape == (1, 3, 48, 56)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_edsr_scales(scale, rng):
    m = _prepare("edsr", scales=(scale,))
    x = rng.uniform(0, 255, size=(3, 8, 8)).astype(np.float32)
    out = m.upscale([x], scale=scale)
    assert out.shape == (1, 3, 8 * scale, 8 * scale)


def test_larvanet_param_count_matches_reference():
    # M=2 modules x 8 blocks => 749,568 (models/LarvaNet.py:205-267 derived)
    m = _prepare("LarvaNet", ["--num_modules", "2", "--num_blocks", "8,8"])
    assert _param_count(m.params) == 749_568


def test_larvanet_multi_exit_outputs(rng):
    m = _prepare("LarvaNet", ["--num_blocks", "4,4"], training=True)
    x = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    outs = m.module.apply({"params": m.params}, x, exits="all")
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (2, 32, 32, 3)


def test_larvanet_num_blocks_mismatch_raises():
    m = get_model("LarvaNet")
    m.parse_args(["--num_modules", "2", "--num_blocks", "16"])
    with pytest.raises(ValueError):
        m.prepare(is_training=False, scales=[4])


def test_larvanetv2_tail_adds_exit(rng):
    m = _prepare("LarvaNetV2", ["--num_blocks", "2,2"], training=True)
    x = jnp.asarray(rng.uniform(0, 255, (1, 8, 8, 3)).astype(np.float32))
    outs = m.module.apply({"params": m.params}, x, exits="all")
    assert len(outs) == 3  # 2 legs + tail


def test_larvaleg_early_exit_levels(rng):
    x_np = rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)
    # leg=0 returns the pure interpolated base (reference LarvaLeg.py:289-299)
    m0 = _prepare("LarvaLeg", ["--num_blocks", "2,2", "--leg", "0"])
    out0 = m0.upscale([x_np], scale=4)[0]
    from larvanet_tpu.ops.resize import upsample

    base = np.asarray(upsample(x_np[None].transpose(0, 2, 3, 1), 4, "bicubic"))[0].transpose(2, 0, 1)
    np.testing.assert_allclose(out0, base, atol=1e-4)

    m1 = _prepare("LarvaLeg", ["--num_blocks", "2,2", "--leg", "1"])
    out1 = m1.upscale([x_np], scale=4)[0]
    assert out1.shape == (3, 32, 32)
    assert not np.allclose(out1, base, atol=1e-3)


def test_variant_topologies_build(rng):
    x = rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)
    for name in ["LarvaNet_0c", "LarvaNet_1c", "LarvaNet_4c", "LarvaNet_skip", "LarvaNet_res"]:
        m = _prepare(name, ["--num_blocks", "2,2"])
        out = m.upscale([x], scale=4)
        assert out.shape == (1, 3, 32, 32), name


def test_leg_style_param_deltas():
    base = _param_count(_prepare("LarvaNet", ["--num_blocks", "2,2"]).params)
    no_recon = _param_count(_prepare("LarvaNet_0c", ["--num_blocks", "2,2"]).params)
    one_block = _param_count(_prepare("LarvaNet_1c", ["--num_blocks", "2,2"]).params)
    # 0c drops both recon convs of each of 2 legs: 2 legs * 41568
    assert base - no_recon == 2 * 41_568
    # 1c has a ResBlock (same 2-conv size) per leg: equal count to base
    assert one_block == base


def test_train_step_decreases_loss(rng):
    m = _prepare("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"], training=True)
    x = [rng.uniform(0, 255, (3, 8, 8)).astype(np.float32) for _ in range(2)]
    y = [rng.uniform(0, 255, (3, 32, 32)).astype(np.float32) for _ in range(2)]
    losses = [m.train_step(x, 4, y) for _ in range(5)]
    assert losses[-1] < losses[0]
    assert m.global_step == 5


def test_save_restore_roundtrip(tmp_path, rng):
    m = _prepare("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"], training=True)
    x = [rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)]
    y = [rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)]
    m.train_step(x, 4, y)
    path = m.save(str(tmp_path))
    out_before = m.upscale(x, 4)

    m2 = _prepare("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"], training=True)
    m2.restore(path)
    assert m2.global_step == 1
    np.testing.assert_allclose(m2.upscale(x, 4), out_before, atol=1e-6)
    # optimizer state restored too: next steps match bit-for-bit
    l1 = m.train_step(x, 4, y)
    l2 = m2.train_step(x, 4, y)
    assert l1 == pytest.approx(l2, rel=1e-6)


def test_multi_scale_rejected():
    m = get_model("edsr")
    m.parse_args([])
    with pytest.raises(ValueError):
        m.prepare(is_training=False, scales=[2, 4])


def test_psnr_on_device_matches_host_protocol(rng):
    from larvanet_tpu.eval import metrics

    m = _prepare("edsr", ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    inp = rng.uniform(0, 255, (3, 9, 11)).astype(np.float32)
    tru = rng.uniform(0, 255, (3, 38, 46)).astype(np.float32)
    got = m.psnr_on_device(inp, tru)
    out = m.upscale([inp], 4)[0]
    o8 = metrics.image_to_uint8(out)
    t8 = metrics.fit_truth_to_output(o8, metrics.image_to_uint8(tru))
    want = metrics.psnr_rgb(o8, t8)
    assert abs(got - want) < 1e-3


def test_restore_accepts_reference_pth(tmp_path, rng):
    """--restore_path model.pth loads a reference torch checkpoint
    directly through the converter rules (round-2 migration path)."""
    import os

    import pytest
    import sys

    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    from tools import protocol_parity as pp

    pp.setup_reference()
    wrapper = pp.make_reference_model(
        "edsr", ["--edsr_conv_features", "8", "--edsr_res_blocks", "1"], 4)
    pth = pp.save_reference_checkpoint(wrapper, str(tmp_path / "m.pth"))

    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    m.prepare(is_training=False, scales=[4])
    m.restore(ckpt_path=pth)
    x = rng.uniform(0, 255, (1, 3, 8, 10)).astype(np.float32)
    ours = m.upscale([x[0]], scale=4)[0]
    import torch

    with torch.no_grad():
        ref = wrapper.upscale(input_list=[x[0]], scale=4)[0]
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)

    # wrong-architecture .pth must fail loudly (shape validation)
    m2 = get_model("edsr")
    m2.parse_args(["--edsr_conv_features", "16", "--edsr_res_blocks", "1"])
    m2.prepare(is_training=False, scales=[4])
    with pytest.raises(ValueError, match="shape mismatch"):
        m2.restore(ckpt_path=pth)


def test_larvanet_lr_domain_loss_equals_hr(rng):
    """--lr_domain_loss on the multi-exit family: per-element grads are
    IDENTICAL to the HR-domain loss for every exit config (plain + V2
    tail); the loss scalar differs only in f32 summation order
    (ops/packed/larvanet.py LR-domain branch)."""
    import jax

    from larvanet_tpu.core.registry import get_model

    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32))
    for name in ("LarvaNet", "LarvaNetV2"):
        got = {}
        for flag in (0, 1):
            m = get_model(name)
            m.parse_args(["--num_blocks", "2,2",
                          "--lr_domain_loss", str(flag)])
            m.prepare(is_training=True, scales=[4])
            loss, grads = jax.value_and_grad(m._compute_loss)(m.params, x, t)
            got[flag] = (float(loss),
                         np.asarray(jax.flatten_util.ravel_pytree(grads)[0]))
        assert abs(got[0][0] - got[1][0]) < 1e-4 * max(got[0][0], 1.0), name
        np.testing.assert_array_equal(got[1][1], got[0][1], err_msg=name)


def test_msrr_reduced_training_save_restore_roundtrip(tmp_path):
    """msrr_reduced borrows LarvaNetBase's volume-driven machinery, but
    _state_dict/_load_state_dict must be defined on the class itself:
    borrowing them as unbound functions left zero-arg super() bound to
    LarvaNetBase's __class__ cell, so cli/train's final save crashed
    with "super(type, obj): obj must be an instance or subtype of type"
    (round-5 regression on the real recipe; msrr.py:459)."""
    from larvanet_tpu.core.registry import get_model

    m = get_model("msrr_reduced")
    m.parse_args(["--num_blocks", "2"])
    m.prepare(is_training=True, scales=[4])
    m.global_step, m.total_volume = 7, 3.0e9
    m.scheduler.step(20.0)  # give the plateau scheduler history to persist
    path = m.save(str(tmp_path))
    assert path.endswith("model_step7_vol3G.ckpt")

    m2 = get_model("msrr_reduced")
    m2.parse_args(["--num_blocks", "2"])
    m2.prepare(is_training=True, scales=[4])
    m2.restore(ckpt_path=path)
    assert m2.global_step == 7 and m2.total_volume == 3.0e9
    assert m2.scheduler.state_dict() == m.scheduler.state_dict()
