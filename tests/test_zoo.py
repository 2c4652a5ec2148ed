"""Whole-zoo structural tests: every reference model name builds, runs a
tiny forward at its configured scale, and produces the right shape.
Configs are kept tiny to bound CPU compile time."""

import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model, list_models

# (name, extra flags) — tiny configs
ZOO = [
    ("edsr", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"]),
    ("edsr_loss", ["--edsr_res_blocks", "2", "--edsr_conv_features", "8"]),
    ("mamnet", ["--mamnet_res_blocks", "2", "--mamnet_conv_features", "16"]),
    ("msrr", ["--num_blocks", "2", "--num_filters", "8"]),
    ("msrr_reduced", ["--num_blocks", "2"]),
    ("msrr_reduced_def_init", ["--num_blocks", "2"]),
    ("msrr_reduced_NI", ["--num_blocks", "2"]),
    ("msrr_reduced_linear", ["--num_blocks", "2"]),
    ("msrr_reduced_relu6", ["--num_blocks", "2"]),
    ("msrr_reduced_leaky", ["--num_blocks", "2", "--slope", "0.2"]),
    ("msrr_reduced_meanshift", ["--num_blocks", "2"]),
    ("dwsr_reduced", ["--num_blocks", "2"]),
    ("msrr_test", ["--num_blocks", "2", "--num_filters", "8"]),
    ("ebrn", ["--num_brms", "2", "--num_filters", "8"]),
    ("ebrn_rm", ["--num_brms", "2", "--num_filters", "8"]),
    ("ebrn_rm_BLI", ["--num_brms", "2", "--num_filters", "8"]),
    ("imdn_aim2019", ["--num_blocks", "2", "--num_filters", "8"]),
    ("hrsr", ["--num_lr_blocks", "2", "--num_hr_blocks", "1"]),
    ("hrsr_", ["--num_lr_blocks", "2", "--num_hr_blocks", "1"]),
    ("hrsr_c3", ["--num_lr_blocks", "2", "--num_hr_blocks", "1"]),
    ("REGO-Net", ["--len_side", "2", "--num_filters", "8"]),
    ("REGO-serial", ["--len_side", "2", "--num_filters", "8", "--num_regos", "2"]),
    ("TreeNet", ["--num_common_blocks", "1", "--num_branches", "2", "--num_branch_blocks", "1"]),
    ("LarvaNet", ["--num_blocks", "2,2"]),
    # TPU-native extension: MXU-native 64-wide trunk (packs to 128 ch)
    ("LarvaNet_w64", ["--num_blocks", "2,2"]),
]


def test_all_reference_model_names_registered():
    """Every model file in the reference zoo has a registered counterpart
    (SURVEY.md §2.3 inventory)."""
    names = set(list_models())
    expected = {
        "edsr", "edsr_loss", "mamnet", "msrr", "msrr_reduced",
        "msrr_reduced_def_init", "msrr_reduced_NI", "msrr_reduced_linear",
        "msrr_reduced_relu6", "msrr_reduced_leaky", "msrr_reduced_meanshift",
        "dwsr_reduced", "msrr_test", "hrsr", "hrsr_", "hrsr_c3", "ebrn",
        "ebrn_rm", "ebrn_rm_BLI", "imdn_aim2019", "LarvaNet", "LarvaNet_0c",
        "LarvaNet_1c", "LarvaNet_4c", "LarvaNet_skip", "LarvaNet_res",
        "LarvaNetV2", "LarvaLeg", "LarvaLegV2", "REGO-Net", "REGO-serial",
        "TreeNet",
    }
    missing = expected - names
    assert not missing, "missing models: %s" % (sorted(missing),)


@pytest.mark.parametrize("name,flags", ZOO, ids=[z[0] for z in ZOO])
def test_forward_shape(name, flags, rng):
    m = get_model(name)
    _, remaining = m.parse_args(list(flags))
    assert remaining == [], "unconsumed flags for %s: %s" % (name, remaining)
    m.prepare(is_training=False, scales=[4])
    x = rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)
    out = m.upscale([x], scale=4)
    assert out.shape == (1, 3, 32, 32), name
    assert np.all(np.isfinite(out)), name


@pytest.mark.parametrize("name,flags", [
    ("msrr", ["--num_blocks", "1", "--num_filters", "8"]),
    ("imdn_aim2019", ["--num_blocks", "1", "--num_filters", "8"]),
    ("ebrn", ["--num_brms", "2", "--num_filters", "8"]),
], ids=["msrr", "imdn", "ebrn"])
@pytest.mark.parametrize("scale", [2, 3])
def test_other_scales(name, flags, scale, rng):
    m = get_model(name)
    m.parse_args(list(flags))
    m.prepare(is_training=False, scales=[scale])
    x = rng.uniform(0, 255, (3, 6, 6)).astype(np.float32)
    out = m.upscale([x], scale=scale)
    assert out.shape == (1, 3, 6 * scale, 6 * scale)


def test_treenet_branches_and_partial_restore(tmp_path, rng):
    m = get_model("TreeNet")
    m.parse_args(["--num_common_blocks", "1", "--num_branches", "2", "--num_branch_blocks", "1"])
    m.prepare(is_training=True, scales=[4])
    x = [rng.uniform(0, 255, (3, 8, 8)).astype(np.float32)]
    y = [rng.uniform(0, 255, (3, 32, 32)).astype(np.float32)]
    m.volume_per_step = 1
    loss = m.train_step_larva(None, None, x, y)
    assert np.isfinite(loss)
    # branch-specific eval paths differ (independent branches)
    b0 = m.upscale_branch(x, 4, 0)
    b1 = m.upscale_branch(x, 4, 1)
    assert b0.shape == b1.shape == (1, 3, 32, 32)
    assert not np.allclose(b0, b1)
    # strict=False restore into a model with more branches keeps extras
    path = m.save(str(tmp_path))
    m2 = get_model("TreeNet")
    m2.parse_args(["--num_common_blocks", "1", "--num_branches", "3", "--num_branch_blocks", "1"])
    m2.prepare(is_training=False, scales=[4])
    m2.restore(path)
    np.testing.assert_allclose(m2.upscale_branch(x, 4, 0), b0, atol=2e-5)


def test_msrr_reduced_volume_training(rng):
    m = get_model("msrr_reduced")
    m.parse_args(["--num_blocks", "1", "--val_volume", "1e12"])
    m.prepare(is_training=True, scales=[4])
    m.volume_per_step = 100
    x = [rng.uniform(0, 255, (3, 8, 8)).astype(np.float32) for _ in range(2)]
    y = [rng.uniform(0, 255, (3, 32, 32)).astype(np.float32) for _ in range(2)]
    l1 = m.train_step_larva(None, None, x, y)
    l2 = m.train_step_larva(None, None, x, y)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert m.global_step == 2


def test_ebrn_convtranspose_shapes(rng):
    """The torch ConvTranspose geometry (k,s,p)=(8,4,2) must give out=4*in."""
    import jax.numpy as jnp

    from larvanet_tpu.models.layers import ConvTranspose2dTorch

    mod = ConvTranspose2dTorch(4, 8, 4, 2)
    import jax

    v = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 7, 3)))
    out = mod.apply(v, jnp.zeros((1, 5, 7, 3)))
    assert out.shape == (1, 20, 28, 4)
