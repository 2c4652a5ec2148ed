"""Numerical parity of converted reference checkpoints.

Builds the ACTUAL reference torch modules (read-only import from
/root/reference), converts their random-initialized state dicts with
utils/torch_convert, and checks our flax forward matches the torch
forward on the same input. The reference's MeanShift layers are dead-
weight random frozen convs (they assign `weight_data`, a no-op
attribute — reference models/edsr.py:132-133); for parity we overwrite
them with the intended identity+bias so both sides compute the same
function.
"""

import argparse
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def _fix_meanshift(module, mean=(114.4, 111.5, 103.0)):
    """Write the intended identity weights into the reference MeanShift."""
    import torch

    for name, m in module.named_modules():
        if type(m).__name__ == "MeanShift":
            sign = 1.0 if name in ("mean_shift",) else -1.0
            with torch.no_grad():
                m.weight.copy_(torch.eye(3).view(3, 3, 1, 1))
                m.bias.copy_(sign * torch.tensor(mean))


def test_edsr_pth_roundtrip(rng, tmp_path):
    import torch
    import models.edsr as ref_edsr

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict

    targs = argparse.Namespace(edsr_conv_features=16, edsr_res_blocks=2, edsr_res_weight=1.0)
    tmod = ref_edsr.EDSRModule(targs, scale=4)
    _fix_meanshift(tmod)
    tmod.eval()

    x = rng.uniform(0, 255, (1, 3, 10, 12)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()

    state = {k: v.numpy() for k, v in tmod.state_dict().items()}
    params, skipped = convert_state_dict(state, "edsr")
    assert all("mean" in s for s in skipped)

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "16", "--edsr_res_blocks", "2"])
    m.prepare(is_training=False, scales=[4])
    from flax import serialization

    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def test_larvanet_pth_roundtrip(rng):
    import torch
    import importlib

    ref_larva = importlib.import_module("models.LarvaNet")

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict

    targs = argparse.Namespace(num_modules=2, num_blocks="2,3", interpolate="bicubic")
    tmod = ref_larva.LarvaNetModule(targs)
    tmod.eval()

    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()

    state = {k: v.numpy() for k, v in tmod.state_dict().items()}
    params, skipped = convert_state_dict(state, "LarvaNet")
    assert skipped == []

    m = get_model("LarvaNet")
    m.parse_args(["--num_modules", "2", "--num_blocks", "2,3"])
    m.prepare(is_training=False, scales=[4])
    from flax import serialization

    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def _stub_pytorch_ssim():
    import types

    sys.modules.setdefault("pytorch_ssim", types.ModuleType("pytorch_ssim"))


def test_msrr_reduced_pth_roundtrip(rng):
    import torch
    import importlib

    ref = importlib.import_module("models.msrr_reduced")
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict
    from flax import serialization

    targs = argparse.Namespace(num_blocks=2, res_weight=1.0, interpolate="bicubic")
    tmod = ref.MSRRModule(targs, scale=4)
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    # NOTE: the reference hardcodes scale_factor=4 in its base interpolate,
    # so parity only holds at scale 4 (docstring of models/msrr.py).
    params, _ = convert_state_dict(
        {k: v.numpy() for k, v in tmod.state_dict().items()}, "msrr_reduced")
    m = get_model("msrr_reduced")
    m.parse_args(["--num_blocks", "2"])
    m.prepare(is_training=False, scales=[4])
    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def test_imdn_pth_roundtrip(rng):
    import torch
    import importlib

    _stub_pytorch_ssim()
    ref = importlib.import_module("models.imdn_aim2019")
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict
    from flax import serialization

    targs = argparse.Namespace(num_filters=16, num_blocks=2)
    tmod = ref.IMDN_AIM2019_Module(targs, scale=4)
    _fix_meanshift(tmod)
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    params, skipped = convert_state_dict(
        {k: v.numpy() for k, v in tmod.state_dict().items()}, "imdn_aim2019")
    assert all("mean" in s for s in skipped)
    m = get_model("imdn_aim2019")
    m.parse_args(["--num_filters", "16", "--num_blocks", "2"])
    m.prepare(is_training=False, scales=[4])
    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def test_treenet_pth_roundtrip(rng):
    import torch
    import importlib

    ref = importlib.import_module("models.TreeNet")
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict
    from flax import serialization

    targs = argparse.Namespace(num_common_blocks=1, num_branches=2,
                               num_branch_blocks=1, res_weight=1.0,
                               interpolate="bicubic")
    tmod = ref.TreeNetModule(targs, scale=4)
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()  # forward uses branch_0
    params, _ = convert_state_dict(
        {k: v.numpy() for k, v in tmod.state_dict().items()}, "TreeNet")
    m = get_model("TreeNet")
    m.parse_args(["--num_common_blocks", "1", "--num_branches", "2",
                  "--num_branch_blocks", "1"])
    m.prepare(is_training=False, scales=[4])
    from larvanet_tpu.models.base import _merge_partial
    from flax import serialization as ser

    merged = _merge_partial(ser.to_state_dict(m.params), params)
    m.params = ser.from_state_dict(m.params, merged)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def _roundtrip(ref_mod_path, ref_cls, ref_args, our_name, our_flags, rng,
               fix_meanshift=False, atol=2e-3, input_hw=(8, 8)):
    import torch
    import importlib.util

    if "/" in ref_mod_path:
        spec = importlib.util.spec_from_file_location("refmod", ref_mod_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    else:
        import importlib

        mod = importlib.import_module(ref_mod_path)
    tmod = getattr(mod, ref_cls)(ref_args, scale=4)
    if fix_meanshift:
        _fix_meanshift(tmod)
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, *input_hw)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()

    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict
    from flax import serialization

    params, _ = convert_state_dict(
        {k: v.numpy() for k, v in tmod.state_dict().items()}, our_name)
    m = get_model(our_name)
    m.parse_args(list(our_flags))
    m.prepare(is_training=False, scales=[4])
    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=atol, rtol=1e-4)


def test_mamnet_pth_roundtrip(rng):
    _roundtrip("models.mamnet", "MAMNetModule",
               argparse.Namespace(mamnet_conv_features=16, mamnet_res_blocks=2, mamnet_res_weight=1.0),
               "mamnet", ["--mamnet_conv_features", "16", "--mamnet_res_blocks", "2"],
               rng, fix_meanshift=True)


def test_msrr_pth_roundtrip(rng):
    _roundtrip("models.msrr", "MSRRModule",
               argparse.Namespace(num_filters=16, num_blocks=2, res_weight=1.0),
               "msrr", ["--num_filters", "16", "--num_blocks", "2"], rng)


def test_ebrn_rm_pth_roundtrip(rng):
    _roundtrip("models.ebrn_rm", "EBRNModule",
               argparse.Namespace(num_filters=8, num_brms=2),
               "ebrn_rm", ["--num_filters", "8", "--num_brms", "2"],
               rng, fix_meanshift=True)


def test_hrsr_pth_roundtrip(rng):
    _roundtrip("models.hrsr", "MSRRModule",
               argparse.Namespace(num_lr_blocks=2, num_hr_blocks=1, num_hr_filters=4,
                                  hr_filter_size=3, interpolate="bilinear"),
               "hrsr", ["--num_lr_blocks", "2", "--num_hr_blocks", "1",
                        "--num_hr_filters", "4"], rng)


def test_rego_pth_roundtrip(rng):
    _roundtrip("/root/reference/models/REGO-Net.py", "REGOModule",
               argparse.Namespace(num_filters=8, len_side=2, res_weight=1.0, interpolate="bilinear"),
               "REGO-Net", ["--num_filters", "8", "--len_side", "2"],
               rng, fix_meanshift=True)


def test_ebrn_full_pth_roundtrip(rng):
    """Full EBRN incl. ConvTranspose up-projection (kernel flip) and
    per-channel PReLU slopes."""
    _stub_pytorch_ssim()
    _roundtrip("models.ebrn", "EBRNModule",
               argparse.Namespace(num_filters=8, num_brms=2),
               "ebrn", ["--num_filters", "8", "--num_brms", "2"],
               rng, fix_meanshift=True)


def test_larvanetv2_pth_roundtrip(rng):
    """V2 incl. the tail merge/recon conversion path."""
    _stub_pytorch_ssim()
    import torch
    import importlib

    ref = importlib.import_module("models.LarvaNetV2")
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict
    from flax import serialization

    targs = argparse.Namespace(num_modules=2, num_blocks="1,2", interpolate="bicubic")
    tmod = ref.LarvaNetModule(targs)
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    params, _ = convert_state_dict(
        {k: v.numpy() for k, v in tmod.state_dict().items()}, "LarvaNetV2")
    m = get_model("LarvaNetV2")
    m.parse_args(["--num_modules", "2", "--num_blocks", "1,2"])
    m.prepare(is_training=False, scales=[4])
    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def test_msrr_test_pth_roundtrip(rng):
    _roundtrip("models.msrr_test", "MSRRModule",
               argparse.Namespace(num_filters=8, num_blocks=1, res_weight=1.0),
               "msrr_test", ["--num_filters", "8", "--num_blocks", "1"], rng)


def test_dwsr_pth_roundtrip(rng):
    _roundtrip("models.dwsr_reduced", "MSRRModule",
               argparse.Namespace(num_blocks=1, res_weight=1.0, interpolate="bilinear"),
               "dwsr_reduced", ["--num_blocks", "1"], rng)


@pytest.mark.parametrize("variant", ["LarvaNet_0c", "LarvaNet_1c", "LarvaNet_skip", "LarvaNet_res"])
def test_larvanet_variant_pth_roundtrips(variant, rng):
    import torch
    import importlib

    ref = importlib.import_module("models.%s" % variant)
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import convert_state_dict
    from flax import serialization

    targs = argparse.Namespace(num_modules=2, num_blocks="1,2", interpolate="bicubic")
    tmod = ref.LarvaNetModule(targs)
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    params, _ = convert_state_dict(
        {k: v.numpy() for k, v in tmod.state_dict().items()}, variant)
    m = get_model(variant)
    m.parse_args(["--num_modules", "2", "--num_blocks", "1,2"])
    m.prepare(is_training=False, scales=[4])
    m.params = serialization.from_state_dict(m.params, params)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def test_msrr_leaky_ablation_roundtrip(rng):
    _roundtrip("models.msrr_reduced_leaky", "MSRRModule",
               argparse.Namespace(num_blocks=1, res_weight=1.0, interpolate="bilinear", slope=0.2),
               "msrr_reduced_leaky", ["--num_blocks", "1", "--slope", "0.2"], rng)
