"""Trained-MeanShift import parity (advisor r2, medium).

The reference MeanShift constructor assigns `weight_data`, never
`weight.data` (reference models/edsr.py:131-133), so its frozen 1x1
shifts stay RANDOM and a genuinely trained reference checkpoint was
trained around them. These tests keep the reference modules' natural
random shifts (no identity rewrite) — exactly what a real user
checkpoint carries — save them as a .pth, restore through our real
`--restore_path` flow, and check that our forward matches the torch
forward bit-tightly. The mechanism is a module-level affine override
(layers.MeanShift.affine) installed by models/base.py._restore_pth; a
params-level fold cannot be exact because the reference applies the
affine BEFORE zero-padding and the border error spreads one pixel per
subsequent conv.

Families covered: edsr (both shifts, plain adjacency), imdn (inverse
shift behind a PixelShuffle), msrr_reduced_meanshift (inverse shift
behind a conv-free residual add — unfoldable at params level),
REGO-Net (forward-only shift + bilinear base on RAW x), msrr (shifts
present in the state dict but dead in the reference forward).
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


def _stub_pytorch_ssim():
    import types

    if "pytorch_ssim" not in sys.modules:
        sys.modules["pytorch_ssim"] = types.ModuleType("pytorch_ssim")


def _load_ref(mod_path):
    import importlib
    import importlib.util

    _stub_pytorch_ssim()
    if "/" in mod_path:
        spec = importlib.util.spec_from_file_location("refmod_msfold", mod_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    return importlib.import_module(mod_path)


def _restore_roundtrip(mod_path, cls, targs, our_name, our_flags, rng, tmp_path,
                       atol=2e-3, input_hw=(8, 8)):
    import torch

    from larvanet_tpu.core.registry import get_model

    tmod = getattr(_load_ref(mod_path), cls)(targs, scale=4)
    tmod.eval()  # MeanShift left at its natural random init
    x = rng.uniform(0, 255, (1, 3, *input_hw)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()

    pth = str(tmp_path / "trained.pth")
    torch.save(tmod.state_dict(), pth)

    m = get_model(our_name)
    m.parse_args(list(our_flags))
    m.prepare(is_training=False, scales=[4])
    m.restore(pth)
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=atol, rtol=1e-4)
    return m


def test_edsr_random_meanshift_restores_exactly(rng, tmp_path):
    m = _restore_roundtrip(
        "models.edsr", "EDSRModule",
        argparse.Namespace(edsr_conv_features=16, edsr_res_blocks=2,
                           edsr_res_weight=1.0),
        "edsr", ["--edsr_conv_features", "16", "--edsr_res_blocks", "2"],
        rng, tmp_path)
    assert m.module.ms_affine is not None and m.module.mis_affine is not None
    # fast paths bake the intended shifts: they must refuse this model
    from larvanet_tpu.ops.fastpath import build_fast_forward
    import jax.numpy as jnp

    fast, desc = build_fast_forward(m, jnp.float32)
    assert fast is None


def test_imdn_random_meanshift_restores_exactly(rng, tmp_path):
    _restore_roundtrip(
        "models.imdn_aim2019", "IMDN_AIM2019_Module",
        argparse.Namespace(num_filters=16, num_blocks=2),
        "imdn_aim2019", ["--num_filters", "16", "--num_blocks", "2"],
        rng, tmp_path)


def test_msrr_reduced_meanshift_restores_exactly(rng, tmp_path):
    # inverse shift sits behind a conv-free residual add + PixelShuffle:
    # the case no params-level fold could represent
    _restore_roundtrip(
        "models.msrr_reduced_meanshift", "MSRRModule",
        argparse.Namespace(num_blocks=1, res_weight=1.0, interpolate="bilinear"),
        "msrr_reduced_meanshift", ["--num_blocks", "1"],
        rng, tmp_path)


def test_rego_random_forward_meanshift_restores_exactly(rng, tmp_path):
    _restore_roundtrip(
        "/root/reference/models/REGO-Net.py", "REGOModule",
        argparse.Namespace(num_filters=8, len_side=2, res_weight=1.0,
                           interpolate="bilinear"),
        "REGO-Net", ["--num_filters", "8", "--len_side", "2"],
        rng, tmp_path)


def test_msrr_dead_meanshift_is_ignored(rng, tmp_path):
    # reference models/msrr.py:218 constructs mean_shift but the forward
    # (:239-248) never calls it — random values must be irrelevant and
    # install no override
    m = _restore_roundtrip(
        "models.msrr", "MSRRModule",
        argparse.Namespace(num_filters=16, num_blocks=2, res_weight=1.0),
        "msrr", ["--num_filters", "16", "--num_blocks", "2"], rng, tmp_path)
    assert getattr(m.module, "ms_affine", None) is None


def test_intended_meanshift_installs_no_override(rng, tmp_path, capsys):
    import torch

    from larvanet_tpu.core.registry import get_model

    tmod = _load_ref("models.edsr").EDSRModule(
        argparse.Namespace(edsr_conv_features=8, edsr_res_blocks=1,
                           edsr_res_weight=1.0), scale=4)
    with torch.no_grad():
        for name, mod in tmod.named_modules():
            if type(mod).__name__ == "MeanShift":
                sign = 1.0 if name == "mean_shift" else -1.0
                mod.weight.copy_(torch.eye(3).view(3, 3, 1, 1))
                mod.bias.copy_(sign * torch.tensor([114.4, 111.5, 103.0]))
    pth = str(tmp_path / "intended.pth")
    torch.save(tmod.state_dict(), pth)

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    m.prepare(is_training=False, scales=[4])
    m.restore(pth)
    assert m.module.ms_affine is None and m.module.mis_affine is None
    assert "installed" not in capsys.readouterr().out
