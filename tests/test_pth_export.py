"""Export parity: flax params -> reference-loadable .pth.

The inverse of tests/test_torch_convert.py: utils/torch_convert.
export_state_dict must produce a state dict the reference's own strict
restore (`load_state_dict(torch.load(path))`, reference models/base.py:66)
accepts, computing the same function.

Two layers of evidence:
1. Rule round-trip, every family: reference random state dict S ->
   convert_state_dict -> export_state_dict == S byte-identically for all
   non-MeanShift keys (the transposes are exact inverses), and the
   synthesized MeanShift keys carry the intended identity+bias (the
   reference constructor leaves them random — models/edsr.py:132-133).
2. Deploy: OUR freshly initialized model -> save_pth -> the ACTUAL
   reference torch module restores it strict and its forward matches our
   upscale (covers conv, ConvTranspose kernel flip, PReLU slopes).
"""

import argparse
import importlib
import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def _load_ref(mod_path):
    if "/" in mod_path:
        spec = importlib.util.spec_from_file_location("refmod_exp", mod_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    return importlib.import_module(mod_path)


def _stub_pytorch_ssim():
    """models.ebrn imports pytorch_ssim at module import time."""
    if "pytorch_ssim" not in sys.modules:
        import types
        import torch

        stub = types.ModuleType("pytorch_ssim")
        stub.SSIM = lambda *a, **k: (lambda x, y: torch.tensor(0.0))
        sys.modules["pytorch_ssim"] = stub


# (ref module, class, ref ctor args, our registry name, needs scale kwarg)
FAMILIES = [
    ("models.edsr", "EDSRModule",
     argparse.Namespace(edsr_conv_features=16, edsr_res_blocks=2, edsr_res_weight=1.0),
     "edsr", True),
    ("models.LarvaNet", "LarvaNetModule",
     argparse.Namespace(num_modules=2, num_blocks="2,3", interpolate="bicubic"),
     "LarvaNet", False),
    ("models.LarvaNetV2", "LarvaNetModule",
     argparse.Namespace(num_modules=2, num_blocks="1,2", interpolate="bicubic"),
     "LarvaNetV2", False),
    ("models.LarvaNet_1c", "LarvaNetModule",
     argparse.Namespace(num_modules=2, num_blocks="1,2", interpolate="bicubic"),
     "LarvaNet_1c", False),
    ("models.msrr_reduced", "MSRRModule",
     argparse.Namespace(num_blocks=2, res_weight=1.0, interpolate="bicubic"),
     "msrr_reduced", True),
    ("models.msrr_reduced_meanshift", "MSRRModule",
     argparse.Namespace(num_blocks=1, res_weight=1.0, interpolate="bilinear"),
     "msrr_reduced_meanshift", True),
    ("models.imdn_aim2019", "IMDN_AIM2019_Module",
     argparse.Namespace(num_filters=16, num_blocks=2),
     "imdn_aim2019", True),
    ("models.TreeNet", "TreeNetModule",
     argparse.Namespace(num_common_blocks=1, num_branches=2, num_branch_blocks=1,
                        interpolate="bicubic", res_weight=1.0),
     "TreeNet", True),
    ("models.mamnet", "MAMNetModule",
     argparse.Namespace(mamnet_conv_features=16, mamnet_res_blocks=2, mamnet_res_weight=1.0),
     "mamnet", True),
    ("models.msrr", "MSRRModule",
     argparse.Namespace(num_filters=16, num_blocks=2, res_weight=1.0),
     "msrr", True),
    ("models.ebrn_rm", "EBRNModule",
     argparse.Namespace(num_filters=8, num_brms=2),
     "ebrn_rm", True),
    ("models.hrsr", "MSRRModule",
     argparse.Namespace(num_lr_blocks=2, num_hr_blocks=1, num_hr_filters=4,
                        hr_filter_size=3, interpolate="bilinear"),
     "hrsr", True),
    ("/root/reference/models/REGO-Net.py", "REGOModule",
     argparse.Namespace(num_filters=8, len_side=2, res_weight=1.0, interpolate="bilinear"),
     "REGO-Net", True),
    ("models.msrr_test", "MSRRModule",
     argparse.Namespace(num_filters=8, num_blocks=1, res_weight=1.0),
     "msrr_test", True),
    ("models.dwsr_reduced", "MSRRModule",
     argparse.Namespace(num_blocks=1, res_weight=1.0, interpolate="bilinear"),
     "dwsr_reduced", True),
]


@pytest.mark.parametrize("mod_path,cls,targs,name,needs_scale",
                         FAMILIES, ids=[f[3] for f in FAMILIES])
def test_export_rule_roundtrip(mod_path, cls, targs, name, needs_scale):
    from larvanet_tpu.utils.torch_convert import (
        convert_state_dict, export_state_dict, _RGB_MEAN)

    _stub_pytorch_ssim()  # several reference models import it at module scope
    mod = _load_ref(mod_path)
    tmod = getattr(mod, cls)(targs, scale=4) if needs_scale else getattr(mod, cls)(targs)
    ref_state = {k: v.numpy() for k, v in tmod.state_dict().items()}

    params, skipped = convert_state_dict(ref_state, name)
    exported = export_state_dict(params, name)

    assert set(exported) == set(ref_state), (
        "key mismatch: missing %s extra %s" % (
            sorted(set(ref_state) - set(exported)),
            sorted(set(exported) - set(ref_state))))
    for key in ref_state:
        if "mean" in key:
            # synthesized intended meanshift, not the reference's random init
            if key.endswith(".weight"):
                np.testing.assert_array_equal(
                    exported[key], np.eye(3, dtype=np.float32).reshape(3, 3, 1, 1))
            else:
                np.testing.assert_allclose(np.abs(exported[key]),
                                           np.asarray(_RGB_MEAN, np.float32))
            continue
        np.testing.assert_array_equal(exported[key], ref_state[key], err_msg=key)


def test_export_rule_roundtrip_ebrn_full():
    """Separate: full EBRN exercises convT + per-channel PReLU inverses."""
    _stub_pytorch_ssim()
    from larvanet_tpu.utils.torch_convert import convert_state_dict, export_state_dict

    mod = _load_ref("models.ebrn")
    tmod = mod.EBRNModule(argparse.Namespace(num_filters=8, num_brms=2), scale=4)
    ref_state = {k: v.numpy() for k, v in tmod.state_dict().items()}
    params, _ = convert_state_dict(ref_state, "ebrn")
    exported = export_state_dict(params, "ebrn")
    assert set(exported) == set(ref_state)
    for key in ref_state:
        if "mean" not in key:
            np.testing.assert_array_equal(exported[key], ref_state[key], err_msg=key)


def test_export_rego_serial_roundtrip():
    from larvanet_tpu.utils.torch_convert import convert_state_dict, export_state_dict

    mod = _load_ref("/root/reference/models/REGO-serial.py")
    tmod = mod.REGOModule(
        argparse.Namespace(num_filters=8, len_side=2, num_regos=2,
                           weight_scale=1.0, interpolate="bilinear"), scale=4)
    ref_state = {k: v.numpy() for k, v in tmod.state_dict().items()}
    params, _ = convert_state_dict(ref_state, "REGO-serial")
    exported = export_state_dict(params, "REGO-serial")
    assert set(exported) == set(ref_state)
    for key in ref_state:
        if "mean" not in key:
            np.testing.assert_array_equal(exported[key], ref_state[key], err_msg=key)


def _deploy(mod_path, cls, targs, name, our_flags, rng, needs_scale=True,
            fix_meanshift=False, atol=2e-3):
    """OUR random-init model -> save_pth -> reference strict restore ->
    forward parity."""
    import torch
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.utils.torch_convert import save_pth
    import tempfile

    m = get_model(name)
    m.parse_args(list(our_flags))
    m.prepare(is_training=False, scales=[4])

    with tempfile.TemporaryDirectory() as d:
        path = save_pth(m.params, name, os.path.join(d, "export.pth"))
        mod = _load_ref(mod_path)
        tmod = getattr(mod, cls)(targs, scale=4) if needs_scale else getattr(mod, cls)(targs)
        tmod.load_state_dict(torch.load(path))  # strict by default
        tmod.eval()

    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=atol, rtol=1e-4)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_export_deploy_edsr(rng):
    _deploy("models.edsr", "EDSRModule",
            argparse.Namespace(edsr_conv_features=16, edsr_res_blocks=2, edsr_res_weight=1.0),
            "edsr", ["--edsr_conv_features", "16", "--edsr_res_blocks", "2"], rng)


def test_export_deploy_larvanet(rng):
    _deploy("models.LarvaNet", "LarvaNetModule",
            argparse.Namespace(num_modules=2, num_blocks="1,2", interpolate="bicubic"),
            "LarvaNet", ["--num_modules", "2", "--num_blocks", "1,2"], rng,
            needs_scale=False)


def test_export_deploy_ebrn(rng):
    _stub_pytorch_ssim()
    _deploy("models.ebrn", "EBRNModule",
            argparse.Namespace(num_filters=8, num_brms=2),
            "ebrn", ["--num_filters", "8", "--num_brms", "2"], rng)


def test_export_cli_end_to_end(rng, tmp_path):
    """cli/export: msgpack ckpt -> .pth -> reference strict restore ->
    forward parity (the full user flow)."""
    import torch
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.cli import export as export_cli

    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "16", "--edsr_res_blocks", "2"])
    m.prepare(is_training=True, scales=[4])
    m.global_step = 7
    ckpt = m.save(str(tmp_path))

    out = str(tmp_path / "export.pth")
    export_cli.main([
        "--model", "edsr", "--restore_path", ckpt, "--output", out,
        "--edsr_conv_features", "16", "--edsr_res_blocks", "2"])

    mod = _load_ref("models.edsr")
    tmod = mod.EDSRModule(
        argparse.Namespace(edsr_conv_features=16, edsr_res_blocks=2,
                           edsr_res_weight=1.0), scale=4)
    tmod.load_state_dict(torch.load(out))
    tmod.eval()
    x = rng.uniform(0, 255, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    ours = m.upscale([x[0]], scale=4)
    np.testing.assert_allclose(ours[0], ref_out[0], atol=2e-3, rtol=1e-4)


def test_export_unmapped_path_is_loud():
    from larvanet_tpu.utils.torch_convert import export_state_dict

    bogus = {"not_a_real_layer": {"kernel": np.zeros((3, 3, 4, 4), np.float32)}}
    with pytest.raises(KeyError):
        export_state_dict(bogus, "edsr")
