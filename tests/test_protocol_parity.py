"""End-to-end protocol parity vs the live reference (VERDICT r1 item 1).

Each test runs the reference repo's OWN eval pipeline (torch CPU, its
validate.py/test.py semantics and its basic_loader) and this framework's
CLI on the same fixture + the same checkpoint (converted through the
user-facing `.pth` restore path), and asserts the final printed dB
numbers agree per image:

    |ΔPSNR| ≤ 1e-3 dB and |ΔSSIM| ≤ 1e-4 per image

which is 20x tighter than the project's 0.02 dB budget. Covers EDSR
(plain + chop-forward), LarvaNet (validate + paper test protocols),
msrr_reduced, and msrr_test ([0,1]-contract special case). Tiny model
configs keep CPU compile time sane; the full-size numbers live in
BASELINE.md (tools/protocol_parity.py CLI).
"""

import os

import pytest

from tools import protocol_parity as pp
from larvanet_tpu.data import fixture

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

PSNR_TOL = 1e-3
SSIM_TOL = 1e-4

# Two images: even LR + odd-width LR with truth-crop extras.
SHAPES = ((32, 40, 0, 0), (30, 33, 1, 2))


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_fixture")
    fixture.generate(str(root), shapes=SHAPES, scales=(4,))
    return str(root)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("parity_ckpts"))


def test_edsr_validate_and_chop(fixture_root, workdir):
    rep = pp.run_family(
        "edsr", ["--edsr_conv_features", "16", "--edsr_res_blocks", "2"],
        fixture_root, workdir, do_validate=True, do_chop=True, chop_overlap=8)
    assert rep["validate"]["max_abs_delta"] <= PSNR_TOL
    assert rep["validate_chop"]["max_abs_delta"] <= PSNR_TOL


def test_larvanet_validate_and_paper_test(fixture_root, workdir):
    rep = pp.run_family(
        "LarvaNet", ["--num_modules", "2", "--num_blocks", "2,3"],
        fixture_root, workdir, do_validate=True, do_test=True)
    assert rep["validate"]["max_abs_delta"] <= PSNR_TOL
    for ds in ("SynSet", "DIV2K_val"):
        assert rep["test"][ds]["psnr"]["max_abs_delta"] <= PSNR_TOL
        assert rep["test"][ds]["ssim"]["max_abs_delta"] <= SSIM_TOL


def test_msrr_reduced_validate(fixture_root, workdir):
    rep = pp.run_family("msrr_reduced", ["--num_blocks", "3"],
                        fixture_root, workdir, do_validate=True)
    assert rep["validate"]["max_abs_delta"] <= PSNR_TOL


def test_msrr_test_paper_protocol(fixture_root, workdir):
    rep = pp.run_family(
        "msrr_test", ["--num_filters", "16", "--num_blocks", "2"],
        fixture_root, workdir, do_validate=False, do_test=True)
    for ds in ("SynSet", "DIV2K_val"):
        assert rep["test"][ds]["psnr"]["max_abs_delta"] <= PSNR_TOL
        assert rep["test"][ds]["ssim"]["max_abs_delta"] <= SSIM_TOL


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_interpolation_null_model_protocol(fixture_root, mode):
    """The reference's validate_interpol.py null-model baseline (pure
    F.interpolate, align_corners=False — reference
    validate_interpol.py:79) vs our cli/validate_interpol.py on the
    fixture: isolates the resize semantics the 0.02 dB budget leans on."""
    pp.setup_reference()
    inp = os.path.join(fixture_root, "x4", "input")
    tru = os.path.join(fixture_root, "x4", "truth")
    ref = pp.reference_validate_interpol(mode, inp, tru, 4)
    ours = pp.ours_validate_interpol(mode, inp, tru, 4)
    stats = pp.delta_stats(ref["per_image"], ours["per_image"])
    assert stats["max_abs_delta"] <= PSNR_TOL, stats


def test_treenet_per_branch_protocol(fixture_root, workdir):
    """The reference's validate_tree.py per-branch flow (trunk once,
    each branch + base scored separately, validate_tree.py:94-121) vs
    our cli/validate_tree.py on the same converted checkpoint."""
    flags = ["--num_common_blocks", "2", "--num_branches", "2",
             "--num_branch_blocks", "2"]
    pp.setup_reference()
    wrapper = pp.make_reference_model("TreeNet", flags, 4)
    pth = pp.save_reference_checkpoint(
        wrapper, os.path.join(workdir, "treenet.pth"))
    inp = os.path.join(fixture_root, "x4", "input")
    tru = os.path.join(fixture_root, "x4", "truth")
    ref = pp.reference_validate_tree(wrapper, inp, tru)
    ours = pp.ours_validate_tree(flags, pth, inp, tru)
    assert set(ours) == set(ref)
    for b in ref:
        stats = pp.delta_stats(ref[b]["per_image"], ours[b]["per_image"])
        assert stats["max_abs_delta"] <= PSNR_TOL, (b, stats)


def test_psnr_offline_tree_protocol(fixture_root, tmp_path):
    """The reference's PSNR.py offline protocol (saved SR tree: shave 4,
    Y-PSNR + SSIM — PSNR.py:96-137) vs cli/psnr.evaluate_tree on the
    same tree (bicubic-upscaled fixture inputs as the stand-in SR)."""
    import numpy as np

    from larvanet_tpu.cli.psnr import evaluate_tree
    from larvanet_tpu.data import io
    from larvanet_tpu.ops.resize import upsample

    pp.setup_reference()
    hr_dir = os.path.join(fixture_root, "x4", "truth")
    sr_dir = str(tmp_path / "sr")
    for f in sorted(os.listdir(os.path.join(fixture_root, "x4", "input"))):
        lr = io.load_image_u8(os.path.join(fixture_root, "x4", "input", f))
        sr = np.asarray(upsample(lr.astype(np.float32)[None], 4, "bicubic"))[0]
        io.save_image_hwc(np.clip(np.round(sr), 0, 255).astype(np.uint8),
                          os.path.join(sr_dir, f))

    ref = pp.reference_psnr_offline(sr_dir, hr_dir)
    ours = {name: {"psnr": p, "ssim": s}
            for name, p, s in evaluate_tree(sr_dir, hr_dir, shave_border=4)}
    ours = {os.path.splitext(k)[0]: v for k, v in ours.items()}
    assert set(ref) == set(ours)
    for k in ref:
        assert abs(ref[k]["psnr"] - ours[k]["psnr"]) <= PSNR_TOL, k
        assert abs(ref[k]["ssim"] - ours[k]["ssim"]) <= SSIM_TOL, k
