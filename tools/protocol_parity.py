"""Cross-framework protocol parity harness — the measured dB delta.

Runs the reference workbench's OWN evaluation pipelines (imported from
/root/reference, torch CPU) side by side with this framework's CLIs on
the same frozen synthetic fixture (larvanet_tpu/data/fixture.py) and the
same checkpoint, and reports the per-image and mean PSNR/SSIM deltas:

* challenge protocol — the reference's validate.py flow
  (reference validate.py:83-123: no_grad, model.upscale or
  chop-forward, uint8 round/clip, truth crop, RGB PSNR) via the
  reference's basic_loader (basic_loader.py:99-142) and the reference's
  own helper functions, vs our cli/validate.py (which runs the shipped
  TPU fast paths: packed trunk + collapsed tail);
* paper protocol — the reference's test.py flow (test.py:118-170:
  shave=scale, Y-of-YCbCr PSNR + SSIM; DIV2K_val special-cased to RGB;
  msrr_test's [0,1] contract test.py:132-146) vs our cli/test.py.

The checkpoint is created by the reference side (random init, seeded,
torch.save of the live reference module's state_dict — exactly what a
trained reference checkpoint is) and restored by our side through the
`.pth` path of models/base.py (utils/torch_convert rules), i.e. the
full user migration path is what gets measured.

The reference's EDSR-family MeanShift layers are dead-random at runtime
(they assign `weight_data`, not `weight.data` — reference
models/edsr.py:132-133); as in tests/test_torch_convert.py the harness
writes the *intended* identity+bias into them before saving, so both
frameworks compute the intended function.

Used by tests/test_protocol_parity.py (tiny configs, asserted bounds)
and as a CLI for the full-size numbers frozen in BASELINE.md.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import tempfile
from typing import Dict, List, Optional, Sequence

import numpy as np

REF_ROOT = "/root/reference"


def force_cpu() -> None:
    """Pin JAX to the host CPU backend before it initializes.

    The parity harness is a numerical-equivalence tool, not a perf tool
    (VERDICT round 1 item 1: reference flow runs torch CPU); letting our
    CLI side hit the tunneled TPU would cost a multi-minute remote AOT
    compile per image shape for zero benefit. The axon platform ignores
    JAX_PLATFORMS, so jax.config is the only reliable override
    (CLAUDE.md); harmless if a backend is already up on CPU.
    """
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (e.g. under pytest's conftest)


def setup_reference(ref_root: str = REF_ROOT) -> None:
    from tools import refshims

    force_cpu()
    refshims.install()
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)


def _fix_meanshift(module, mean=(114.4, 111.5, 103.0)) -> None:
    """Write the intended identity weights into reference MeanShift convs
    (see module docstring; mirrors tests/test_torch_convert.py)."""
    import torch

    for name, m in module.named_modules():
        if type(m).__name__ == "MeanShift":
            sign = 1.0 if name == "mean_shift" else -1.0
            with torch.no_grad():
                m.weight.copy_(torch.eye(3).view(3, 3, 1, 1))
                m.bias.copy_(sign * torch.tensor(mean))


def make_reference_model(model_name: str, model_flags: Sequence[str], scale: int,
                         seed: int = 0):
    """Build the reference wrapper (create_model -> parse_args -> prepare)."""
    import torch

    torch.manual_seed(seed)
    mod = importlib.import_module("models." + model_name)
    wrapper = mod.create_model()
    wrapper.parse_args(list(model_flags))
    wrapper.prepare(is_training=False, scales=[scale], global_step=0)
    _fix_meanshift(wrapper.model)
    wrapper.model.eval()
    return wrapper


def save_reference_checkpoint(wrapper, path: str) -> str:
    import torch

    torch.save(wrapper.model.state_dict(), path)
    return path


def reference_validate(wrapper, input_dir: str, truth_dir: str, scale: int,
                       chop: bool = False, overlap: int = 20) -> Dict:
    """The reference validate.py:83-123 loop, using the reference's own
    helpers and basic_loader."""
    import torch

    ref_validate = importlib.import_module("validate")
    ref_image_utils = importlib.import_module("utils.image_utils")
    loader = importlib.import_module("dataloaders.basic_loader").create_loader()
    loader.parse_args(["--data_input_path", input_dir, "--data_truth_path", truth_dir])
    loader.prepare(scales=[scale])

    per_image = {}
    with torch.no_grad():
        for i in range(loader.get_num_images()):
            input_image, truth_image, name = loader.get_image_pair(image_index=i, scale=scale)
            if chop:
                output_image = ref_image_utils.upscale_with_chop_forward(
                    model=wrapper, input_image=input_image, scale=scale,
                    overlap_size=overlap)
            else:
                output_image = wrapper.upscale(input_list=[input_image], scale=scale)[0]
            truth_u8 = ref_validate._image_to_uint8(truth_image)
            output_u8 = ref_validate._image_to_uint8(output_image)
            truth_u8 = ref_validate._fit_truth_image_size(
                output_image=output_u8, truth_image=truth_u8)
            per_image[name] = float(ref_validate._image_psnr(
                output_image=output_u8, truth_image=truth_u8))
    return {"mean_psnr": float(np.mean(list(per_image.values()))), "per_image": per_image}


def reference_test(wrapper, model_name: str, lr_root: str, hr_root: str,
                   datasets: Sequence[str], scale: int = 4) -> Dict:
    """The reference test.py:118-170 per-image flow, using test.py's own
    helper functions (shave/_image_ssim/_image_psnr*/tensor2uint)."""
    import torch

    ref_test = importlib.import_module("test")
    cv = importlib.import_module("cv2")

    report = {}
    for dataset in datasets:
        input_path = os.path.join(lr_root, dataset)
        truth_path = os.path.join(hr_root, dataset)
        image_name_list = [f for f in sorted(os.listdir(truth_path))
                           if f.lower().endswith(".png")]
        per_image = {}
        with torch.no_grad():
            for image_name in image_name_list:
                if dataset == "DIV2K_val":
                    input_image_name = os.path.splitext(image_name)[0] + "x%d" % scale + ".png"
                else:
                    input_image_name = image_name
                input_image = cv.imread(os.path.join(input_path, input_image_name))
                input_image = cv.cvtColor(input_image, cv.COLOR_BGR2RGB)
                input_image = np.transpose(input_image, [2, 0, 1])
                if model_name == "msrr_test":
                    input_image = torch.from_numpy(
                        np.ascontiguousarray(input_image)).float().div(255.0).unsqueeze(0)

                truth_image = cv.imread(os.path.join(truth_path, image_name))
                truth_image = cv.cvtColor(truth_image, cv.COLOR_BGR2RGB)

                if model_name == "msrr_test":
                    output_tensor = wrapper.test(input_image)
                    output_image = ref_test.tensor2uint(output_tensor)
                else:
                    output_tensor = wrapper.test(input_list=[input_image])
                    output_image = output_tensor.detach().cpu().numpy()[0]
                    output_image = ref_test._image_to_uint8(output_image)
                    output_image = np.transpose(output_image, [1, 2, 0])

                cropped_output_image = ref_test.shave(output_image, scale)
                truth_image = ref_test._fit_truth_image_size(
                    output_image=output_image, truth_image=truth_image)
                truth_image = ref_test._image_to_uint8(truth_image)
                cropped_truth_image = ref_test.shave(truth_image, scale)

                skimage_color = importlib.import_module("skimage.color")
                test_output_image = ref_test._image_to_uint8(
                    skimage_color.rgb2ycbcr(cropped_output_image)[:, :, 0])
                test_truth_image = ref_test._image_to_uint8(
                    skimage_color.rgb2ycbcr(cropped_truth_image)[:, :, 0])

                if dataset == "DIV2K_val":
                    psnr = ref_test._image_psnr_DIV2K(output_image, truth_image)
                    ssim = ref_test._image_ssim(output_image, truth_image)
                else:
                    psnr = ref_test._image_psnr(test_output_image, test_truth_image)
                    ssim = ref_test._image_ssim(test_output_image, test_truth_image)
                per_image[os.path.splitext(image_name)[0]] = {
                    "psnr": float(psnr), "ssim": float(ssim)}
        report[dataset] = {
            "mean_psnr": float(np.mean([v["psnr"] for v in per_image.values()])),
            "mean_ssim": float(np.mean([v["ssim"] for v in per_image.values()])),
            "per_image": per_image,
        }
    return report


def reference_validate_interpol(mode: str, input_dir: str, truth_dir: str,
                                scale: int) -> Dict:
    """The reference validate_interpol.py:70-100 loop (the null-model
    baseline: pure F.interpolate upscaling), using its own helpers."""
    import torch
    import torch.nn.functional as F

    vi = importlib.import_module("validate_interpol")
    loader = importlib.import_module("dataloaders.basic_loader").create_loader()
    loader.parse_args(["--data_input_path", input_dir, "--data_truth_path", truth_dir])
    loader.prepare(scales=[scale])

    per_image = {}
    for i in range(loader.get_num_images()):
        input_image, truth_image, name = loader.get_image_pair(image_index=i, scale=scale)
        t = torch.tensor(np.asarray([input_image]), dtype=torch.float32)
        out = F.interpolate(t, scale_factor=scale, mode=mode,
                            align_corners=False)[0].numpy()
        truth_u8 = vi._image_to_uint8(truth_image)
        out_u8 = vi._image_to_uint8(out)
        truth_u8 = vi._fit_truth_image_size(output_image=out_u8, truth_image=truth_u8)
        per_image[name] = float(vi._image_psnr(output_image=out_u8, truth_image=truth_u8))
    return {"mean_psnr": float(np.mean(list(per_image.values()))), "per_image": per_image}


def ours_validate_interpol(mode: str, input_dir: str, truth_dir: str,
                           scale: int) -> Dict:
    from larvanet_tpu.cli import validate_interpol as cli_vi

    res = cli_vi.main([
        "--dataloader", "basic_loader", "--scales", str(scale),
        "--data_input_path", input_dir, "--data_truth_path", truth_dir,
        "--interpolate", mode,
    ])
    return res[scale]


def reference_validate_tree(wrapper, input_dir: str, truth_dir: str,
                            scale: int = 4) -> Dict:
    """The reference validate_tree.py:85-121 per-branch flow: shared
    trunk once, each branch + interpolated base scored separately."""
    import torch
    import torch.nn.functional as F

    vt = importlib.import_module("validate_tree")
    loader = importlib.import_module("dataloaders.basic_loader").create_loader()
    loader.parse_args(["--data_input_path", input_dir, "--data_truth_path", truth_dir])
    loader.prepare(scales=[scale])

    nb = wrapper.args.num_branches
    per_image = {b: {} for b in range(nb)}
    with torch.no_grad():
        for i in range(loader.get_num_images()):
            input_image, truth_image, name = loader.get_image_pair(image_index=i, scale=scale)
            t = torch.tensor(np.asarray([input_image]), dtype=torch.float32,
                             device=wrapper.device)
            fea = wrapper.model.common_parts(t)
            for b in range(nb):
                out = getattr(wrapper.model, "branch_%d" % b)(fea)
                out = out + F.interpolate(t, scale_factor=4,
                                          mode=wrapper.args.interpolate,
                                          align_corners=False)
                out_u8 = vt._image_to_uint8(out.detach().cpu().numpy()[0])
                tr_u8 = vt._image_to_uint8(truth_image)
                tr_u8 = vt._fit_truth_image_size(output_image=out_u8, truth_image=tr_u8)
                per_image[b][name] = float(
                    vt._image_psnr(output_image=out_u8, truth_image=tr_u8))
    return {b: {"mean_psnr": float(np.mean(list(per_image[b].values()))),
                "per_image": per_image[b]} for b in range(nb)}


def ours_validate_tree(model_flags: Sequence[str], pth_path: str,
                       input_dir: str, truth_dir: str, scale: int = 4) -> Dict:
    from larvanet_tpu.cli import validate_tree as cli_vt

    return cli_vt.main([
        "--dataloader", "basic_loader", "--model", "TreeNet",
        "--restore_path", pth_path, "--scales", str(scale),
        "--data_input_path", input_dir, "--data_truth_path", truth_dir,
    ] + list(model_flags))


def reference_psnr_offline(sr_dir: str, hr_dir: str) -> Dict:
    """The reference PSNR.py:96-137 per-image flow on a saved SR tree:
    shave 4, Y-of-YCbCr uint8 PSNR + SSIM, using PSNR.py's own helpers."""
    ref_psnr = importlib.import_module("PSNR")
    cv = importlib.import_module("cv2")
    skimage_color = importlib.import_module("skimage.color")

    per_image = {}
    for image_name in sorted(os.listdir(hr_dir)):
        if not image_name.lower().endswith(".png"):
            continue
        truth_image = cv.cvtColor(cv.imread(os.path.join(hr_dir, image_name)),
                                  cv.COLOR_BGR2RGB)
        output_image = cv.cvtColor(cv.imread(os.path.join(sr_dir, image_name)),
                                   cv.COLOR_BGR2RGB)
        output_image = ref_psnr._image_to_uint8(output_image)
        cropped_output = ref_psnr.shave(output_image, 4)
        truth_image = ref_psnr._fit_truth_image_size(
            output_image=output_image, truth_image=truth_image)
        truth_image = ref_psnr._image_to_uint8(truth_image)
        cropped_truth = ref_psnr.shave(truth_image, 4)
        t_out = ref_psnr._image_to_uint8(
            skimage_color.rgb2ycbcr(cropped_output)[:, :, 0])
        t_tru = ref_psnr._image_to_uint8(
            skimage_color.rgb2ycbcr(cropped_truth)[:, :, 0])
        per_image[os.path.splitext(image_name)[0]] = {
            "psnr": float(ref_psnr._image_psnr(t_out, t_tru)),
            "ssim": float(ref_psnr._image_ssim(t_out, t_tru)),
        }
    return per_image


def ours_validate(model_name: str, model_flags: Sequence[str], pth_path: str,
                  input_dir: str, truth_dir: str, scale: int, chop: bool = False,
                  extra_flags: Sequence[str] = ()) -> Dict:
    from larvanet_tpu.cli import validate as cli_validate

    with tempfile.TemporaryDirectory() as td:
        rj = os.path.join(td, "report.json")
        argv = [
            "--dataloader", "basic_loader", "--model", model_name,
            "--restore_path", pth_path, "--scales", str(scale),
            "--data_input_path", input_dir, "--data_truth_path", truth_dir,
            "--report_json", rj,
        ] + (["--chop_forward"] if chop else []) + list(model_flags) + list(extra_flags)
        cli_validate.main(argv)
        with open(rj) as f:
            rep = json.load(f)
    sc = rep["scales"][str(scale)]
    return {"mean_psnr": sc["mean_psnr"], "per_image": sc["per_image"]}


def ours_test(model_name: str, model_flags: Sequence[str], pth_path: str,
              lr_root: str, hr_root: str, datasets: Sequence[str],
              scale: int = 4, extra_flags: Sequence[str] = ()) -> Dict:
    from larvanet_tpu.cli import test as cli_test

    with tempfile.TemporaryDirectory() as td:
        rj = os.path.join(td, "report.json")
        argv = [
            "--model", model_name, "--restore_path", pth_path,
            "--scales", str(scale),
            "--input_root_path", lr_root, "--truth_root_path", hr_root,
            "--output_root_path", os.path.join(td, "sr"),
            "--datasets", ",".join(datasets), "--report_json", rj,
        ] + list(model_flags) + list(extra_flags)
        cli_test.main(argv)
        with open(rj) as f:
            return json.load(f)


def delta_stats(ref_per_image: Dict[str, float], ours_per_image: Dict[str, float]) -> Dict:
    assert set(ref_per_image) == set(ours_per_image), (
        sorted(ref_per_image), sorted(ours_per_image))
    deltas = {k: ours_per_image[k] - ref_per_image[k] for k in ref_per_image}
    return {
        "max_abs_delta": float(max(abs(d) for d in deltas.values())),
        "mean_delta": float(np.mean(list(deltas.values()))),
        "per_image_delta": deltas,
    }


# ---------------------------------------------------------------------------
# Family configurations (tiny versions live in the test; these are full-size)
# ---------------------------------------------------------------------------

FULL_FAMILIES = {
    "edsr": {
        "flags": [],  # reference defaults: 64 features, 16 blocks (EDSR-b)
        "validate": True, "chop": True, "test": False,
    },
    "LarvaNet": {
        "flags": ["--num_modules", "2", "--num_blocks", "8,8"],
        "validate": True, "chop": False, "test": True,
    },
    "msrr_reduced": {
        "flags": [],  # 32 blocks, 48ch
        "validate": True, "chop": False, "test": False,
    },
    "msrr_test": {
        "flags": [],
        "validate": False, "chop": False, "test": True,
    },
}

# --realistic (VERDICT r3 next#2): every protocol on >=3 full-size
# families at the ~320x480-HR geometry, where border shares and
# chop/shave interactions differ from the tiny fixture.
REALISTIC_FAMILIES = {
    # 'test' only where the reference model defines test() (LarvaNet
    # family, msrr, msrr_test — reference test.py's own constraint)
    "edsr": {"flags": [], "validate": True, "chop": True, "test": False},
    "LarvaNet": {"flags": ["--num_modules", "2", "--num_blocks", "8,8"],
                 "validate": True, "chop": True, "test": True},
    # V2 topology: shared tail exit fed by the module sum (reference
    # LarvaNetV2.py:108-118); partial/strict=False restore semantics
    "LarvaNetV2": {"flags": ["--num_modules", "2", "--num_blocks", "8,8"],
                   "validate": True, "chop": True, "test": True},
    "msrr_reduced": {"flags": [], "validate": True, "chop": True, "test": False},
    "msrr": {"flags": [], "validate": True, "chop": True, "test": True},
    "msrr_test": {"flags": [], "validate": False, "chop": False, "test": True},
}


def build_subset(src_root: str, dst_root: str, scale: int, n: int,
                 datasets: Sequence[str]) -> str:
    """First-n-images subset of a fixture tree (x{s}/ + test trees) —
    bounds the torch-CPU runtime at realistic geometry (the round-3
    PARITY_REAL used an ad-hoc /tmp subset; this makes it reproducible)."""
    import shutil

    names = sorted(os.listdir(os.path.join(src_root, "x%d" % scale, "input")))[:n]
    for sub in ("input", "truth"):
        os.makedirs(os.path.join(dst_root, "x%d" % scale, sub), exist_ok=True)
        for f in names:
            shutil.copy(os.path.join(src_root, "x%d" % scale, sub, f),
                        os.path.join(dst_root, "x%d" % scale, sub, f))
    for ds in datasets:
        hr_dir = os.path.join(src_root, "test_HR", ds)
        if not os.path.isdir(hr_dir):
            continue
        os.makedirs(os.path.join(dst_root, "test_HR", ds), exist_ok=True)
        os.makedirs(os.path.join(dst_root, "test_LR", ds), exist_ok=True)
        for f in names:
            if not os.path.exists(os.path.join(hr_dir, f)):
                continue
            stem = os.path.splitext(f)[0]
            lr_name = stem + ("x%d" % scale if ds == "DIV2K_val" else "") + ".png"
            shutil.copy(os.path.join(hr_dir, f),
                        os.path.join(dst_root, "test_HR", ds, f))
            shutil.copy(os.path.join(src_root, "test_LR", ds, lr_name),
                        os.path.join(dst_root, "test_LR", ds, lr_name))
    return dst_root


def run_family(model_name: str, model_flags: Sequence[str], fixture_root: str,
               workdir: str, scale: int = 4, do_validate: bool = True,
               do_chop: bool = False, do_test: bool = False, chop_overlap: int = 20,
               our_extra_flags: Sequence[str] = (), seed: int = 0,
               test_datasets: Sequence[str] = ("SynSet", "DIV2K_val")) -> Dict:
    setup_reference()
    wrapper = make_reference_model(model_name, model_flags, scale, seed=seed)
    pth = save_reference_checkpoint(wrapper, os.path.join(workdir, model_name + ".pth"))

    input_dir = os.path.join(fixture_root, "x%d" % scale, "input")
    truth_dir = os.path.join(fixture_root, "x%d" % scale, "truth")
    out: Dict = {"model": model_name, "flags": list(model_flags), "scale": scale}

    if do_validate:
        ref = reference_validate(wrapper, input_dir, truth_dir, scale)
        ours = ours_validate(model_name, model_flags, pth, input_dir, truth_dir,
                             scale, extra_flags=our_extra_flags)
        out["validate"] = {
            "ref_mean_psnr": ref["mean_psnr"], "ours_mean_psnr": ours["mean_psnr"],
            **delta_stats(ref["per_image"], ours["per_image"]),
        }
    if do_chop:
        ref = reference_validate(wrapper, input_dir, truth_dir, scale, chop=True,
                                 overlap=chop_overlap)
        ours = ours_validate(
            model_name, model_flags, pth, input_dir, truth_dir, scale, chop=True,
            extra_flags=list(our_extra_flags) + ["--chop_overlap_size", str(chop_overlap)])
        out["validate_chop"] = {
            "ref_mean_psnr": ref["mean_psnr"], "ours_mean_psnr": ours["mean_psnr"],
            **delta_stats(ref["per_image"], ours["per_image"]),
        }
    if do_test:
        datasets = tuple(test_datasets)
        lr_root = os.path.join(fixture_root, "test_LR")
        hr_root = os.path.join(fixture_root, "test_HR")
        ref = reference_test(wrapper, model_name, lr_root, hr_root, datasets, scale=scale)
        ours = ours_test(model_name, model_flags, pth, lr_root, hr_root, datasets,
                         scale=scale, extra_flags=our_extra_flags)
        out["test"] = {}
        for ds in datasets:
            rp = {k: v["psnr"] for k, v in ref[ds]["per_image"].items()}
            op = {k: v["psnr"] for k, v in ours[ds]["per_image"].items()}
            rs = {k: v["ssim"] for k, v in ref[ds]["per_image"].items()}
            os_ = {k: v["ssim"] for k, v in ours[ds]["per_image"].items()}
            out["test"][ds] = {
                "ref_mean_psnr": ref[ds]["mean_psnr"], "ours_mean_psnr": ours[ds]["mean_psnr"],
                "ref_mean_ssim": ref[ds]["mean_ssim"], "ours_mean_ssim": ours[ds]["mean_ssim"],
                "psnr": delta_stats(rp, op), "ssim": delta_stats(rs, os_),
            }
    return out


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--fixture", default=None,
                        help="Fixture root (default data/fixture, or "
                             "data/fixture_real with --realistic).")
    parser.add_argument("--families", default="",
                        help="Comma-separated family names to run "
                             "(default: the full matrix for the tier).")
    parser.add_argument("--realistic", action="store_true",
                        help="Realistic-geometry tier (~320x480 HR): fixture "
                             "data/fixture_real, every protocol x >=3 "
                             "families, report PARITY_REAL.json; "
                             "--max_images bounds the torch-CPU runtime.")
    parser.add_argument("--max_images", type=int, default=0,
                        help="Score only the first N fixture images "
                             "(0 = all; --realistic defaults to 6).")
    parser.add_argument("--out", default=None, help="Report path.")
    parser.add_argument("--scale", type=int, default=4)
    args = parser.parse_args(argv)

    from larvanet_tpu.data import fixture as fx

    families_cfg = REALISTIC_FAMILIES if args.realistic else FULL_FAMILIES
    fixture_root = args.fixture or (
        "data/fixture_real" if args.realistic else "data/fixture")
    out_path = args.out or ("PARITY_REAL.json" if args.realistic
                            else "PARITY.json")
    test_datasets = (("SynSetReal", "DIV2K_val") if args.realistic
                     else ("SynSet", "DIV2K_val"))
    max_images = args.max_images or (6 if args.realistic else 0)
    (fx.ensure_realistic if args.realistic else fx.ensure)(fixture_root)

    reports = []
    src_fixture = fixture_root
    with tempfile.TemporaryDirectory() as workdir:
        if max_images:
            fixture_root = build_subset(
                fixture_root, os.path.join(workdir, "subset"),
                args.scale, max_images, test_datasets)
        names = [f for f in args.families.split(",") if f] or list(families_cfg)
        for name in names:
            cfg = families_cfg[name]
            print("=== %s ===" % name)
            rep = run_family(
                name, cfg["flags"], fixture_root, workdir, scale=args.scale,
                do_validate=cfg["validate"], do_chop=cfg["chop"], do_test=cfg["test"],
                test_datasets=test_datasets)
            reports.append(rep)
            for proto in ("validate", "validate_chop"):
                if proto in rep:
                    r = rep[proto]
                    print("%-14s %-14s ref=%.4f dB ours=%.4f dB  max|Δ|=%.2e"
                          % (name, proto, r["ref_mean_psnr"], r["ours_mean_psnr"],
                             r["max_abs_delta"]))
            if "test" in rep:
                for ds, r in rep["test"].items():
                    print("%-14s test/%-9s ref=%.4f dB ours=%.4f dB  max|ΔPSNR|=%.2e  max|ΔSSIM|=%.2e"
                          % (name, ds, r["ref_mean_psnr"], r["ours_mean_psnr"],
                             r["psnr"]["max_abs_delta"], r["ssim"]["max_abs_delta"]))

    # merge-on-rerun: a --families-filtered run must not drop the other
    # families' previously recorded reports (same contract as
    # tools/recipe_full.py phase_extra / lr_domain_sweep)
    if args.families and os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            done = {r.get("model") for r in reports}
            reports = [r for r in prev.get("reports", [])
                       if r.get("model") not in done] + reports
        except (ValueError, KeyError):
            pass
    with open(out_path, "w") as f:
        json.dump({"fixture": src_fixture, "realistic": bool(args.realistic),
                   "max_images": max_images, "reports": reports},
                  f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote %s" % out_path)
    return reports


if __name__ == "__main__":
    main()
