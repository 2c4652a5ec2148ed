"""Offline validation of the dataset readiness kit (VERDICT r2 #8).

No network exists here, so the fetch path can't run — but the tree
contract checker must work the day a networked host appears. Build a
synthetic tree matching the reference's test.py layout and drive
tools/fetch_datasets --check through pass and failure cases.
"""

import os

import numpy as np
import pytest

from tools.fetch_datasets import EXPECTED_COUNTS, check_tree, main


def _write_png(path, h, w):
    from larvanet_tpu.data.io import save_image_hwc

    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.random.default_rng(h * w).integers(0, 255, (h, w, 3)).astype(np.uint8)
    save_image_hwc(img, path)


def _build_tree(root, ds="Set5", n=None, scale=4, hw=(20, 24)):
    n = EXPECTED_COUNTS[ds] if n is None else n
    for i in range(n):
        name = "img_%03d" % i
        h, w = hw
        _write_png(os.path.join(root, "test_HR", ds, name + ".png"), h, w)
        lr_name = name + ("x%d" % scale if ds == "DIV2K_val" else "") + ".png"
        _write_png(os.path.join(root, "test_LR", ds, lr_name),
                   h // scale, w // scale)


def test_check_passes_on_conforming_tree(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "Set5")
    assert check_tree(root, ["Set5"]) == []
    assert main(["--root", root, "--datasets", "Set5", "--check"]) == 0


def test_check_div2k_x4_naming(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "DIV2K_val", n=100)
    assert check_tree(root, ["DIV2K_val"]) == []


def test_check_flags_count_mismatch(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "Set5", n=3)
    problems = check_tree(root, ["Set5"])
    assert any("expected 5" in p for p in problems)


def test_check_flags_missing_lr(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "Set5")
    os.unlink(os.path.join(root, "test_LR", "Set5", "img_000.png"))
    problems = check_tree(root, ["Set5"])
    assert any("no LR counterpart" in p for p in problems)


def test_check_flags_geometry_mismatch(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "Set5")
    # overwrite one LR with wrong geometry
    _write_png(os.path.join(root, "test_LR", "Set5", "img_000.png"), 9, 9)
    problems = check_tree(root, ["Set5"])
    assert any("geometry mismatch" in p for p in problems)


def test_check_missing_manga109_is_optional(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "Set5")
    assert check_tree(root, ["Set5", "Manga109"]) == []
    # but a missing mandatory dataset fails
    problems = check_tree(root, ["Set5", "Set14"])
    assert any("Set14" in p for p in problems)


def test_check_exit_code_on_failure(tmp_path):
    root = str(tmp_path)
    _build_tree(root, "Set5", n=2)
    assert main(["--root", root, "--datasets", "Set5", "--check"]) == 1
