"""tools/paper_table.py — the one-command paper table (VERDICT r3 #7).

Fast tier: dataset auto-detection honors the canonical order and
reports (never silently drops) missing suites; markdown rendering
handles error cells. Slow tier: the full contract drive — fixture_real
test trees arranged in the docs/DATASETS.md directory contract, scored
through the real cli/test.py subprocess (forced CPU via $LVT_PLATFORM).
"""

import json
import os
import shutil

import numpy as np
import pytest

from tools import paper_table


def _contract_root(tmp_path, n_images=2):
    """A dataset root in the contract, subset of fixture_real's test
    trees (SynSetReal flat names + DIV2K_val <name>x4.png names)."""
    from larvanet_tpu.data import fixture

    src = "data/fixture_real"
    fixture.ensure_realistic(src)
    root = tmp_path / "data"
    for ds in ("SynSetReal", "DIV2K_val"):
        for side in ("test_LR", "test_HR"):
            os.makedirs(root / side / ds)
        hr_names = sorted(os.listdir(os.path.join(src, "test_HR", ds)))[:n_images]
        for name in hr_names:
            shutil.copy(os.path.join(src, "test_HR", ds, name),
                        root / "test_HR" / ds / name)
            lr_name = (os.path.splitext(name)[0] + "x4.png"
                       if ds == "DIV2K_val" else name)
            shutil.copy(os.path.join(src, "test_LR", ds, lr_name),
                        root / "test_LR" / ds / lr_name)
    return str(root)


def test_detect_datasets_canonical_order_and_missing(tmp_path):
    for ds in ("Urban100", "Set5", "Custom1"):
        os.makedirs(tmp_path / "test_LR" / ds)
    have, missing = paper_table.detect_datasets(str(tmp_path))
    assert have == ["Set5", "Urban100", "Custom1"]
    assert missing == []
    have, missing = paper_table.detect_datasets(
        str(tmp_path), requested="Set5,Set14,Urban100")
    assert have == ["Set5", "Urban100"]
    assert missing == ["Set14"]


def test_markdown_table_renders_errors_and_variants():
    rows = [
        {"model": "edsr", "variant": "exact", "ok": True,
         "results": {"Set5": {"mean_psnr": 30.1234, "mean_ssim": 0.91}}},
        {"model": "edsr", "variant": "int8", "ok": False, "error": "boom"},
    ]
    md = paper_table.markdown_table(["Set5"], rows)
    assert "| edsr | 30.12 / 0.9100 |" in md
    assert "| edsr (int8) | ERROR |" in md


@pytest.mark.slow
def test_contract_drive_through_real_cli(tmp_path, monkeypatch):
    root = _contract_root(tmp_path)
    # a tiny trained-ish checkpoint (random init is fine: the protocol
    # plumbing is the claim)
    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=True, scales=[4])
    ckpt = m.save(str(tmp_path))

    monkeypatch.setenv("LVT_PLATFORM", "cpu")
    out = str(tmp_path / "PAPER_TABLE.json")
    report = paper_table.main([
        "--root", root,
        "--entry", "edsr %s --edsr_res_blocks 1 --edsr_conv_features 8" % ckpt,
        "--int8_trunk", "--out", out])

    assert report["datasets"] == ["DIV2K_val", "SynSetReal"]
    assert report["missing"] == []
    variants = {r["variant"] for r in report["rows"]}
    assert variants == {"exact", "int8"}
    for row in report["rows"]:
        assert row["ok"], row.get("error")
        for ds in report["datasets"]:
            res = row["results"][ds]
            assert np.isfinite(res["mean_psnr"]) and 0 <= res["mean_ssim"] <= 1
    with open(out) as f:
        assert json.load(f)["rows"]
