"""Smoke for tools/int8_family_report.py — the script behind
INT8_REPORT.json / QAT_REPORT.json and the BASELINE.md accuracy tables.
Covers the device-pipeline training loop, the QAT exact-then-finetune
phase flip (including a non-multiple fine-tune count, the remainder
recompile path), and the int8-vs-exact eval."""

import numpy as np
import pytest

from tools import int8_family_report as rep


@pytest.mark.slow  # ~2 min of CPU compiles (packed + int8 + 3 train graphs)
def test_report_tool_smoke_qat_finetune():
    lrs, hrs = rep._fixture_images("data/fixture")
    model = rep.train_family(
        "edsr", ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"],
        steps=2, lrs=lrs, hrs=hrs, batch=2, patch=8, chunk_steps=2,
        qat=True, qat_finetune_steps=3)  # 3 % 2 != 0: remainder chunk
    assert model.global_step == 5  # 2 exact + 3 fine-tune, no overshoot
    out = rep.eval_family(model, "edsr", lrs, hrs)
    assert np.isfinite(out["mean_delta_db"])
    assert np.isfinite(out["mean_exact_psnr"])
    assert out["images"], "no fixture image fit the eval crop"
