"""tools/soak_real.py --quick: the realistic-soak machinery end-to-end
on CPU — plateau staircase fires deterministic LR drops through the
model's ReduceLROnPlateau (the cli/train_schedule.py contract) and the
EMA phase evaluates raw vs averaged weights (VERDICT r2 next#4)."""

import json
import os

import pytest

from larvanet_tpu.data import fixture


@pytest.mark.slow
def test_soak_real_quick_end_to_end(tmp_path):
    root = str(tmp_path / "fx")
    fixture.generate_realistic(root, n_images=3, n_test=0)
    out = str(tmp_path / "soak.json")

    from tools import soak_real

    report = soak_real.main(["--quick", "--fixture", root, "--out", out])

    pl = report["plateau"]
    assert pl["lr_drops"] >= 2
    lrs = [row["lr"] for row in pl["staircase"]]
    assert lrs[0] > lrs[-1]  # the staircase actually descended
    assert min(lrs) == pytest.approx(lrs[0] * 0.25, rel=1e-6)  # 2 halvings
    assert all(row["psnr"] > 0 for row in pl["staircase"])

    ema = report["ema"]
    assert ema["raw_psnr"] > 0 and ema["ema_psnr"] > 0
    assert "ema_delta_db" in ema

    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk["plateau"]["lr_drops"] == pl["lr_drops"]
