"""tools/recipe_full.py orchestration machinery (VERDICT r3 next#1).

The TPU artifact (RECIPE_FULL.json) is produced by the real 300k-step
runs; these tests pin the orchestrator itself on CPU: stream_cli
parses the device-pipeline training CLI's output, kills at the
requested step, `latest` resume continues from the checkpoint, and a
crashed CLI yields a structured failure (tools/resilience contract).
Fast tier: the uniform-val-crop builder's geometry contract.
"""

import os

import numpy as np
import pytest

from tools import recipe_full


def _dataset(tmp_path, n=3, lh=20, lw=24):
    from larvanet_tpu.data.io import save_image_hwc

    rng = np.random.default_rng(0)
    for i in range(n):
        hr = rng.integers(0, 255, (lh * 4 + (i % 2), lw * 4, 3), np.uint8)
        lr = hr[: lh * 4: 4, : lw * 4: 4]
        save_image_hwc(hr, str(tmp_path / "truth" / ("im%d.png" % i)))
        save_image_hwc(lr, str(tmp_path / "input" / ("im%d.png" % i)))
    return str(tmp_path / "input"), str(tmp_path / "truth")


def test_ensure_uniform_val_geometry(tmp_path):
    out = recipe_full.ensure_uniform_val(
        src_root="data/fixture_real", out_root=str(tmp_path / "val"),
        n=4, lh=72, lw=110)
    from larvanet_tpu.data.io import load_image_u8

    names = sorted(os.listdir(os.path.join(out, "input")))
    assert len(names) == 4
    for f in names:
        lr = load_image_u8(os.path.join(out, "input", f))
        hr = load_image_u8(os.path.join(out, "truth", f))
        assert lr.shape == (72, 110, 3)
        assert hr.shape == (288, 440, 3)
    # idempotent (no rewrite when already materialized)
    assert recipe_full.ensure_uniform_val(
        src_root="data/fixture_real", out_root=str(tmp_path / "val"),
        n=4, lh=72, lw=110) == out


@pytest.mark.slow
def test_stream_cli_kill_and_latest_resume(tmp_path, monkeypatch):
    monkeypatch.setenv("LVT_PLATFORM", "cpu")
    inp, tru = _dataset(tmp_path)
    run = str(tmp_path / "run")
    base = ["larvanet_tpu.cli.train",
            "--dataloader", "basic_loader", "--scales", "4",
            "--data_input_path", inp, "--data_truth_path", tru,
            "--train_path", run, "--model", "edsr",
            "--edsr_res_blocks", "1", "--edsr_conv_features", "8",
            "--batch_size", "2", "--input_patch_size", "12",
            "--device_pipeline", "5", "--save_freq", "10",
            "--max_steps", "40"]
    log = str(tmp_path / "log.txt")

    r1 = recipe_full.stream_cli(base, log, kill_at_step=25, timeout=600)
    assert r1["ok"] and r1["killed_at"] == 25
    assert any("model_" in c for c in os.listdir(run))

    r2 = recipe_full.stream_cli(base + ["--restore_path", "latest"], log,
                                timeout=600)
    assert r2["ok"] and not r2["killed_at"]
    first = r2["chunks"][0]["step"]
    assert first > 5  # resumed from a checkpoint, not from scratch
    assert r2["chunks"][-1]["step"] == 40
    assert os.path.exists(os.path.join(run, "model_40.ckpt"))


@pytest.mark.slow
def test_stream_cli_crash_is_structured(tmp_path):
    r = recipe_full.stream_cli(
        ["larvanet_tpu.cli.train", "--no_such_flag_at_all"],
        str(tmp_path / "log.txt"), timeout=300)
    assert r["ok"] is False and "rc=" in r["error"]
