"""The deployment runbook (docs/SERVING.md golden path) as one
integration test: EMA training -> int8 guardrail on the EMA weights ->
int8+EMA StableHLO artifact export -> artifact validation -> artifact
serving. Guards every flag interaction the runbook promises composes
(ema x int8_report, ema x export, int8 x artifact, tiled artifact
serving)."""

import numpy as np
import pytest

from larvanet_tpu.cli import export, serve, train, validate


W64 = ["--model", "LarvaNet_w64", "--num_blocks", "1,1", "--num_features", "16"]


@pytest.mark.slow  # ~2.5 min of CPU compiles (train + int8 + artifact graphs)
def test_deployment_runbook_end_to_end(tmp_path):
    from larvanet_tpu.data.io import save_image_hwc

    rng = np.random.default_rng(0)
    for i in range(3):
        hr = np.asarray(rng.uniform(0, 255, (96, 96, 3)), np.float32)
        save_image_hwc(hr, str(tmp_path / "HR" / ("%04d.png" % i)))
        save_image_hwc(hr[::4, ::4], str(tmp_path / "LR/X4" / ("%04dx4.png" % i)))
        save_image_hwc(hr, str(tmp_path / "flat_truth" / ("%04d.png" % i)))
        save_image_hwc(hr[::4, ::4], str(tmp_path / "flat_input" / ("%04d.png" % i)))

    # 1) train with EMA
    train.main(["--dataloader", "div2k_train_loader", "--scales", "4",
                "--data_input_path", str(tmp_path / "LR"),
                "--data_truth_path", str(tmp_path / "HR"),
                "--train_path", str(tmp_path / "run"), "--max_steps", "10",
                "--save_freq", "10", "--log_freq", "10", "--batch_size", "2",
                "--input_patch_size", "8", "--ema_decay", "0.9"] + W64)
    ckpt = str(tmp_path / "run" / "model_step10_vol0G.ckpt")

    flat = ["--dataloader", "basic_loader", "--scales", "4",
            "--data_input_path", str(tmp_path / "flat_input"),
            "--data_truth_path", str(tmp_path / "flat_truth")]

    # 2) int8 guardrail on the EMA weights (generous threshold: the
    #    10-step model's deltas are noise; the COMPOSITION is the test)
    validate.main(flat + ["--restore_path", ckpt, "--ema", "1",
                          "--int8_trunk", "1", "--int8_report",
                          "--int8_max_drop", "5.0"] + W64)

    # 3) bake the int8 + EMA artifact
    art = str(tmp_path / "w64.lvt")
    export.main(["--restore_path", ckpt, "--ema", "1", "--stablehlo", art,
                 "--export_batch", "2", "--export_height", "16",
                 "--export_width", "16", "--int8_trunk", "1",
                 "--calib_path", str(tmp_path / "flat_input")] + W64)

    # 4) validate THE FILE
    res = validate.main(flat + ["--artifact", art, "--tile_forward",
                                "--tile_overlap", "8"])
    assert np.isfinite(res[4])

    # 5) serve THE FILE (tiled, odd frame size)
    svc = serve.ArtifactService(art, tile=True, tile_overlap=8)
    svc.warmup(16, 16)
    out = svc.upscale_chw(np.zeros((3, 24, 24), np.float32))
    assert out.shape == (3, 96, 96)
    info = svc.info()
    assert info["mode"] == "artifact-tile"
    assert info["model"] == "LarvaNet_w64"
