"""--wino_trunk CLI routing (cli/common.maybe_wino_trunk): validate with
the fused Pallas Winograd trunk must reproduce the standard packed
path's PSNR (float tolerance) and fall back cleanly off-TPU."""

import os

import numpy as np
import pytest

from larvanet_tpu.data import io

TINY_EDSR = ["--edsr_conv_features", "8", "--edsr_res_blocks", "1"]


@pytest.fixture
def tree(tmp_path, rng):
    lr, hr = tmp_path / "LR", tmp_path / "HR"
    (lr / "X4").mkdir(parents=True)
    hr.mkdir()
    for i in range(2):
        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        io.save_image_hwc(img, str(hr / ("%04d.png" % i)))
        io.save_image_hwc(img[::4, ::4], str(lr / "X4" / ("%04dx4.png" % i)))
    return str(lr), str(hr), str(tmp_path)


@pytest.fixture
def ckpt(tmp_path):
    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(list(TINY_EDSR))
    m.prepare(is_training=True, scales=[4])
    m.global_step = 1
    return m.save(str(tmp_path))


@pytest.mark.parametrize("m", [2, 4])
def test_validate_wino_matches_packed(tree, ckpt, monkeypatch, m):
    lr, hr, root = tree
    from larvanet_tpu.cli import validate

    base = ["--model", "edsr", "--restore_path", ckpt,
            "--data_input_path", lr, "--data_truth_path", hr, *TINY_EDSR]
    ref = validate.main(base)
    monkeypatch.setenv("LVT_WINO_INTERPRET", "1")
    got = validate.main(base + ["--wino_trunk", str(m)])
    assert got[4] == pytest.approx(ref[4], abs=1e-3)


def test_wino_falls_back_off_tpu(tree, ckpt, capsys):
    """Without a TPU (and without the interpret override) the flag must
    fall back to the standard path, not crash."""
    lr, hr, _ = tree
    from larvanet_tpu.cli import validate

    assert not os.environ.get("LVT_WINO_INTERPRET")
    psnrs = validate.main([
        "--model", "edsr", "--restore_path", ckpt,
        "--data_input_path", lr, "--data_truth_path", hr,
        "--wino_trunk", "2", *TINY_EDSR])
    assert np.isfinite(psnrs[4])
    assert "no TPU backend" in capsys.readouterr().out


def test_wino_bad_value_rejected(tree, ckpt):
    lr, hr, _ = tree
    from larvanet_tpu.cli import validate

    with pytest.raises(SystemExit, match="wino_trunk"):
        validate.main([
            "--model", "edsr", "--restore_path", ckpt,
            "--data_input_path", lr, "--data_truth_path", hr,
            "--wino_trunk", "3", *TINY_EDSR])
