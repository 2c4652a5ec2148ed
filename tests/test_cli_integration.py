"""End-to-end CLI integration: train -> validate -> get_sr -> psnr_trend
on a tiny synthetic dataset, exercising the full flag cascade."""

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


def test_train_validate_get_sr_roundtrip(tree):
    lr, hr, root = tree
    from larvanet_tpu.cli import get_sr, psnr_trend, train, validate

    run_dir = os.path.join(root, "run")
    train.main([
        "--dataloader", "div2k_train_loader", "--model", "edsr",
        "--data_input_path", lr, "--data_truth_path", hr, "--data_cached",
        "--train_path", run_dir, "--max_steps", "4", "--save_freq", "2",
        "--batch_size", "1", "--input_patch_size", "8", "--log_freq", "2",
        *TINY_EDSR,
    ])
    ckpts = sorted(f for f in os.listdir(run_dir) if f.endswith(".ckpt"))
    assert ckpts == ["model_2.ckpt", "model_4.ckpt"]
    assert os.path.exists(os.path.join(run_dir, "arguments.json"))

    psnrs = validate.main([
        "--model", "edsr", "--restore_path", os.path.join(run_dir, "model_4.ckpt"),
        "--data_input_path", lr, "--data_truth_path", hr,
        "--save_path", os.path.join(root, "val_out"), *TINY_EDSR,
    ])
    assert 4 in psnrs and np.isfinite(psnrs[4])
    assert os.path.exists(os.path.join(root, "val_out", "x4", "0000.png"))

    get_sr.main([
        "--model", "edsr", "--input_path", os.path.join(lr, "X4"),
        "--output_path", os.path.join(root, "sr_out"),
        "--restore_path", os.path.join(run_dir, "model_4.ckpt"), *TINY_EDSR,
    ])
    outs = sorted(os.listdir(os.path.join(root, "sr_out")))
    assert outs == ["0000x4.png", "0001x4.png"]
    sr = io.load_image_u8(os.path.join(root, "sr_out", outs[0]))
    assert sr.shape == (48, 48, 3)

    trend = psnr_trend.main([
        "--model", "edsr", "--restore_dir", run_dir,
        "--data_input_path", lr, "--data_truth_path", hr, *TINY_EDSR,
    ])
    assert len(trend) == 2


def test_get_sr_device_uint8_byte_exact(tree):
    """--device_uint8 (default on) must write byte-identical PNGs to the
    f32-pull path — the quantization moved on device, not changed."""
    lr, _, root = tree
    from larvanet_tpu.cli import get_sr
    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(list(TINY_EDSR))
    m.prepare(is_training=True, scales=[4])
    m.global_step = 1
    ckpt = m.save(os.path.join(root, "u8ckpt"))

    for flag, sub in (("1", "sr_u8"), ("0", "sr_f32")):
        get_sr.main([
            "--model", "edsr", "--input_path", os.path.join(lr, "X4"),
            "--output_path", os.path.join(root, sub),
            "--restore_path", ckpt, "--device_uint8", flag, *TINY_EDSR,
        ])
    for name in sorted(os.listdir(os.path.join(root, "sr_u8"))):
        with open(os.path.join(root, "sr_u8", name), "rb") as f:
            a = f.read()
        with open(os.path.join(root, "sr_f32", name), "rb") as f:
            b = f.read()
        assert a == b, name


def test_train_larva_volume_flow(tree):
    lr, hr, root = tree
    from larvanet_tpu.cli import train_larva

    run_dir = os.path.join(root, "larva")
    train_larva.main([
        "--dataloader", "div2k_train_loader", "--model", "LarvaNet",
        "--data_input_path", lr, "--data_truth_path", hr,
        "--val_data_input_path", lr, "--val_data_truth_path", hr,
        "--train_path", run_dir, "--max_steps", "4", "--batch_size", "1",
        "--input_patch_size", "8", "--num_blocks", "1,1",
        "--val_volume", "300", "--log_freq", "2",
    ])
    ckpts = [f for f in os.listdir(run_dir) if f.endswith(".ckpt")]
    assert ckpts, "volume-driven checkpoints missing"


def test_summarize_cli():
    from larvanet_tpu.cli import summarize

    n_params, flops, rows = summarize.main(
        ["--model", "edsr", "--input_width", "16", "--input_height", "16", *TINY_EDSR]
    )
    assert n_params > 0
    assert rows and sum(r[3] for r in rows) == n_params


def test_summarize_edsr_b_per_layer_parity():
    """Pin EDSR-b x4 totals to the derived reference numbers: 1,517,571
    trainable params (SURVEY.md §6, reference models/edsr.py:177-193)
    and torchsummaryX's conv MAC rule — weight elements x out-spatial
    (reference utils/torchsummaryX.py:57-61) — at the 96x96 dummy input."""
    from larvanet_tpu.cli import summarize

    n_params, _, rows = summarize.main(
        ["--model", "edsr", "--input_width", "96", "--input_height", "96"])
    assert n_params == 1_517_571
    assert sum(r[3] for r in rows) == 1_517_571

    s = 96 * 96
    expected_macs = (
        3 * 64 * 9 * s                   # first_conv
        + 16 * 2 * 64 * 64 * 9 * s       # 16 res blocks x 2 convs
        + 64 * 64 * 9 * s                # after_res_conv
        + 64 * 256 * 9 * s               # upsample conv0 (pre-PS2)
        + 64 * 256 * 9 * (192 * 192)     # upsample conv1 (post-PS2)
        + 64 * 3 * 9 * (384 * 384)       # final_conv
    )
    assert sum(r[4] for r in rows) == expected_macs
    # per-layer spot checks (kernel shape in the reference's [in,out,kh,kw])
    by_name = {r[0]: r for r in rows}
    assert by_name["first_conv"][1] == [3, 64, 3, 3]
    assert by_name["first_conv"][4] == 3 * 64 * 9 * s
    assert by_name["res_block_0/conv1"][3] == 36_928
    assert by_name["upsample/conv1"][2] == [1, 256, 192, 192]  # NCHW print
    assert by_name["final_conv"][4] == 64 * 3 * 9 * 384 * 384


def test_validate_int8_report_guardrail(tmp_path, rng):
    """--int8_report runs exact + int8 side by side, reports per-image
    deltas, and refuses to serve past --int8_max_drop (VERDICT r1 #4)."""
    import json

    from larvanet_tpu.cli import validate
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.data import fixture

    root = str(tmp_path / "fx")
    fixture.generate(root, shapes=((16, 18, 0, 0), (14, 16, 0, 0)), scales=(4,))
    m = get_model("edsr")
    m.parse_args(TINY_EDSR)
    m.prepare(is_training=False, scales=[4])
    ck = m.save(str(tmp_path / "run"))

    rep = str(tmp_path / "rep.json")
    argv = [
        "--model", "edsr", "--restore_path", ck, "--dataloader", "basic_loader",
        "--data_input_path", os.path.join(root, "x4", "input"),
        "--data_truth_path", os.path.join(root, "x4", "truth"),
        "--int8_trunk", "1", "--int8_report", "--report_json", rep, *TINY_EDSR,
    ]
    validate.main(argv + ["--int8_max_drop", "5.0"])  # generous: must pass
    with open(rep) as f:
        data = json.load(f)["scales"]["4"]["int8_vs_exact"]
    assert set(data["per_image_delta"]) == {"img000", "img001"}
    assert abs(data["mean_delta_db"]) < 5.0

    with pytest.raises(SystemExit) as exc:  # impossible threshold: must refuse
        validate.main(argv + ["--int8_max_drop", "-1.0"])
    assert exc.value.code == 3


def test_int8_calib_batch_shapes():
    """The calibration batch stacks N centre-cropped even-width inputs."""
    from larvanet_tpu.cli import common

    class Loader:
        def get_num_images(self):
            return 3

        def get_image_pair(self, image_index, scale):
            h, w = [(20, 31), (24, 22), (22, 26)][image_index]
            return np.zeros((3, h, w), np.float32), None, "i%d" % image_index

    batch = common.int8_calib_batch(Loader(), 4, num_images=4)
    assert batch.shape == (3, 20, 22, 3)
    assert batch.dtype == np.float32


def test_train_schedule_validation_cadence(tree):
    """train_schedule: val-driven plateau LR + checkpoint every N epochs
    (reference train_schedule.py:139-164), host loop and the fused
    device-pipeline path producing the same cadence."""
    lr, hr, root = tree
    from larvanet_tpu.cli import train_schedule

    flat_lr = os.path.join(root, "LRflat")
    os.makedirs(flat_lr, exist_ok=True)
    for f in os.listdir(os.path.join(lr, "X4")):
        img = io.load_image_u8(os.path.join(lr, "X4", f))
        io.save_image_hwc(img, os.path.join(flat_lr, f.replace("x4", "")))

    for tag, extra in (("host", []), ("dev", ["--device_pipeline", "2"])):
        run_dir = os.path.join(root, "sched_" + tag)
        train_schedule.main([
            "--dataloader", "div2k_train_loader", "--model", "hrsr",
            "--data_input_path", lr, "--data_truth_path", hr, "--data_cached",
            "--val_data_input_path", flat_lr, "--val_data_truth_path", hr,
            "--dataloader_val", "basic_loader",
            "--train_path", run_dir, "--max_steps", "6", "--batch_size", "1",
            "--input_patch_size", "8", "--step_per_epoch", "0.3",
            "--num_lr_blocks", "1", "--num_hr_blocks", "0",
            "--num_hr_filters", "3", "--log_freq", "2", *extra,
        ])
        ckpts = [f for f in os.listdir(run_dir) if f.endswith(".ckpt")]
        assert ckpts, "no validation-driven checkpoints written (%s)" % tag
