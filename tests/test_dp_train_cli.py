"""--dp_devices on the train CLIs (cli/common.maybe_dp_train): the host
loop is unchanged while the global batch shards over a 'data' mesh and
XLA all-reduces the gradients. Pins CLI-level equality: with
--data_seed, a 4-device DP run produces the SAME final checkpoint
params as the single-device run (the library-level step equality is
tests/test_parallel.py; this covers the CLI wiring end-to-end), plus
the guard rails (batch divisibility, device-pipeline conflict)."""

import numpy as np
import pytest
from flax import serialization

from larvanet_tpu.cli import train as train_cli


TINY = ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"]


def _tree(tmp_path):
    from larvanet_tpu.data.io import save_image_hwc

    rng = np.random.default_rng(0)
    for i in range(2):
        hr = np.asarray(rng.uniform(0, 255, (64, 64, 3)), np.float32)
        save_image_hwc(hr, str(tmp_path / "HR" / ("%04d.png" % i)))
        save_image_hwc(hr[::4, ::4], str(tmp_path / "LR/X4" / ("%04dx4.png" % i)))


def _train(tmp_path, run, extra):
    train_cli.main([
        "--dataloader", "div2k_train_loader", "--model", "edsr", "--scales", "4",
        "--data_input_path", str(tmp_path / "LR"),
        "--data_truth_path", str(tmp_path / "HR"),
        "--train_path", str(tmp_path / run), "--max_steps", "3",
        "--log_freq", "10", "--save_freq", "3", "--batch_size", "4",
        "--input_patch_size", "8", "--data_seed", "7"] + TINY + extra)
    import flax.serialization as ser

    with open(str(tmp_path / run / "model_3.ckpt"), "rb") as f:
        return ser.msgpack_restore(f.read())["params"]


def test_dp_cli_matches_single_device(tmp_path):
    _tree(tmp_path)
    single = _train(tmp_path, "run1", [])
    dp = _train(tmp_path, "run4", ["--dp_devices", "4"])
    s_flat = serialization.to_state_dict(single)
    d_flat = serialization.to_state_dict(dp)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(s_flat),
                    jax.tree_util.tree_leaves(d_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_dp_cli_guards(tmp_path):
    _tree(tmp_path)
    with pytest.raises(SystemExit, match="divisible"):
        _train(tmp_path, "runbad", ["--dp_devices", "3"])
    with pytest.raises(SystemExit, match="device_pipeline"):
        _train(tmp_path, "runbad2", ["--dp_devices", "4",
                                     "--device_pipeline", "10"])
