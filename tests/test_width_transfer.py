"""Function-preserving width transfer (utils/width_transfer.py +
--widen_from): warm-start LarvaNet_w64 from a 48-channel checkpoint.
Pins (a) EXACT function preservation at step 0 (plain and packed
graphs), (b) the new channels actually train (gradients reach the new
kernel slices), (c) the CLI flow incl. the topology-mismatch and
restore-conflict guards."""

import numpy as np
import jax
import pytest
from flax import serialization

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.utils.width_transfer import widen_params


def _model(name, flags, training=False):
    m = get_model(name)
    m.parse_args(list(flags))
    m.prepare(is_training=training, scales=[4])
    return m


def _widened_pair(seed=0):
    rng = np.random.default_rng(seed)
    narrow = _model("LarvaNet", ["--num_blocks", "2,2"], training=True)
    # give the narrow model non-init weights (a short "trained" state)
    x = [im.transpose(2, 0, 1) for im in
         np.asarray(rng.uniform(0, 255, (2, 8, 8, 3)), np.float32)]
    y = [im.transpose(2, 0, 1) for im in
         np.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), np.float32)]
    narrow.train_step(x, 4, y, summary=None)
    wide = _model("LarvaNet_w64", ["--num_blocks", "2,2", "--num_features", "64"],
                  training=True)
    wide.params = widen_params(narrow.params, wide.params)
    wide.opt_state = wide.tx.init(wide.params)
    return narrow, wide, rng


def test_widening_preserves_the_function_exactly():
    narrow, wide, rng = _widened_pair()
    x = np.asarray(rng.uniform(0, 255, (1, 12, 12, 3)), np.float32)
    # plain module graphs (float tolerance: the wider conv reduces the
    # SAME nonzero terms in a different summation order; measured
    # ~9e-6 relative)
    out_n = np.asarray(narrow.module.apply({"params": narrow.params}, x))
    out_w = np.asarray(wide.module.apply({"params": wide.params}, x))
    np.testing.assert_allclose(out_w, out_n, rtol=1e-4, atol=1e-3)
    # and the packed serving graphs agree too (what production runs)
    from larvanet_tpu.ops.packed_trunk import make_packed_larvanet_forward

    pn = np.asarray(make_packed_larvanet_forward(narrow)(narrow.params, x))
    pw = np.asarray(make_packed_larvanet_forward(wide)(wide.params, x))
    np.testing.assert_allclose(pw, pn, atol=1e-4)


def test_new_channels_train_into_use():
    _, wide, rng = _widened_pair(seed=1)
    x = np.asarray(rng.uniform(0, 255, (2, 8, 8, 3)), np.float32)
    y = np.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), np.float32)
    grads = jax.grad(wide._compute_loss)(wide.params, x, y)
    sg = serialization.to_state_dict(grads)
    # the zero rows that READ the new channels get real gradients at
    # step 0 (the net2net dead-unit fix): conv1's new-input rows
    g = np.asarray(sg["body_0"]["block_0"]["conv1"]["kernel"])[:, :, 48:, :]
    assert float(np.max(np.abs(g))) > 0
    # deeper slices unlock progressively (every path to the loss crosses
    # one zero slice at init): after a few steps the head's new output
    # slots must have MOVED from their init, i.e. they are training
    head0 = np.asarray(serialization.to_state_dict(
        wide.params)["head"]["kernel"])[:, :, :, 48:].copy()
    xs = [im.transpose(2, 0, 1) for im in x]
    ys = [im.transpose(2, 0, 1) for im in y]
    for _ in range(4):
        wide.train_step(xs, 4, ys, summary=None)
    head1 = np.asarray(serialization.to_state_dict(
        wide.params)["head"]["kernel"])[:, :, :, 48:]
    assert float(np.max(np.abs(head1 - head0))) > 0


def test_topology_mismatch_raises():
    narrow = _model("LarvaNet", ["--num_blocks", "2,2"])
    wide = _model("LarvaNet_w64", ["--num_blocks", "1,1", "--num_features", "64"])
    with pytest.raises(ValueError, match="topology"):
        widen_params(narrow.params, wide.params)


def test_widen_from_cli(tmp_path):
    from larvanet_tpu.cli import train as train_cli
    from larvanet_tpu.data.io import save_image_hwc

    rng = np.random.default_rng(2)
    for i in range(2):
        hr = np.asarray(rng.uniform(0, 255, (64, 64, 3)), np.float32)
        save_image_hwc(hr, str(tmp_path / "HR" / ("%04d.png" % i)))
        save_image_hwc(hr[::4, ::4], str(tmp_path / "LR/X4" / ("%04dx4.png" % i)))
    data = ["--dataloader", "div2k_train_loader", "--scales", "4",
            "--data_input_path", str(tmp_path / "LR"),
            "--data_truth_path", str(tmp_path / "HR"),
            "--max_steps", "5", "--save_freq", "5", "--log_freq", "10",
            "--batch_size", "2", "--input_patch_size", "8"]
    # train the narrow model briefly
    train_cli.main(data + ["--model", "LarvaNet", "--num_blocks", "1,1",
                           "--train_path", str(tmp_path / "n48")])
    ckpt = str(tmp_path / "n48" / "model_step5_vol0G.ckpt")
    # widen into w64 and continue training through the CLI
    train_cli.main(data + ["--model", "LarvaNet_w64", "--num_blocks", "1,1",
                           "--num_features", "64",
                           "--widen_from", ckpt,
                           "--train_path", str(tmp_path / "w64")])
    import os

    assert os.path.exists(str(tmp_path / "w64" / "model_step5_vol0G.ckpt"))
    # conflict guard
    with pytest.raises(SystemExit, match="mutually exclusive"):
        train_cli.main(data + ["--model", "LarvaNet_w64", "--num_blocks", "1,1",
                               "--num_features", "64", "--widen_from", ckpt,
                               "--restore_path", ckpt,
                               "--train_path", str(tmp_path / "w64b")])
