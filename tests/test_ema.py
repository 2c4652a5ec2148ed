"""Parameter EMA (--ema_decay / --ema): an optax transform whose state
rides in opt_state, so it threads through every jitted step and
checkpoint unchanged (models/base.param_ema). Pins the recursion math,
checkpoint round-trips (train resume AND eval-side --ema restore),
the structure-compatibility guarantee for pre-EMA checkpoints, and the
no-EMA error path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import serialization

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.models.base import find_ema


TINY = ["--edsr_res_blocks", "1", "--edsr_conv_features", "8"]


def _model(ema_decay=0.0, training=True):
    m = get_model("edsr")
    m.parse_args(list(TINY))
    if ema_decay:
        m.ema_decay = ema_decay
    m.prepare(is_training=training, scales=[4])
    return m


def _batch(rng):
    x = np.asarray(rng.uniform(0, 255, (2, 8, 8, 3)), np.float32)
    y = np.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), np.float32)
    return [im.transpose(2, 0, 1) for im in x], [im.transpose(2, 0, 1) for im in y]


def test_ema_recursion_matches_manual():
    decay = 0.5
    m = _model(ema_decay=decay)
    rng = np.random.default_rng(0)

    expected = jax.tree_util.tree_map(np.asarray, m.params)  # init = params
    for _ in range(3):
        xs, ys = _batch(rng)
        m.train_step(xs, 4, ys, summary=None)
        expected = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            expected, m.params)

    got = find_ema(m.opt_state)
    assert got is not None
    for e, g in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), e, rtol=1e-5, atol=1e-5)
    # and the average genuinely lags the live params after updates
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree_util.tree_leaves(m.params),
                             jax.tree_util.tree_leaves(got))]
    assert max(diffs) > 0


def test_ema_checkpoint_roundtrip_and_eval_restore(tmp_path):
    m = _model(ema_decay=0.9)
    rng = np.random.default_rng(1)
    for _ in range(2):
        xs, ys = _batch(rng)
        m.train_step(xs, 4, ys, summary=None)
    m.global_step = 2
    ckpt = m.save(str(tmp_path))
    ema_saved = jax.tree_util.tree_map(np.asarray, find_ema(m.opt_state))

    # training resume keeps the EMA state inside opt_state
    m2 = _model(ema_decay=0.9)
    m2.restore(ckpt)
    for a, b in zip(jax.tree_util.tree_leaves(ema_saved),
                    jax.tree_util.tree_leaves(find_ema(m2.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval-side restore serves the average via use_ema_params
    m3 = _model(training=False)
    m3.restore(ckpt)
    raw = serialization.to_state_dict(m3.params)
    m3.use_ema_params()
    ema_state = serialization.to_state_dict(m3.params)
    flat_saved = jax.tree_util.tree_leaves(
        serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, ema_saved)))
    for a, b in zip(flat_saved, jax.tree_util.tree_leaves(ema_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA differs from the live weights (the swap did something)
    assert any(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 0
        for a, b in zip(jax.tree_util.tree_leaves(raw),
                        jax.tree_util.tree_leaves(ema_state)))


def test_pre_ema_checkpoints_still_restore(tmp_path):
    """ema_decay=0 must keep the historical opt_state structure."""
    m = _model()
    rng = np.random.default_rng(2)
    xs, ys = _batch(rng)
    m.train_step(xs, 4, ys, summary=None)
    m.global_step = 1
    ckpt = m.save(str(tmp_path))

    m2 = _model()
    m2.restore(ckpt)  # must not raise
    assert m2.global_step == 1
    assert find_ema(m2.opt_state) is None


def test_ema_mismatch_raises_clearly(tmp_path):
    m = _model()  # no EMA
    m.global_step = 1
    ckpt = m.save(str(tmp_path))
    m2 = _model(ema_decay=0.9)
    with pytest.raises(ValueError, match="ema_decay"):
        m2.restore(ckpt)


def test_use_ema_without_ema_checkpoint_raises(tmp_path):
    m = _model()
    m.global_step = 1
    ckpt = m.save(str(tmp_path))
    m2 = _model(training=False)
    m2.restore(ckpt)
    with pytest.raises(ValueError, match="ema_decay"):
        m2.use_ema_params()


def test_ema_train_cli_and_validate_ema(tmp_path):
    """End-to-end through the CLIs: train with --ema_decay, then restore
    with use_ema_params and check the forward runs."""
    from larvanet_tpu.cli import train as train_cli
    from larvanet_tpu.data.io import save_image_hwc

    rng = np.random.default_rng(3)
    for i in range(2):
        hr = np.asarray(rng.uniform(0, 255, (64, 64, 3)), np.float32)
        save_image_hwc(hr, str(tmp_path / "HR" / ("%04d.png" % i)))
        save_image_hwc(hr[::4, ::4], str(tmp_path / "LR/X4" / ("%04dx4.png" % i)))

    train_cli.main([
        "--dataloader", "div2k_train_loader", "--model", "edsr", "--scales", "4",
        "--data_input_path", str(tmp_path / "LR"),
        "--data_truth_path", str(tmp_path / "HR"),
        "--train_path", str(tmp_path / "run"), "--max_steps", "3",
        "--log_freq", "10", "--save_freq", "3", "--batch_size", "2",
        "--input_patch_size", "8", "--ema_decay", "0.9"] + TINY)

    m = _model(training=False)
    m.restore(str(tmp_path / "run" / "model_3.ckpt"))
    m.use_ema_params()
    out = m.upscale(input_list=[np.zeros((3, 8, 8), np.float32)], scale=4)[0]
    assert out.shape == (3, 32, 32)


def test_export_ema_artifact(tmp_path):
    """cli/export --ema bakes the averaged weights into the artifact."""
    from larvanet_tpu.cli import export as export_cli
    from larvanet_tpu.utils import aot

    m = _model(ema_decay=0.9)
    rng = np.random.default_rng(9)
    for _ in range(2):
        xs, ys = _batch(rng)
        m.train_step(xs, 4, ys, summary=None)
    m.global_step = 2
    ckpt = m.save(str(tmp_path))

    for flag, name in ([], "raw.lvt"), (["--ema", "1"], "ema.lvt"):
        export_cli.main(["--model", "edsr", "--restore_path", ckpt,
                         "--stablehlo", str(tmp_path / name),
                         "--export_batch", "1", "--export_height", "8",
                         "--export_width", "8"] + TINY + flag)
    raw_serve, _ = aot.load_artifact(str(tmp_path / "raw.lvt"))
    ema_serve, _ = aot.load_artifact(str(tmp_path / "ema.lvt"))
    x = np.asarray(np.random.default_rng(10).uniform(0, 255, (1, 8, 8, 3)),
                   np.float32)
    assert float(np.max(np.abs(np.asarray(raw_serve(x))
                               - np.asarray(ema_serve(x))))) > 0
