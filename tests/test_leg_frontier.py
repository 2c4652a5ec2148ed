"""LarvaLeg_w64 preset + trained-checkpoint -> early-exit restore path
used by tools/leg_frontier.py (VERDICT r4 next#3: the anytime-inference
frontier; leg semantics per reference LarvaLeg.py:289-299)."""

import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model

TINY = ["--num_modules", "2", "--num_blocks", "2,2"]


def _train_tiny(name, flags, tmp_path, steps=2):
    m = get_model(name)
    m.parse_args(list(flags))
    m.prepare(is_training=True, scales=[4])
    rng = np.random.default_rng(0)
    for _ in range(steps):
        x = rng.uniform(0, 255, (2, 3, 8, 8)).astype(np.float32)
        t = rng.uniform(0, 255, (2, 3, 32, 32)).astype(np.float32)
        m.train_step(x, 4, t, None)
    return m.save(base_path=str(tmp_path))


@pytest.mark.parametrize("src,dst", [
    ("LarvaNet", "LarvaLeg"),
    ("LarvaNet_w64", "LarvaLeg_w64"),
])
def test_trained_ckpt_restores_into_leg_preset(src, dst, tmp_path):
    ckpt = _train_tiny(src, TINY, tmp_path)
    src_m = get_model(src)
    src_m.parse_args(list(TINY))
    src_m.prepare(is_training=False, scales=[4])
    src_m.restore(ckpt_path=ckpt, strict=False)

    x = np.random.default_rng(1).uniform(0, 255, (3, 8, 8)).astype(np.float32)
    full = src_m.upscale([x], 4)[0]

    # leg = M reproduces the full forward exactly (exit through the last
    # leg IS the inference path for non-tail models)
    m2 = get_model(dst)
    m2.parse_args(list(TINY) + ["--leg", "2"])
    m2.prepare(is_training=False, scales=[4])
    m2.restore(ckpt_path=ckpt, strict=False)
    out2 = m2.upscale([x], 4)[0]
    np.testing.assert_allclose(out2, full, atol=1e-4)

    # leg = 0 is the pure interpolated base (reference LarvaLeg.py:289)
    m0 = get_model(dst)
    m0.parse_args(list(TINY) + ["--leg", "0"])
    m0.prepare(is_training=False, scales=[4])
    m0.restore(ckpt_path=ckpt, strict=False)
    out0 = m0.upscale([x], 4)[0]
    assert not np.allclose(out0, full, atol=1e-3)

    # leg = 1 differs from both endpoints (a genuine intermediate exit)
    m1 = get_model(dst)
    m1.parse_args(list(TINY) + ["--leg", "1"])
    m1.prepare(is_training=False, scales=[4])
    m1.restore(ckpt_path=ckpt, strict=False)
    out1 = m1.upscale([x], 4)[0]
    assert not np.allclose(out1, full, atol=1e-3)
    assert not np.allclose(out1, out0, atol=1e-3)


def test_leg_w64_registered_and_packs():
    m = get_model("LarvaLeg_w64")
    m.parse_args(list(TINY) + ["--leg", "1"])
    m.prepare(is_training=False, scales=[4])
    assert m.args.num_features == 64
    x = np.random.default_rng(2).uniform(0, 255, (3, 8, 8)).astype(np.float32)
    out = m.upscale([x], 4)[0]
    assert out.shape == (3, 32, 32)
    assert np.all(np.isfinite(out))
