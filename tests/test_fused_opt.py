"""--fused_opt: one vectorized Adam pass over a ravel_pytree vector
(optax.flatten) must be numerically identical to the per-leaf layout,
and checkpoints must convert between the two layouts on restore
(models/base.py make_optimizer / _adapt_opt_layout)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from larvanet_tpu.core.registry import get_model


def _make(fused, ema=0.0):
    m = get_model("edsr")
    m.parse_args(["--edsr_conv_features", "8", "--edsr_res_blocks", "1"])
    if fused:
        m.fused_opt = 1
    if ema:
        m.ema_decay = ema
    m.prepare(is_training=True, scales=[4])
    return m


def _steps(m, n, rng):
    x = jnp.asarray(rng.uniform(0, 255, (2, 12, 12, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)).astype(np.float32))
    losses = []
    for _ in range(n):
        m.params, m.opt_state, loss = m._train_step_impl(
            m.params, m.opt_state, jnp.float32(1e-3), x, t)
        losses.append(float(loss))
    return losses


def test_fused_matches_per_leaf(rng):
    m0, m1 = _make(False), _make(True)
    l0 = _steps(m0, 4, np.random.default_rng(3))
    l1 = _steps(m1, 4, np.random.default_rng(3))
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    f0 = np.asarray(jax.flatten_util.ravel_pytree(m0.params)[0])
    f1 = np.asarray(jax.flatten_util.ravel_pytree(m1.params)[0])
    np.testing.assert_allclose(f1, f0, atol=1e-6)


@pytest.mark.parametrize("save_fused,load_fused", [(False, True), (True, False)])
def test_opt_layout_converts_on_restore(tmp_path, save_fused, load_fused, rng):
    src = _make(save_fused)
    _steps(src, 3, np.random.default_rng(5))
    src.global_step = 3
    ckpt = src.save(str(tmp_path))

    dst = _make(load_fused)
    dst.restore(ckpt_path=ckpt)
    # the converted moments drive an identical next step
    ls = _steps(src, 1, np.random.default_rng(7))
    ld = _steps(dst, 1, np.random.default_rng(7))
    np.testing.assert_allclose(ld, ls, rtol=1e-6)
    fs = np.asarray(jax.flatten_util.ravel_pytree(src.params)[0])
    fd = np.asarray(jax.flatten_util.ravel_pytree(dst.params)[0])
    np.testing.assert_allclose(fd, fs, atol=1e-6)


def test_fused_with_ema(rng):
    """EMA rides OUTSIDE the flatten wrapper: per-leaf EmaState is
    preserved (find_ema keeps working for --ema serving)."""
    from larvanet_tpu.models.base import find_ema

    m = _make(True, ema=0.99)
    _steps(m, 2, np.random.default_rng(9))
    ema = find_ema(m.opt_state)
    assert ema is not None
    # params-shaped, not a flat vector
    assert jax.tree_util.tree_structure(ema) == \
        jax.tree_util.tree_structure(m.params)
