"""Gradient accumulation (`--grad_accum`, models/base.py
_accumulated_grads): a lax.scan over equal microbatches inside one jit.

Every family's loss is an elementwise mean (train/losses.py), so the
mean of equal-microbatch gradients IS the full-batch gradient — the
accumulated step must match the plain step to float tolerance, for the
single-exit contract (edsr) and the multi-exit one (LarvaNet), and
compose with the device-resident pipeline's inlined step.
"""

import numpy as np
import jax
import pytest

from larvanet_tpu.core.registry import get_model


def _edsr(accum=1):
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=True, scales=[4])
    m.grad_accum = accum
    return m


def _larva(accum=1):
    m = get_model("LarvaNet")
    m.parse_args(["--num_blocks", "1,1"])
    m.prepare(is_training=True, scales=[4])
    m.grad_accum = accum
    return m


def _batch(rng, n=4):
    x = rng.uniform(0, 255, (n, 3, 8, 8)).astype(np.float32)
    t = rng.uniform(0, 255, (n, 3, 32, 32)).astype(np.float32)
    return list(x), list(t)


@pytest.mark.parametrize("factory", [_edsr, _larva], ids=["edsr", "LarvaNet"])
def test_accum_step_matches_plain_step(factory):
    rng = np.random.default_rng(0)
    x, t = _batch(rng)
    plain, accum = factory(1), factory(2)

    loss_p = plain.train_step(x, 4, t)
    loss_a = accum.train_step(x, 4, t)
    # f32 summation order differs between one mean and a scan of
    # microbatch means — identical up to rounding, not bit-exact
    assert abs(loss_p - loss_a) / max(1.0, abs(loss_p)) < 2e-5

    for a, b in zip(jax.tree_util.tree_leaves(plain.params),
                    jax.tree_util.tree_leaves(accum.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_accum_multiple_steps_stay_close():
    rng = np.random.default_rng(1)
    plain, accum = _edsr(1), _edsr(4)
    for _ in range(3):
        x, t = _batch(rng)
        loss_p = plain.train_step(x, 4, t)
        loss_a = accum.train_step(x, 4, t)
        assert abs(loss_p - loss_a) / max(1.0, abs(loss_p)) < 1e-4


def test_accum_rejects_indivisible_batch():
    rng = np.random.default_rng(2)
    m = _edsr(3)
    x, t = _batch(rng, n=4)  # 4 % 3 != 0
    with pytest.raises(ValueError, match="divisible"):
        m.train_step(x, 4, t)


def test_accum_composes_with_device_pipeline():
    """grad_accum inside the HBM-resident pipeline's fused
    sample+step loop (device_pipeline.make_device_train_fn:151 calls
    _train_step_impl, which routes through _accumulated_grads)."""
    from larvanet_tpu.data.device_pipeline import DevicePipeline, make_device_train_fn

    rng = np.random.default_rng(3)
    lr_imgs = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(2)]
    hr_imgs = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(2)]

    m = _edsr(2)
    pipe = DevicePipeline.from_arrays(lr_imgs, hr_imgs, 4)
    step = make_device_train_fn(m, pipe, batch_size=4, patch=8, steps_per_call=2)
    params, opt_state, loss = step(m.params, m.opt_state, 1e-4, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
