"""--remat (ops/packed_trunk.remat_pair): jax.checkpoint over each packed
conv pair. Pins (a) loss/grad equivalence with the unwrapped training
graph and (b) an actual peak-temp-memory reduction in the COMPILED
backward (XLA memory analysis), which is the whole point of the flag."""

import numpy as np
import jax
import jax.numpy as jnp

from larvanet_tpu.core.registry import get_model


def _model(remat, blocks=8):
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", str(blocks), "--edsr_conv_features", "8",
                  "--remat", "1" if remat else "0"])
    m.prepare(is_training=True, scales=[4])
    return m


def test_remat_loss_and_grads_match():
    plain = _model(False, blocks=3)
    remat = _model(True, blocks=3)
    remat.params = plain.params  # same weights
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)), jnp.float32)

    lp, gp = jax.value_and_grad(plain._compute_loss)(plain.params, x, y)
    lr, gr = jax.value_and_grad(remat._compute_loss)(remat.params, x, y)
    assert np.allclose(float(lp), float(lr), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)


def test_remat_recomputes_in_backward():
    """Structural check (CPU XLA's memory analysis does not model the
    TPU scheduler, so the MB effect is measured on hardware instead:
    EDSR-16 batch 8 x 192² temp 4313 -> 3145 MB, msrr_reduced-32
    7304 -> 5016 MB — see remat_pair's docstring/BASELINE.md): the
    remat backward must contain the recompute convolutions."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)

    def conv_count(model):
        fn = jax.jit(jax.value_and_grad(model._compute_loss))
        return fn.lower(model.params, x, y).as_text().count(
            "stablehlo.convolution")

    plain = conv_count(_model(False, blocks=4))
    remat = conv_count(_model(True, blocks=4))
    # one recompute conv per checkpointed pair lands in the backward
    # (conv_a's post-activation is the only intermediate the pair's
    # backward needs; conv_b's output grad is residual pass-through)
    assert remat >= plain + 4, (plain, remat)


def test_remat_requires_packed_trunk():
    import pytest

    m = get_model("edsr")
    m.parse_args(["--remat", "1", "--packed_trunk", "0"])
    with pytest.raises(ValueError, match="packed_trunk"):
        m.prepare(is_training=True, scales=[4])
