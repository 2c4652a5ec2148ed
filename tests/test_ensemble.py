"""Ensemble / self-ensemble inference tests."""

import numpy as np

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.eval.ensemble import EnsembleForward, self_ensemble_forward


def _edsr(seed):
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=False, scales=[4], seed=seed)
    return m


def test_ensemble_mean_matches_individual(rng):
    models = [_edsr(s) for s in range(3)]
    apply_fn = lambda p, x: models[0].module.apply({"params": p}, x)
    ens = EnsembleForward(apply_fn, [m.params for m in models])
    x = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
    outs = np.asarray(ens.all(x))
    assert outs.shape == (3, 2, 32, 32, 3)
    for i, m in enumerate(models):
        ref = np.asarray(m.fwd_runtime(x))
        np.testing.assert_allclose(outs[i], ref, atol=1e-4)
    mean = np.asarray(ens.mean(x))
    np.testing.assert_allclose(mean, outs.mean(axis=0), atol=1e-4)


def test_self_ensemble_orientation_invariance(rng):
    """Applying the x8 self-ensemble to a rotated input gives the rotated
    output (the ensemble is dihedral-equivariant by construction)."""
    m = _edsr(0)
    apply_fn = lambda p, x: m.module.apply({"params": p}, x)
    se = self_ensemble_forward(apply_fn)
    x = rng.uniform(0, 255, (1, 8, 8, 3)).astype(np.float32)
    y = np.asarray(se(m.params, x))
    assert y.shape == (1, 32, 32, 3)
    xr = np.rot90(x, k=1, axes=(1, 2)).copy()
    yr = np.asarray(se(m.params, xr))
    np.testing.assert_allclose(yr, np.rot90(y, k=1, axes=(1, 2)), atol=1e-3)
