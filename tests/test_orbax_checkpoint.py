"""Orbax checkpoint backend (`--orbax_checkpoint`, models/base.py
_save_orbax / restore dir-detection).

The msgpack writer assumes single-host replicated state; the orbax
backend is the production option for very large / multi-host runs
(per-leaf tensorstore storage, atomic finalization, process-coordinated
saves under jax.distributed). These tests pin the single-host contract:
round-trip identity (params, opt state, step/volume, scheduler), the
reference checkpoint-name contract (a DIRECTORY at model_<step>.ckpt),
auto-resume discovery, and the async variant.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.utils.checkpoints import find_latest


def _tiny(orbax=True, async_on=False, name="edsr"):
    m = get_model(name)
    if name == "edsr":
        m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    else:
        m.parse_args(["--num_blocks", "1,1"])
    m.prepare(is_training=True, scales=[4])
    m.orbax_checkpoints = orbax
    m.async_checkpoints = async_on
    return m


def _step(m, rng):
    x = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
    t = rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    if hasattr(m, "train_step_larva") and m.registry_name.startswith("LarvaNet"):
        m.volume_per_step = 1
        m.train_step_larva(None, None, [a.transpose(2, 0, 1) for a in x],
                           [a.transpose(2, 0, 1) for a in t])
    else:
        m.train_step([a.transpose(2, 0, 1) for a in x], 4,
                     [a.transpose(2, 0, 1) for a in t])


def test_orbax_roundtrip_identity(tmp_path):
    rng = np.random.default_rng(0)
    m = _tiny()
    _step(m, rng)
    path = m.save(str(tmp_path))
    assert os.path.isdir(path), "orbax checkpoint must be a directory"
    assert path.endswith("model_1.ckpt")  # reference name contract kept

    m2 = _tiny(orbax=False)
    m2.restore(path)  # dir-detection: no flag needed on the read side
    for a, b in zip(jax.tree_util.tree_leaves(m2.params),
                    jax.tree_util.tree_leaves(m.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(m2.opt_state),
                    jax.tree_util.tree_leaves(m.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert m2.global_step == 1
    _step(m2, rng)  # restored model keeps training


def test_orbax_scheduler_state_and_latest_resume(tmp_path):
    rng = np.random.default_rng(1)
    m = _tiny(name="LarvaNet")
    _step(m, rng)
    m.scheduler.step(30.0)
    m.scheduler.step(10.0)  # one bad epoch recorded
    p1 = m.save(str(tmp_path))
    _step(m, rng)
    p2 = m.save(str(tmp_path))
    assert p1 != p2
    assert find_latest(str(tmp_path)) == p2  # dirs discovered like files

    m2 = _tiny(name="LarvaNet")
    m2.restore(find_latest(str(tmp_path)))
    assert m2.global_step == 2
    assert m2.scheduler.state_dict() == m.scheduler.state_dict()


def test_orbax_async_and_overwrite(tmp_path):
    rng = np.random.default_rng(2)
    m = _tiny(async_on=True)
    _step(m, rng)
    saved = jax.tree_util.tree_map(np.asarray, m.params)
    path = m.save(str(tmp_path))
    _step(m, rng)  # donates the buffers behind the in-flight save
    m.wait_for_checkpoints()

    m2 = _tiny(orbax=False)
    m2.restore(path)
    for a, b in zip(jax.tree_util.tree_leaves(m2.params),
                    jax.tree_util.tree_leaves(saved)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # saving the same step again must replace, not error (orbax refuses
    # to overwrite by default; _save_orbax clears the stale dir)
    m3 = _tiny()
    _step(m3, rng)
    m3.save(str(tmp_path))
    p = m3.save(str(tmp_path))
    assert os.path.isdir(p)
