"""Async checkpoint writer (utils/checkpoints.AsyncCheckpointWriter).

Critical property: a save must capture the state AT THE MOMENT of the
call even though (a) the next train step DONATES the params/opt_state
buffers and (b) the host serialization runs later on a worker thread.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from larvanet_tpu.core.registry import get_model


def _tiny(async_on):
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=True, scales=[4])
    m.async_checkpoints = async_on
    return m


def test_async_save_snapshot_survives_donation(tmp_path):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))

    m = _tiny(async_on=True)
    m.train_step([np.asarray(a).transpose(2, 0, 1) for a in x],
                 4, [np.asarray(a).transpose(2, 0, 1) for a in t])
    saved_params = jax.tree_util.tree_map(np.asarray, m.params)
    path = m.save(str(tmp_path))

    # keep training: donates the buffers the snapshot was taken from
    for _ in range(3):
        m.train_step([np.asarray(a).transpose(2, 0, 1) for a in x],
                     4, [np.asarray(a).transpose(2, 0, 1) for a in t])
    m.wait_for_checkpoints()
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")

    # restore into a fresh model: must equal the state AT SAVE TIME
    m2 = _tiny(async_on=False)
    m2.restore(path)
    for a, b in zip(jax.tree_util.tree_leaves(m2.params),
                    jax.tree_util.tree_leaves(saved_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert m2.global_step == 1

    # and the restored model trains on
    m2.train_step([np.asarray(a).transpose(2, 0, 1) for a in x],
                  4, [np.asarray(a).transpose(2, 0, 1) for a in t])


def test_async_matches_sync_bytes(tmp_path):
    m = _tiny(async_on=False)
    sync_path = m.save(str(tmp_path / "sync"))
    m.async_checkpoints = True
    async_path = m.save(str(tmp_path / "async"))
    m.wait_for_checkpoints()
    with open(sync_path, "rb") as f1, open(async_path, "rb") as f2:
        assert f1.read() == f2.read()


import jax  # noqa: E402  (used in tree_map above)
