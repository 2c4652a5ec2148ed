"""Cross-topology checkpoint restore (VERDICT r3 next#3).

Train-on-N / serve-on-1 / resume-on-M is the canonical multichip flow.
Round 3's orbax restore passed no target, so arrays restored with the
sharding recorded at SAVE time — orbax itself warned "Sharding info not
provided ... unsafe when restoring on a different topology".
models/base._orbax_restore_numpy now restores array leaves as HOST
numpy (exactly what the msgpack path yields): host data carries no
topology, the first jitted call under the current mesh places it.

These tests pin: numpy-leaf restore of mesh-saved checkpoints, value
identity for genuinely SHARDED saved leaves (re-assembly across
shards), absence of the orbax sharding warning, the msgpack-under-dp
round trip, and (slow tier) real device-count changes 8 -> 1 / 8 -> 4
across separate processes.
"""

import logging
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import serialization
from jax.sharding import NamedSharding, PartitionSpec as P

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.parallel.mesh import make_mesh, shard_batch, use_data_parallel


def _tiny(training=True):
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=training, scales=[4])
    return m


def _leaves(params):
    return jax.tree_util.tree_leaves(serialization.to_state_dict(params))


def _save_under_mesh(tmp_path, orbax=True):
    """One dp train step on the full 8-device mesh, then save."""
    rng = np.random.default_rng(0)
    m = _tiny()
    mesh = make_mesh((len(jax.devices()),), ("data",))
    use_data_parallel(m, mesh)
    x = rng.uniform(0, 255, (16, 8, 8, 3)).astype(np.float32)
    t = rng.uniform(0, 255, (16, 32, 32, 3)).astype(np.float32)
    m.params, m.opt_state, _ = m._train_jit(
        m.params, m.opt_state, 1e-4, shard_batch(x, mesh), shard_batch(t, mesh))
    m.global_step = 11
    m.orbax_checkpoints = orbax
    path = m.save(str(tmp_path))
    return m, path


class _WarningCatcher(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.hits = []

    def emit(self, record):
        if "Sharding info not provided" in record.getMessage():
            self.hits.append(record.getMessage())


def test_orbax_mesh_ckpt_restores_to_numpy_and_no_warning(tmp_path):
    saved_model, path = _save_under_mesh(tmp_path, orbax=True)
    fresh = _tiny(training=False)
    catcher = _WarningCatcher()
    logging.getLogger().addHandler(catcher)
    try:
        fresh.restore(path)
    finally:
        logging.getLogger().removeHandler(catcher)
    assert catcher.hits == [], catcher.hits
    # array leaves are host numpy: no topology leaked from the save
    assert all(isinstance(l, np.ndarray) for l in _leaves(fresh.params))
    for a, b in zip(_leaves(saved_model.params), _leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert fresh.global_step == 11
    # serve-on-1: forward pinned to a single device
    with jax.default_device(jax.devices()[-1]):
        out = jax.jit(fresh._forward_impl)(
            fresh.params, jnp.zeros((1, 8, 8, 3), jnp.float32))
        assert np.all(np.isfinite(np.asarray(out)))


def test_orbax_sharded_leaf_reassembles(tmp_path):
    """A leaf actually SHARDED over 8 devices restores to the full
    host array (re-assembly across shards, not just replica-0)."""
    mesh = make_mesh((len(jax.devices()),), ("data",))
    big = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    state = {
        "params": {"w": jax.device_put(big, NamedSharding(mesh, P("data")))},
        "global_step": 3,
        "total_volume": 0.0,
    }
    import orbax.checkpoint as ocp

    path = os.path.join(str(tmp_path), "sharded.ckpt")
    ocp.PyTreeCheckpointer().save(path, state)
    from larvanet_tpu.models.base import _orbax_restore_numpy

    back = _orbax_restore_numpy(path)
    assert isinstance(back["params"]["w"], np.ndarray)
    np.testing.assert_array_equal(back["params"]["w"], big)
    assert back["global_step"] == 3


def test_orbax_mesh_ckpt_resumes_training_on_smaller_mesh(tmp_path):
    _, path = _save_under_mesh(tmp_path, orbax=True)
    rng = np.random.default_rng(1)
    m = _tiny(training=True)
    m.restore(path)
    half = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    use_data_parallel(m, half)
    x = rng.uniform(0, 255, (8, 8, 8, 3)).astype(np.float32)
    t = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)
    m.params, m.opt_state, loss = m._train_jit(
        m.params, m.opt_state, 1e-4, shard_batch(x, half), shard_batch(t, half))
    assert np.isfinite(float(loss))
    assert m.global_step == 11


def test_msgpack_under_dp_roundtrip(tmp_path):
    saved_model, path = _save_under_mesh(tmp_path, orbax=False)
    assert os.path.isfile(path)
    fresh = _tiny(training=True)
    fresh.restore(path)
    for a, b in zip(_leaves(saved_model.params), _leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(_leaves(saved_model.opt_state), _leaves(fresh.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


_SAVER = r"""
import os
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
from larvanet_tpu.core.registry import get_model
from larvanet_tpu.parallel.mesh import make_mesh, shard_batch, use_data_parallel

m = get_model("edsr")
m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
m.prepare(is_training=True, scales=[4])
mesh = make_mesh((8,), ("data",))
use_data_parallel(m, mesh)
rng = np.random.default_rng(0)
x = rng.uniform(0, 255, (16, 8, 8, 3)).astype(np.float32)
t = rng.uniform(0, 255, (16, 32, 32, 3)).astype(np.float32)
m.params, m.opt_state, _ = m._train_jit(
    m.params, m.opt_state, 1e-4, shard_batch(x, mesh), shard_batch(t, mesh))
m.global_step = 21
m.orbax_checkpoints = True
print("SAVED", m.save(sys.argv[1]))
"""

_RESTORER = r"""
import os
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(n)d"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
from larvanet_tpu.core.registry import get_model

assert len(jax.devices()) == %(n)d, jax.devices()
m = get_model("edsr")
m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
m.prepare(is_training=True, scales=[4])
m.restore(sys.argv[1])
assert m.global_step == 21
if %(n)d > 1:
    from larvanet_tpu.parallel.mesh import make_mesh, shard_batch, use_data_parallel
    mesh = make_mesh((%(n)d,), ("data",))
    use_data_parallel(m, mesh)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (%(n)d, 8, 8, 3)).astype(np.float32)
    t = rng.uniform(0, 255, (%(n)d, 32, 32, 3)).astype(np.float32)
    m.params, m.opt_state, loss = m._train_jit(
        m.params, m.opt_state, 1e-4, shard_batch(x, mesh), shard_batch(t, mesh))
else:
    import jax.numpy as jnp
    out = jax.jit(m._forward_impl)(m.params, jnp.zeros((1, 8, 8, 3)))
    loss = out.mean()
assert np.isfinite(float(loss))
print("RESTORED_OK", %(n)d)
"""


@pytest.mark.slow
def test_cross_process_device_count_8_to_1_and_4(tmp_path):
    """The real thing: the checkpoint is written by a process with 8
    devices and restored by processes with 1 and with 4."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    r = subprocess.run([sys.executable, "-c", _SAVER, str(tmp_path)],
                       cwd=repo, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    ckpt = r.stdout.strip().split("SAVED ")[-1].splitlines()[0]

    for n in (1, 4):
        r = subprocess.run([sys.executable, "-c", _RESTORER % {"n": n}, ckpt],
                           cwd=repo, env=env, capture_output=True, text=True,
                           timeout=300)
        assert r.returncode == 0, r.stdout + r.stderr
        assert ("RESTORED_OK %d" % n) in r.stdout
