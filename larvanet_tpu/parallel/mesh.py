"""Device mesh setup and data-parallel training.

The reference is strictly single-device (SURVEY.md §2.5: no
torch.distributed, no DataParallel; `--cuda_device` just sets an env
var). The TPU-native equivalents:

  * Data parallel: the global batch is sharded over a 1-D 'data' mesh
    axis with `jax.sharding.NamedSharding`; params/optimizer state are
    replicated. Gradient all-reduce is inserted by XLA (GSPMD) — there
    is no hand-written collective code, and it rides ICI on a real
    slice. Multi-host extends this by calling
    `jax.distributed.initialize()` before mesh construction (DCN for
    cross-host collectives), with no change to the step function.
  * Spatial parallel (the chop-forward analog): see halo.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    shape=None puts every device on the first axis. On real hardware
    `mesh_utils.create_device_mesh` lays the mesh out along ICI rings.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError("mesh shape %s does not cover %d devices" % (shape, len(devices)))
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch on the mesh, sharded along its leading dim."""
    spec = P(axis, *([None] * (np.ndim(batch) - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_train_step(model, mesh: Mesh):
    """Data-parallel version of a model wrapper's train step.

    Returns step(params, opt_state, lr, inputs, targets) jitted with the
    global batch sharded over 'data' and the state replicated; XLA
    inserts the gradient all-reduce. Works for every SRModel subclass
    because the single-device `_train_step_impl` is already a pure
    function of (params, opt_state, lr, batch).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data", None, None, None))
    return jax.jit(
        model._train_step_impl,
        in_shardings=(repl, repl, None, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def use_data_parallel(model, mesh: Mesh) -> None:
    """Switch a prepared SRModel to data-parallel training on `mesh`.

    Re-places params/opt_state replicated and swaps the jitted train
    step for the sharded one. The host-side loop is unchanged — batches
    passed to train_step are global batches, split across devices by the
    input sharding.
    """
    model.params = replicate(model.params, mesh)
    if model.opt_state is not None:
        model.opt_state = replicate(model.opt_state, mesh)
    if model.is_training:
        model._train_jit = make_dp_train_step(model, mesh)
    model._mesh = mesh


def use_data_parallel_eval(model, mesh: Mesh, axis: str = "data") -> None:
    """Shard INFERENCE batches over the mesh (multi-chip serving).

    Swaps the model's jitted forward for one whose batch dim shards over
    `axis` with params replicated — each chip SRs its share of the tile
    batch with zero collectives (tiles are independent; the SPMD analog
    of a serving fleet splitting a request's tiles). Compose with
    eval/tiling.TiledUpscaler by setting min_batch to the axis size so
    every bucketed tile batch divides the mesh. Call AFTER
    maybe_collapse_tail/maybe_int8_trunk: it wraps whatever forward is
    routed at that point (packed / int8 / plain).
    """
    n = dict(mesh.shape)[axis]
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis, None, None, None))
    inner = model._fwd_jit
    sharded = jax.jit(lambda p, x: inner(p, x),
                      in_shardings=(repl, data), out_shardings=data)
    model.params = replicate(model.params, mesh)

    def fwd(params, x):
        if x.shape[0] % n:
            raise ValueError(
                "dp eval: batch %d does not divide the %d-way '%s' axis; "
                "use TiledUpscaler(min_batch=%d)" % (x.shape[0], n, axis, n))
        return sharded(params, x)

    model._fwd_jit = fwd
    model._mesh = mesh
