"""Shared CLI plumbing: the three-stage flag cascade and plugin setup.

Mirrors reference train.py:36-60 / validate.py:54-80: the script parses
its flags, the dataloader parses what's left, then the model, then a
warning for leftovers. `--cuda_device` is accepted for flag parity but
is a no-op here (device selection is JAX platform config; SURVEY.md §2.5).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional, Sequence

import numpy as np

from larvanet_tpu.core.config import parse_scale_list
from larvanet_tpu.core import registry

# $LVT_PLATFORM: force the JAX platform for CLI SUBPROCESSES. The axon
# TPU plugin ignores the JAX_PLATFORMS env var (CLAUDE.md), so tools
# that spawn the CLIs (tools/paper_table.py contract tests, CI on
# TPU-attached hosts) have no env-level way to pin them to CPU;
# jax.config before backend init is the only reliable override. cli/
# common is the first import of every CLI, so this runs early enough.
if os.environ.get("LVT_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", os.environ["LVT_PLATFORM"])
    except RuntimeError:
        pass  # backend already up (in-process main() under a test)


def enable_compile_cache() -> Optional[str]:
    """Persistent XLA compilation cache, ON by default for every CLI.

    Cold-start compiles dominate CLI/server startup on TPU (packed +
    collapsed serving graphs take minutes through the remote AOT
    helper); the cache cuts a measured 4.1s -> 0.4s for a plain EDSR-b
    forward on the v5e here and scales with graph size. Cache dir:
    $LVT_COMPILE_CACHE, default ~/.cache/larvanet_tpu/xla; set
    LVT_COMPILE_CACHE="" to disable. Keys include compiler version,
    topology, and flags, so stale entries miss rather than corrupt;
    concurrent processes may share the directory.
    """
    import os

    path = os.environ.get("LVT_COMPILE_CACHE")
    if path == "":
        return None
    try:
        import jax

        if path is None:
            # Never clobber a user-configured cache: the standard JAX env
            # var or an embedder's own jax.config.update wins over our
            # default directory (LVT_COMPILE_CACHE stays the explicit
            # project-level override).
            std = os.environ.get("JAX_COMPILATION_CACHE_DIR")
            if std:
                return std
            if jax.config.jax_compilation_cache_dir:
                return jax.config.jax_compilation_cache_dir
            # Forced-CPU runs (tests, the driver's virtual-mesh dryrun)
            # skip the default cache: XLA:CPU AOT entries bake host
            # machine features and reloading them risks SIGILL on a
            # feature mismatch (observed warnings); the cache's value is
            # the minutes-long remote TPU compiles anyway. Explicit
            # LVT_COMPILE_CACHE still opts in.
            platforms = (getattr(jax.config, "jax_platforms", None)
                         or os.environ.get("JAX_PLATFORMS", ""))
            first = str(platforms or "").split(",")[0].strip().lower()
            if first == "cpu":  # forced-CPU; "tpu,cpu" fallback lists stay cached
                return None
            path = os.path.join(os.path.expanduser("~"), ".cache",
                                "larvanet_tpu", "xla")
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path


enable_compile_cache()


def add_common_flags(parser: argparse.ArgumentParser, default_loader: Optional[str], default_model: str = "edsr") -> None:
    if default_loader is not None:
        parser.add_argument("--dataloader", type=str, default=default_loader,
                            help="Name of the data loader.")
    parser.add_argument("--model", type=str, default=default_model,
                        help="Name of the model.")
    parser.add_argument("--scales", type=str, default="4",
                        help="Scales of the input images. Use the ',' character to specify multiple scales (e.g., 2,3,4).")
    parser.add_argument("--cuda_device", type=str, default="-1",
                        help="Accepted for reference-CLI parity; ignored (device selection is via JAX platform flags).")


def setup_loader(name: str, remaining: Sequence[str], scales: List[int]):
    print("prepare data loader - %s" % (name,))
    loader = registry.get_loader(name)
    loader_args, remaining = loader.parse_args(list(remaining))
    loader.prepare(scales=scales)
    return loader, loader_args, remaining


def setup_model(name: str, remaining: Sequence[str], scales: List[int], is_training: bool, global_step: int = 0,
                ema_decay: float = 0.0, fused_opt: int = 0):
    print("prepare model - %s" % (name,))
    # looked up via the module attribute so wrappers (train_larvaV2,
    # train_squid) can patch registry.get_model around the call
    model = registry.get_model(name)
    model_args, remaining = model.parse_args(list(remaining))
    if ema_decay:
        model.ema_decay = float(ema_decay)  # before prepare: shapes the optimizer
    if fused_opt:
        model.fused_opt = 1  # before prepare: shapes the optimizer
    model.prepare(is_training=is_training, scales=scales, global_step=global_step)
    return model, model_args, remaining


def add_fused_opt_flag(parser) -> None:
    parser.add_argument("--fused_opt", type=int, default=0,
                        help="Run the Adam update as ONE vectorized pass over "
                             "a flattened (ravel_pytree) parameter vector "
                             "instead of ~70 per-leaf kernels (optax.flatten; "
                             "numerically identical per element). Checkpoint "
                             "optimizer layouts convert on restore either "
                             "way. 0 = historical per-leaf layout.")


def add_ema_decay_flag(parser) -> None:
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="Track an exponential moving average of the "
                             "params inside the optimizer state (e.g. "
                             "0.999); checkpoints carry it and the eval "
                             "CLIs serve it with --ema. 0 = off.")


def add_widen_flag(parser) -> None:
    parser.add_argument("--widen_from", type=str, default=None,
                        help="Warm-start this (wider) model from a trained "
                             "narrower checkpoint of the SAME topology — "
                             "e.g. LarvaNet_w64 from a LarvaNet 48ch run. "
                             "Function-preserving net2net widening "
                             "(utils/width_transfer.py); optimizer starts "
                             "fresh. Mutually exclusive with --restore_path.")


def maybe_widen_from(model, args) -> None:
    """Apply --widen_from: embed a narrower checkpoint's params into the
    prepared (wider) model, function-preservingly. Call after prepare,
    instead of restore."""
    ckpt = getattr(args, "widen_from", None)
    if not ckpt:
        return
    if getattr(args, "restore_path", None):
        raise SystemExit("--widen_from and --restore_path are mutually "
                         "exclusive (widening IS the warm start)")
    import os

    from flax import serialization

    from larvanet_tpu.utils.width_transfer import widen_params

    if ckpt.endswith((".pth", ".pt")):
        raise SystemExit("--widen_from takes a framework checkpoint (.ckpt "
                         "or orbax dir); restore the .pth into its own-width "
                         "model and save it first")
    if os.path.isdir(ckpt):
        import orbax.checkpoint as ocp

        state = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
    else:
        with open(ckpt, "rb") as f:
            state = serialization.msgpack_restore(f.read())
    model.params = widen_params(state["params"], model.params)
    if model.opt_state is not None:
        model.opt_state = model.tx.init(model.params)  # fresh moments
    print("warm-started by widening %s into %s (function-preserving; "
          "optimizer reset)" % (ckpt, model.registry_name))


def add_dp_train_flag(parser) -> None:
    parser.add_argument("--dp_devices", type=int, default=0,
                        help="Train data-parallel over this many devices: the "
                             "global batch shards along a 1-D 'data' mesh, "
                             "params/optimizer replicate, XLA inserts the "
                             "gradient all-reduce over ICI "
                             "(parallel/mesh.use_data_parallel). batch_size "
                             "must be divisible. 0/1 = single device.")


def maybe_dp_train(model, args) -> None:
    """Switch a prepared+restored model to data-parallel training when
    --dp_devices > 1. Call AFTER restore (replication re-places the
    restored host arrays onto the mesh)."""
    n = int(getattr(args, "dp_devices", 0) or 0)
    if n <= 1:
        return
    if getattr(args, "device_pipeline", 0):
        raise SystemExit(
            "--dp_devices composes with the host loop only; drop "
            "--device_pipeline (the HBM-resident pipeline is single-chip)")
    if getattr(args, "batch_size", 0) % n:
        raise SystemExit("--batch_size (%d) must be divisible by "
                         "--dp_devices (%d)" % (args.batch_size, n))
    import jax

    from larvanet_tpu.parallel.mesh import make_mesh, use_data_parallel

    if n > len(jax.devices()):
        raise SystemExit("--dp_devices %d > %d available devices"
                         % (n, len(jax.devices())))
    mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
    use_data_parallel(model, mesh)
    print("training data-parallel over %d devices (gradient all-reduce "
          "over ICI)" % n)


def maybe_use_ema(model, args) -> None:
    """Swap restored EMA weights into the model when --ema is set. Must
    run right after restore, BEFORE maybe_collapse_tail/maybe_int8_trunk
    (they bake weights)."""
    if getattr(args, "ema", 0):
        model.use_ema_params()
        print("serving the EMA weights (--ema)")


def add_serving_dtype_flag(parser) -> None:
    parser.add_argument("--serving_dtype", type=str, default="f32",
                        choices=["f32", "bf16"],
                        help="Compute dtype of the exact packed inference "
                             "graphs. f32 (default) = the challenge-protocol "
                             "parity configuration; bf16 = the throughput "
                             "configuration BASELINE.md measures (~2x on the "
                             "MXU's native path; NOT bit-identical to f32 — "
                             "validate on your eval set).")


def apply_serving_dtype(model, args) -> None:
    """Record the CLI's --serving_dtype on the model BEFORE any fast-path
    routing builds (the packed mixins and maybe_collapse_tail read it via
    models/base.serving_compute_dtype)."""
    model.serving_dtype = getattr(args, "serving_dtype", "f32")
    if model.serving_dtype == "bf16":
        print("inference compute dtype: bfloat16 (throughput configuration; "
              "not bit-identical to f32)")


def add_plain_frame_flag(parser) -> None:
    parser.add_argument(
        "--plain_frame_px", type=int, default=-1,
        help="Route frames with >= this many LR pixels through the PLAIN "
             "module graph instead of the packed fast path (both compute "
             "the exact model function; they differ only in float "
             "summation order). At monolithic full-frame shapes XLA "
             "stops fusing the packed pairs' elementwise epilogues and "
             "the plain graph measures ~1.5x FASTER for trunks that "
             "underfill the 128-lane packed tile (v5e flagship 1080p "
             "5.7 vs 8.9 LR-MP/s, XOVER_BENCH.json / BASELINE.md "
             "round-4); patch and tile batches stay packed. -1 (default) "
             "= the family-aware measured crossover (full-tile trunks "
             "like LarvaNet_w64 never route — their packed graph "
             "measured faster at every size); 0 disables.")


def maybe_plain_full_frame(model, args) -> None:
    """Install a frame-size dispatch over the model's jitted forward:
    inputs with >= --plain_frame_px LR pixels run the plain module graph
    (the measured monolithic-frame winner — see add_plain_frame_flag),
    smaller ones keep whatever fast path earlier routing installed.
    Call LAST in the routing chain (after maybe_collapse_tail /
    maybe_int8_trunk); no-op under --spatial_shard, whose sharded
    forward owns full frames."""
    import jax

    from larvanet_tpu.ops.fastpath import (make_plain_forward,
                                           plain_frame_crossover_px)

    threshold = int(getattr(args, "plain_frame_px", 0) or 0)
    if threshold < 0:  # -1 = auto: the family-aware measured crossover
        threshold = plain_frame_crossover_px(model)
    if threshold <= 0 or int(getattr(args, "spatial_shard", 0) or 0) > 1:
        return
    from larvanet_tpu.models.base import serving_compute_dtype

    fast = model._fwd_jit
    plain_jit = jax.jit(make_plain_forward(model, serving_compute_dtype(model)))

    def dispatch(params, x):
        if x.shape[1] * x.shape[2] >= threshold:
            return plain_jit(params, x)
        return fast(params, x)

    model._fwd_jit = dispatch
    print("full-frame routing: frames >= %d LR px run the plain module "
          "graph (measured faster than the packed path at monolithic "
          "shapes; BASELINE.md round-4)" % threshold)


def maybe_collapse_tail(model, args) -> None:
    """Route the model's jitted forward through the collapsed linear tail
    — and, when --packed_trunk (default on), the width-packed trunk —
    when --collapsed_tail is set and the model qualifies (EDSR family).
    Both rewrites are exact (ops/collapsed_tail.py, ops/packed_trunk.py).
    Transparent to upscale/fwd_runtime/psnr_on_device/tiling."""
    import jax

    model_name = getattr(args, "model", None) or ""
    # The inference CLIs own --packed_trunk (the cascaded parse consumes it
    # before the model's parser); propagate the user's choice to the model
    # so _forward_impl/_compute_loss routing agrees with the CLI flag.
    if hasattr(args, "packed_trunk") and model.args is not None:
        model.args.packed_trunk = int(args.packed_trunk)
        model._packed_infer = None
        model._packed_all = None
        model._packed_cache = None
    from larvanet_tpu.models.base import serving_compute_dtype

    dtype = serving_compute_dtype(model)
    if getattr(args, "packed_trunk", 1) and model_name.startswith(("LarvaNet", "LarvaLeg")):
        from larvanet_tpu.ops.packed_trunk import make_packed_larvanet_forward

        model._fwd_jit = jax.jit(make_packed_larvanet_forward(model, dtype=dtype))
        print("inference: width-packed trunk enabled")
        return
    if getattr(args, "packed_trunk", 1) and model_name == "mamnet":
        from larvanet_tpu.ops.packed_trunk import make_packed_mamnet_forward

        model._fwd_jit = jax.jit(make_packed_mamnet_forward(model, dtype=dtype))
        print("inference: width-packed trunk + collapsed tail enabled")
        return
    if not getattr(args, "collapsed_tail", 0):
        return
    if model_name not in ("edsr", "edsr_loss"):
        return
    if getattr(args, "packed_trunk", 1):
        from larvanet_tpu.ops.packed_trunk import make_packed_edsr_forward

        model._fwd_jit = jax.jit(make_packed_edsr_forward(model, dtype=dtype))
        print("inference: width-packed trunk + collapsed linear tail enabled")
    else:
        from larvanet_tpu.ops.collapsed_tail import make_collapsed_edsr_forward

        model._fwd_jit = jax.jit(make_collapsed_edsr_forward(model, dtype=dtype))
        print("inference: collapsed linear tail enabled")


INT8_BUILDERS = {
    # model-name predicate -> (int8 builder name, exact builder name)
    # in ops/packed_trunk.py; every family walks the SAME topology
    # function for both (round-2 dedup).
    ("edsr", "edsr_loss"): ("make_int8_edsr_forward", "make_packed_edsr_forward"),
    ("LarvaNet", "LarvaLeg"): ("make_int8_larvanet_forward", "make_packed_larvanet_forward"),
    ("REGO",): ("make_int8_rego_forward", "make_packed_rego_forward"),
    ("TreeNet",): ("make_int8_treenet_forward", "make_packed_treenet_forward"),
    ("hrsr",): ("make_int8_hrsr_forward", "make_packed_hrsr_forward"),
    ("ebrn_rm",): ("make_int8_ebrn_rm_forward", "make_packed_ebrn_rm_forward"),
    ("mamnet",): ("make_int8_mamnet_forward", "make_packed_mamnet_forward"),
    ("msrr", "dwsr"): ("make_int8_msrr_forward", "make_packed_msrr_forward"),
}


def int8_and_exact_forwards(model, model_name, calib):
    """Build the (int8, exact) forward pair for a model family, or raise
    ValueError when the family has no int8 path / the config cannot be
    quantized (depthwise, V2 tails, ...). The exact forward (odd-width
    fallback and the --int8_report reference) honors --serving_dtype so
    per-frame parity doesn't silently switch compute dtypes."""
    from larvanet_tpu.models.base import serving_compute_dtype
    from larvanet_tpu.ops import packed_trunk

    for prefixes, (int8_name, exact_name) in INT8_BUILDERS.items():
        if model_name in prefixes or model_name.startswith(prefixes):
            int8_fwd = getattr(packed_trunk, int8_name)(model, calib)
            exact_fwd = getattr(packed_trunk, exact_name)(
                model, dtype=serving_compute_dtype(model))
            return int8_fwd, exact_fwd
    raise ValueError("no int8 path for model %r" % (model_name,))


def maybe_wino_trunk(model, args) -> None:
    """Route EDSR inference through the fused Pallas Winograd trunk when
    --wino_trunk is 2 (F(2,3), 1.5x compute ceiling) or 4 (F(4,3),
    2.0x) — ops/wino_pallas.py. Opt-in like --int8_trunk: summation
    order differs from the exact path (float-tolerance equal; the
    TPU-measured PSNR delta lands in WINO_BENCH.json / BASELINE.md).
    Even input widths only; requires a TPU backend (Mosaic) — CPU runs
    fall back with a notice unless $LVT_WINO_INTERPRET=1 (tests)."""
    import jax

    m = int(getattr(args, "wino_trunk", 0) or 0)
    if not m:
        return
    if m not in (2, 4):
        raise SystemExit("--wino_trunk must be 0, 2 or 4 (got %d)" % m)
    model_name = getattr(args, "model", None) or ""
    is_edsr = model_name in ("edsr", "edsr_loss")
    is_larva = model_name.startswith(("LarvaNet", "LarvaLeg"))
    if not (is_edsr or is_larva):
        print("--wino_trunk: only the EDSR/LarvaNet families are routed; "
              "running the standard path for %r" % model_name)
        return
    interpret = bool(os.environ.get("LVT_WINO_INTERPRET"))
    if jax.default_backend() != "tpu" and not interpret:
        print("--wino_trunk: no TPU backend (Mosaic kernels); running the "
              "standard path")
        return
    from larvanet_tpu.models.base import serving_compute_dtype
    from larvanet_tpu.ops.wino_pallas import (
        make_wino_pallas_edsr_forward, make_wino_pallas_larvanet_forward)

    dtype = serving_compute_dtype(model)
    if is_edsr:
        fwd = make_wino_pallas_edsr_forward(model, dtype, interpret=interpret,
                                            m=m)
    else:
        fwd = make_wino_pallas_larvanet_forward(model, dtype,
                                                interpret=interpret, m=m)
        feats = int(getattr(model.module, "features", 0) or 0)
        if feats != 64:
            print("--wino_trunk: %r trunk is %d channels (needs 64 for "
                  "128-lane Mosaic tiles); body pairs fall back to the "
                  "exact packed path" % (model_name, feats))
    model._fwd_jit = jax.jit(fwd)
    print("inference: fused Pallas Winograd F(%d,3) trunk enabled" % m)


def maybe_int8_trunk(model, args, get_calib) -> None:
    """Route inference through the opt-in W8A8 quantized trunk when
    --int8_trunk is set (ops/packed_trunk.py; EDSR + plain LarvaNet
    families). `get_calib` lazily returns an NHWC float32 batch (by
    default the first --int8_calib_images val inputs, centre-cropped to
    a common even size) used to calibrate activation scales. Odd-width
    inputs fall back to the exact bf16 packed forward. NOT float-exact
    — measured -0.056 dB on a trained model (BASELINE.md); the default
    path stays exact, and --int8_report (cli/validate.py) measures the
    delta on your own eval set with a refuse-to-serve threshold."""
    import jax

    if not getattr(args, "int8_trunk", 0):
        return
    model_name = getattr(args, "model", None) or ""
    calib = np.asarray(get_calib(), np.float32)
    if calib.shape[2] % 2:
        calib = calib[:, :, : calib.shape[2] // 2 * 2]
    try:
        int8_fwd, exact_fwd = int8_and_exact_forwards(model, model_name, calib)
    except ValueError as e:
        print("--int8_trunk: %s; ignoring" % (e,))
        return

    int8_jit, exact_jit = jax.jit(int8_fwd), jax.jit(exact_fwd)

    def fwd(params, x):
        if x.shape[2] % 2:
            return exact_jit(params, x)  # odd width: exact fallback
        return int8_jit(params, x)

    model._fwd_jit = fwd
    model._int8_exact_jit = exact_jit  # for --int8_report side-by-side eval
    print("inference: int8 (W8A8) packed trunk enabled (NOT float-exact)")


def int8_calib_batch(dataloader, scale, num_images=4) -> np.ndarray:
    """A proper int8 calibration batch: the first `num_images` val inputs
    centre-cropped to their common (even-aligned) size, stacked NHWC.
    Round 1 calibrated on a single image — a thin sample of the
    activation distribution (VERDICT r1 weak#2)."""
    n = min(int(num_images), dataloader.get_num_images())
    imgs = [dataloader.get_image_pair(image_index=i, scale=scale)[0]
            .transpose(1, 2, 0) for i in range(n)]
    hh = min(im.shape[0] for im in imgs)
    ww = min(im.shape[1] for im in imgs) // 2 * 2
    out = []
    for im in imgs:
        top = (im.shape[0] - hh) // 2
        left = (im.shape[1] - ww) // 2
        out.append(im[top:top + hh, left:left + ww])
    return np.asarray(out, np.float32)


def maybe_spatial_shard(model, args, scale: int) -> None:
    """Route the model's jitted forward through H-sharded SPMD when
    --spatial_shard N > 1: full frames are split across N devices with
    halo exchange over ICI (parallel/halo.py) — the device-resident
    generalization of chop-forward for frames too large for one chip."""
    import jax

    n = int(getattr(args, "spatial_shard", 0) or 0)
    if n <= 1:
        return
    if len(jax.devices()) < n:
        print("spatial_shard=%d requested but only %d devices; ignoring"
              % (n, len(jax.devices())))
        return
    from jax.sharding import NamedSharding, PartitionSpec as P

    from larvanet_tpu.parallel.halo import spatial_sharded_forward
    from larvanet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((1, n), ("data", "spatial"))
    halo = int(getattr(args, "spatial_halo", 32))
    inner = spatial_sharded_forward(
        model._forward_impl, mesh, halo=halo, scale=scale,
        axis_name="spatial", spatial_axis=1,
    )
    sharding = NamedSharding(mesh, P(None, "spatial", None, None))

    def fwd(params, x):
        return inner(params, jax.device_put(x, sharding))

    model._fwd_jit = fwd
    print("inference: spatially sharded over %d devices (halo %d)" % (n, halo))


def warn_leftovers(remaining: Sequence[str]) -> None:
    if remaining:
        print("WARNING: found unhandled arguments: %s" % (list(remaining),))


def scales_of(args) -> List[int]:
    return parse_scale_list(args.scales)


class ChunkRateMeter:
    """Trusted steps/s for the fused device-pipeline loops.

    On this tunnel the per-chunk `float(loss)` readback can ack in
    milliseconds while the device still owns a backlog of dispatched
    chunks (the next readback then absorbs it) — so instantaneous
    n/dt rates are dispatch-ack noise (RECIPE_FULL r4 shipped 322k
    "steps/s" readings; CLAUDE.md timing methodology). The
    authoritative rate is DIFFERENCED wall clock over all post-compile
    chunks: the loop is sequential, the enqueue backpressure bounds
    how far dispatch runs ahead, so (steps since chunk 1)/(wall since
    chunk 1) converges on the true device rate.

    update() returns (inst_rate, avg_rate_or_None, trusted):
    - chunk 1 (compile) starts the differenced clock; its inst rate is
      reported as-is (compile-dominated, obviously slow, trusted).
    - later chunks are untrusted when inst > TRUST_FACTOR * avg.
    suffix() renders the canonical log suffix so every CLI prints the
    same grammar that tools/recipe_full.py parses.
    """

    TRUST_FACTOR = 5.0

    def __init__(self):
        self._t0 = None
        self._steps0 = None
        self._chunks = 0

    def update(self, global_step: int, n_steps: int, dt: float):
        import time as _t

        self._chunks += 1
        now = _t.time()
        inst = n_steps / max(dt, 1e-9)
        if self._chunks == 1:
            self._t0, self._steps0 = now, global_step
            return inst, None, True
        avg = (global_step - self._steps0) / max(now - self._t0, 1e-9)
        return inst, avg, inst <= self.TRUST_FACTOR * avg

    def suffix(self, avg, trusted) -> str:
        s = ""
        if avg is not None:
            s += " avg %.1f steps/s" % avg
        if not trusted:
            s += " [untrusted]"
        return s
