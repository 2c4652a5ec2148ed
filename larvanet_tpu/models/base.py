"""TPU-native model wrapper: the reference's BaseModel contract re-designed.

The reference contract (reference models/base.py:4-85): parse_args,
prepare(is_training, scales, global_step), save/restore, train_step,
upscale, get_next_train_scale, plus family extensions train_step_larva /
test / fwd_runtime / get_lr.

TPU redesign:
  * One Flax module per model family, NHWC, built once in `prepare`.
  * `train_step` is a single jit-compiled function (params, opt_state,
    lr, batch) -> (params, opt_state, loss). The learning rate is a
    traced scalar argument, so host-side schedules (step decay,
    ReduceLROnPlateau-on-PSNR) never trigger recompilation. Multi-exit
    losses compile into the same graph (no per-exit Python backward).
  * `upscale` converts host CHW float32 [0,255] (the reference's data
    contract) to a batched NHWC device array, runs the jitted forward
    (cached per input shape) and converts back.
  * Checkpoints serialize {params, opt_state, global_step, total_volume,
    scheduler state} with flax msgpack, keeping the reference filename
    contract (`model_<step>.ckpt`, `model_step<N>_vol<G>G.ckpt`).
  * Optimizer parity: torch Adam/AdamW defaults (betas 0.9/0.999,
    eps 1e-8; AdamW weight_decay=0.01 on *all* params).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization


# canonical definitions live in train/losses.py; re-exported here because
# every model wrapper imports them alongside SRModel
from larvanet_tpu.train.losses import l1_loss, multi_exit_l1, robust_sqrt_loss  # noqa: F401


def serving_compute_dtype(model):
    """Compute dtype for the packed inference graphs: float32 by default
    (the challenge-protocol parity configuration — ≤7e-5 dB vs the
    reference), bfloat16 when the eval CLI was given
    `--serving_dtype bf16` (the THROUGHPUT configuration bench.py
    measures: the packed conv runs ~2x faster on the MXU's native
    bf16 path). Set as a model attribute by cli/common before the
    fast-path routing builds."""
    import jax.numpy as jnp

    return (jnp.bfloat16
            if getattr(model, "serving_dtype", "f32") == "bf16"
            else jnp.float32)


def add_qat_flag(parser):
    """Training-graph flags for every packed family:

    --qat (families with an int8 W8A8 serving path): train through
    ops/packed_trunk.qat_pair (straight-through fake-quant of the packed
    conv pairs with the EXACT int8 serving scheme — same per-output-
    channel weight scales, same 1.05*max activation headroom) so
    --int8_trunk serving costs ~0 dB instead of the measured
    -0.01..-0.04 dB post-training deltas (INT8_REPORT.json). Requires
    --packed_trunk and an even patch width. Recipe: converge exactly,
    then fine-tune briefly with --qat 1 (from-scratch QAT measured real
    exact-PSNR damage; tools/int8_family_report.py --qat_finetune).

    --remat: jax.checkpoint over each packed conv pair — the backward
    recomputes block activations instead of storing them, so training
    peak HBM scales with one block instead of trunk depth (big-patch /
    full-frame fine-tuning geometries). Loss/grad-identical
    (ops/packed_trunk.remat_pair; tests/test_remat.py)."""
    parser.add_argument("--qat", type=int, default=0,
                        help="Quantization-aware training: fake-quantize the "
                             "packed conv pairs with the int8 serving scheme "
                             "(STE) so --int8_trunk serving costs ~0 dB. "
                             "Requires --packed_trunk + even patch width.")
    parser.add_argument("--remat", type=int, default=0,
                        help="Rematerialize (jax.checkpoint) each packed conv "
                             "pair in the training graph: peak activation "
                             "memory of ~1 block instead of the whole trunk, "
                             "for large-patch training. Loss/grad-identical.")


def qat_requested(model) -> bool:
    """True when the model was configured with --qat 1 (training-graph
    routing helper for the packed mixins)."""
    return bool(getattr(getattr(model, "args", None), "qat", 0))


def add_lr_domain_flag(parser, default=1):
    """--lr_domain_loss for families whose training outputs end in a
    PixelShuffle: compute the mean-L1 loss PRE-SHUFFLE against
    pixel-unshuffled targets. pixel_shuffle is a pure permutation and
    mean-L1 is permutation-invariant, so per-element grads are IDENTICAL
    and the loss scalar equals the HR-domain loss up to f32 summation
    order (tests/test_lr_domain.py) — but the output depth-to-space
    transpose leaves the training step's fwd AND bwd (the largest
    non-conv cost in the round-3 train anatomy, BASELINE.md)."""
    parser.add_argument("--lr_domain_loss", type=int, default=default,
                        help="With --packed_trunk: compute the training L1 "
                             "loss PRE-SHUFFLE in the LR domain (targets "
                             "pixel-unshuffled instead; identical per-element "
                             "grads — mean-L1 is permutation-invariant). "
                             "0 = HR-domain loss (bitwise-historical).")


def lr_domain_requested(model) -> bool:
    """True when training should route through the LR-domain loss
    (--lr_domain_loss 1 with --packed_trunk on)."""
    a = getattr(model, "args", None)
    return bool(getattr(a, "packed_trunk", 0) and getattr(a, "lr_domain_loss", 0))


def chw_list_to_nhwc(images) -> jnp.ndarray:
    """Host image batch -> NHWC float32 device array.

    Accepts the reference contract (list of CHW float32 arrays) or an
    already-batched 4-D array in either NCHW or NHWC layout (the
    framework's device-ready fast path emits NHWC directly).
    """
    if isinstance(images, (list, tuple)):
        # Reference contract: a list is always CHW images.
        arr = np.stack([np.asarray(im, dtype=np.float32) for im in images])
        return jnp.asarray(arr.transpose(0, 2, 3, 1))
    arr = np.asarray(images, dtype=np.float32)
    if arr.ndim != 4:
        raise ValueError("expected a batch of images, got shape %s" % (arr.shape,))
    if arr.shape[-1] == 3:  # already NHWC
        return jnp.asarray(arr)
    if arr.shape[1] == 3:  # NCHW
        return jnp.asarray(arr.transpose(0, 2, 3, 1))
    raise ValueError("cannot infer layout of batch with shape %s" % (arr.shape,))


def nhwc_to_chw_numpy(batch: jax.Array) -> np.ndarray:
    return np.asarray(batch).transpose(0, 3, 1, 2)


class EmaState(NamedTuple):
    """param_ema's state: the exponential moving average of the params."""

    ema: Any


def param_ema(decay: float) -> optax.GradientTransformation:
    """Parameter EMA as an optax transform (the `--ema_decay` training
    flag): updates pass through unchanged; the state tracks
    ema <- decay*ema + (1-decay)*new_params after every optimizer step.

    Living inside opt_state, the average threads through every existing
    jitted step, the device pipeline's fori_loop, gradient accumulation,
    the GSPMD dp step, and checkpoints with ZERO signature changes —
    the TPU-native way to add averaged-weights serving (standard SR
    competition practice; the reference has no equivalent). Serve with
    `--ema` on the eval CLIs (SRModel.use_ema_params)."""

    def init_fn(params):
        # explicit copies: the train step donates BOTH params and
        # opt_state, so the average must not alias the param buffers
        return EmaState(ema=jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("param_ema requires params")
        new_params = optax.apply_updates(params, updates)
        d = jnp.asarray(decay, jnp.float32)
        ema = jax.tree_util.tree_map(
            lambda e, p: (d * e.astype(jnp.float32)
                          + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
            state.ema, new_params)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def find_ema(opt_state):
    """The EmaState.ema subtree inside an optimizer state, or None
    (namedtuples are tuples, so this walks chain/inject wrappers)."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):
        for el in opt_state:
            found = find_ema(el)
            if found is not None:
                return found
    return None


def find_ema_in_state_dict(sd):
    """The EMA average inside a SERIALIZED opt_state (flax to_state_dict
    renders EmaState as a single-key {"ema": tree} dict), or None. Lets
    eval-side restores — where no live opt_state exists to give the
    structure — serve the averaged weights without the checkpoint
    duplicating the tree top-level."""
    if isinstance(sd, dict):
        if set(sd.keys()) == {"ema"}:
            return sd["ema"]
        for v in sd.values():
            found = find_ema_in_state_dict(v)
            if found is not None:
                return found
    return None


def _adapt_opt_layout(template_sd, saved_sd, params):
    """Convert a serialized opt_state between the per-leaf and the
    --fused_opt (optax.flatten) layouts, matching `template_sd`'s shape.

    optax.flatten stores Adam's mu/nu as ONE jax.flatten_util.
    ravel_pytree vector over the params tree (deterministic leaf
    order), so the conversion is exactly ravel/unravel of params-shaped
    subtrees. Returns the adapted state dict, or None when the
    structures differ for some other reason (caller raises its usual
    mismatch error)."""
    import jax.flatten_util

    params_sd = serialization.to_state_dict(params)
    n_total = sum(np.asarray(v).size
                  for v in jax.tree_util.tree_leaves(params_sd))
    _, unravel = jax.flatten_util.ravel_pytree(params)

    def is_params_like(node):
        return (isinstance(node, dict) and
                jax.tree_util.tree_structure(node)
                == jax.tree_util.tree_structure(params_sd))

    def is_flat_vec(node):
        return (not isinstance(node, dict)
                and getattr(np.asarray(node), "shape", None) == (n_total,))

    changed = []

    def walk(tpl, saved):
        if is_params_like(tpl) and is_flat_vec(saved):
            changed.append(1)  # fused ckpt -> per-leaf run
            tree = unravel(jnp.asarray(saved))
            return serialization.to_state_dict(
                jax.tree_util.tree_map(
                    lambda ref, v: v.astype(ref.dtype) if hasattr(ref, "dtype")
                    else v, params, tree))
        if is_flat_vec(tpl) and is_params_like(saved):
            changed.append(1)  # per-leaf ckpt -> fused run
            leaf_tree = serialization.from_state_dict(params, saved)
            return jax.flatten_util.ravel_pytree(leaf_tree)[0]
        if isinstance(tpl, dict) and isinstance(saved, dict):
            if set(tpl.keys()) != set(saved.keys()):
                return None
            out = {}
            for k in tpl:
                sub = walk(tpl[k], saved[k])
                if sub is None:
                    return None
                out[k] = sub
            return out
        return saved

    adapted = walk(template_sd, saved_sd)
    if adapted is None or not changed:
        return None
    return adapted


def make_optimizer(kind: str, weight_decay: Optional[float] = None,
                   ema_decay: float = 0.0,
                   fused: bool = False) -> optax.GradientTransformation:
    """torch-parity Adam/AdamW with runtime-injected learning rate;
    ema_decay > 0 chains a parameter EMA (param_ema). With ema_decay=0
    and fused=False the optimizer state structure is EXACTLY the
    historical one, so old checkpoints stay restorable.

    fused=True (--fused_opt) wraps the inner Adam in optax.flatten: the
    update runs as ONE vectorized m/v/param pass over a single
    ravel_pytree vector instead of ~70 per-leaf elementwise kernels
    (the train-step anatomy's multiply_add swarm — BASELINE.md round-3
    train anatomy). Numerically identical per element (Adam is
    elementwise); opt_state holds FLAT mu/nu vectors, so checkpoints
    written with the flag only restore with the flag (and vice versa) —
    restore() converts between the two layouts when shapes allow."""
    wd = 0.01 if weight_decay is None else weight_decay
    if kind not in ("adam", "adamw"):
        raise ValueError("unknown optimizer %r" % (kind,))

    def inner(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
        tx = (optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
              if kind == "adam"
              else optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                               weight_decay=wd))
        return optax.flatten(tx) if fused else tx

    if not ema_decay:
        if not fused:
            # historical structure, bit-for-bit: keeps every pre-EMA
            # checkpoint's opt_state restorable
            if kind == "adam":
                return optax.inject_hyperparams(optax.adam)(
                    learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8
                )
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd
            )

        # hyperparams-dict parity with the historical signatures above
        # (inject_hyperparams introspects the callee), so per-leaf
        # checkpoints convert to the fused layout by mu/nu ravel alone
        if kind == "adam":
            def fused_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                           eps_root=0.0):
                return optax.flatten(optax.adam(
                    learning_rate, b1=b1, b2=b2, eps=eps, eps_root=eps_root))

            return optax.inject_hyperparams(fused_adam)(
                learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8)

        def fused_adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                        eps_root=0.0, weight_decay=0.01):
            return optax.flatten(optax.adamw(
                learning_rate, b1=b1, b2=b2, eps=eps, eps_root=eps_root,
                weight_decay=weight_decay))

        return optax.inject_hyperparams(fused_adamw)(
            learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)

    def with_ema(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
        return optax.chain(inner(learning_rate, b1=b1, b2=b2, eps=eps),
                           param_ema(ema_decay))

    return optax.inject_hyperparams(with_ema)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8)


class SRModel:
    """Base class for every model wrapper in the zoo."""

    # subclasses set these in prepare()
    module = None
    loss = staticmethod(l1_loss)
    optimizer_kind = "adam"
    supported_scales = (2, 3, 4)
    single_scale_only = True

    def __init__(self):
        self.global_step = 0
        self.total_volume = 0.0
        self.temp_volume = 0.0
        self.volume_per_step = 0
        self.params = None
        self.opt_state = None
        self.tx = None
        self.args = None
        self.scale_list: List[int] = []
        self.scale: int = 4
        self.is_training = False
        self._fwd_jit = None
        self._train_jit = None
        self._rng = np.random.default_rng()

    # ---- plugin protocol -------------------------------------------------

    def parse_args(self, args):
        raise NotImplementedError

    def build_module(self):
        """Return the Flax module for the configured args/scale."""
        raise NotImplementedError

    def prepare(self, is_training: bool, scales: Sequence[int], global_step: int = 0, seed: int = 0):
        self.global_step = global_step
        self.total_volume = 0.0
        self.temp_volume = 0.0
        self.scale_list = list(scales)
        for s in self.scale_list:
            if s not in self.supported_scales:
                raise ValueError("Unsupported scale is provided.")
        if self.single_scale_only and len(self.scale_list) != 1:
            raise ValueError("Only one scale should be provided.")
        self.scale = self.scale_list[0]
        self.is_training = is_training
        _args = getattr(self, "args", None)
        if (is_training and getattr(_args, "qat", 0)
                and not getattr(_args, "packed_trunk", 0)):
            raise ValueError(
                "--qat 1 requires --packed_trunk 1: QAT fake-quantizes the "
                "packed conv pairs the int8 serving path runs "
                "(ops/packed_trunk.qat_pair)")
        if (is_training and getattr(_args, "remat", 0)
                and not getattr(_args, "packed_trunk", 0)):
            raise ValueError(
                "--remat 1 requires --packed_trunk 1: rematerialization "
                "wraps the packed conv pairs (ops/packed_trunk.remat_pair); "
                "the plain module graph would silently train without it")

        self.module = self.build_module()
        init_rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 16, 16, 3), jnp.float32)
        variables = self._init_variables(init_rng, dummy)
        self.params = variables["params"]

        if is_training:
            self.tx = make_optimizer(
                self.optimizer_kind,
                ema_decay=float(getattr(self, "ema_decay", 0.0) or 0.0),
                fused=bool(getattr(self, "fused_opt", 0)))
            self.opt_state = self.tx.init(self.params)
            self._train_jit = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._fwd_jit = jax.jit(self._forward_impl)

    def _init_variables(self, rng, dummy):
        """Initialize ALL module parameters (overridden by multi-exit
        families, whose default call path would lazily skip some legs)."""
        return self.module.init(rng, dummy)

    # ---- forward/train ---------------------------------------------------

    def _forward_impl(self, params, x):
        return self.module.apply({"params": params}, x)

    def _compute_loss(self, params, inputs, targets):
        out = self.module.apply({"params": params}, inputs)
        return self.loss(out, targets)

    def _train_step_impl(self, params, opt_state, lr, inputs, targets):
        accum = int(getattr(self, "grad_accum", 1) or 1)
        if accum > 1:
            loss, grads = self._accumulated_grads(params, inputs, targets, accum)
        else:
            loss, grads = jax.value_and_grad(self._compute_loss)(params, inputs, targets)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _accumulated_grads(self, params, inputs, targets, accum: int):
        """Gradient accumulation (`--grad_accum`): a lax.scan over equal
        microbatches inside the SAME jit — peak activation memory scales
        with batch/accum while the optimizer sees the full-batch mean
        gradient. Exact for mean-reduction losses (every family's):
        mean-of-equal-microbatch-means == full-batch mean. The reference
        has no equivalent (it would need torch-side loss.backward()
        accumulation); on TPU this is the lever for reference-scale or
        larger effective batches on a single chip's HBM."""
        if inputs.shape[0] % accum:
            raise ValueError(
                "batch size %d is not divisible by --grad_accum %d"
                % (inputs.shape[0], accum))
        mb = inputs.shape[0] // accum
        xs = (inputs.reshape(accum, mb, *inputs.shape[1:]),
              targets.reshape(accum, mb, *targets.shape[1:]))

        def body(carry, xt):
            loss, grads = jax.value_and_grad(self._compute_loss)(params, xt[0], xt[1])
            return (carry[0] + loss,
                    jax.tree_util.tree_map(jnp.add, carry[1], grads)), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss_sum, grad_sum), _ = jax.lax.scan(body, (jnp.zeros(()), zero), xs)
        inv = 1.0 / accum
        return loss_sum * inv, jax.tree_util.tree_map(lambda g: g * inv, grad_sum)

    def get_learning_rate(self) -> float:
        raise NotImplementedError

    def train_step(self, input_list, scale, truth_list, summary=None):
        """One optimizer step on a batch of CHW host arrays
        (reference models/base.py:65-76 contract)."""
        inputs = chw_list_to_nhwc(input_list)
        targets = chw_list_to_nhwc(truth_list)
        lr = self.get_learning_rate()
        self.params, self.opt_state, loss = self._train_jit(
            self.params, self.opt_state, lr, inputs, targets
        )
        self.global_step += 1
        loss_val = float(loss)
        if summary is not None:
            summary.scalar("loss", loss_val, self.global_step)
            summary.scalar("lr", lr, self.global_step)
            if hasattr(summary, "image"):
                # input/output/truth triplets (reference models/edsr.py:102-106)
                out = np.asarray(self._fwd_jit(self.params, inputs[:4]))
                for i in range(min(4, out.shape[0])):
                    summary.image("input/%d" % i, np.asarray(inputs[i]).transpose(2, 0, 1), self.global_step)
                    summary.image("output/%d" % i, out[i].transpose(2, 0, 1), self.global_step)
                    summary.image("truth/%d" % i, np.asarray(targets[i]).transpose(2, 0, 1), self.global_step)
        return loss_val

    def _input_to_device(self, input_list):
        """Batch host frames onto the device for the routed forward.

        uint8 CHW frames (the serving path: PNG decodes ARE uint8) cross
        the host->device link at 1 byte/px and cast to float32 ON DEVICE
        — exact, since every uint8 value is float32-representable, and
        4x less H2D traffic (the twin of upscale_uint8's D2H win). The
        cast is jitted SEPARATELY and composed in front of the routed
        forward, so self._fwd_jit never re-traces. Anything else takes
        the f32 reference-contract path (chw_list_to_nhwc)."""
        if (isinstance(input_list, (list, tuple)) and input_list
                and all(getattr(im, "dtype", None) == np.uint8
                        for im in input_list)):
            if getattr(self, "_cast_f32_jit", None) is None:
                self._cast_f32_jit = jax.jit(
                    lambda x8: x8.astype(jnp.float32))
            x8 = np.stack([np.asarray(im) for im in input_list])
            return self._cast_f32_jit(jnp.asarray(x8.transpose(0, 2, 3, 1)))
        return chw_list_to_nhwc(input_list)

    def upscale(self, input_list, scale):
        """SR a list of CHW host images -> CHW float numpy
        (reference models/base.py:78-85 contract)."""
        x = self._input_to_device(input_list)
        out = self._fwd_jit(self.params, x)
        return nhwc_to_chw_numpy(out)

    def upscale_uint8(self, input_list, scale):
        """SR + challenge-protocol uint8 quantization ON DEVICE -> CHW
        uint8 numpy.

        The serving path (cli/serve.py, cli/get_sr.py) immediately does
        clip(round(out), 0, 255).astype(uint8) on the host to PNG-encode
        (reference validate.py:17-18 semantics); doing that on device
        before the transfer moves 4x less data across the device->host
        link — the dominant cost of a full-frame SR pass on any host,
        PCIe or tunnel. Exact: jnp.round and np.round are both
        half-to-even, so the bytes equal the host-quantized f32 contract
        path's.

        The quantizer is jitted SEPARATELY and composed on the routed
        forward's device output (never re-traces self._fwd_jit — the
        packed/collapsed/int8/plain-frame routings would otherwise pay
        their multi-minute AOT compile a second time per geometry).
        """
        out = self.upscale_device(input_list, scale, uint8=True)
        return nhwc_to_chw_numpy(out)

    def upscale_device(self, input_list, scale, uint8=True, keep=None):
        """Dispatch the routed SR forward and return the DEVICE batch
        (NHWC jax array) WITHOUT blocking on the device->host transfer.

        JAX dispatch is asynchronous: the caller can release its device
        serialization lock right after this returns and pull the bytes
        (np.asarray) while the next request's compute runs — the
        serving pipeline that overlaps transfer with compute
        (cli/serve.py --pipeline_depth). `keep` trims the batch ON
        DEVICE before the pull so padded frames (dp / artifact batch
        alignment) never cross the link."""
        if getattr(self, "_quant_u8_jit", None) is None:
            self._quant_u8_jit = jax.jit(lambda o: jnp.clip(
                jnp.round(o), 0, 255).astype(jnp.uint8))
        x = self._input_to_device(input_list)
        out = self._fwd_jit(self.params, x)
        if uint8:
            out = self._quant_u8_jit(out)
        if keep is not None and keep < out.shape[0]:
            out = out[:keep]
        return out

    def test(self, input_list):
        """Forward returning the device batch (reference models/LarvaNet.py:173-181)."""
        x = chw_list_to_nhwc(input_list)
        return self._fwd_jit(self.params, x)

    def fwd_runtime(self, input_batch_nhwc):
        """Raw jitted forward on an already-device NHWC batch
        (reference models/edsr.py:120-122); caller blocks on the result."""
        return self._fwd_jit(self.params, input_batch_nhwc)

    def get_model(self):
        return self.module

    def get_lr(self):
        """Reference API alias (models/LarvaNet.py:197-198)."""
        return self.get_learning_rate()

    # ---- on-device validation ---------------------------------------------

    def _val_psnr_impl(self, params, x, t):
        """SR forward + challenge-protocol RGB PSNR, entirely on device.

        Only a scalar crosses back to the host — critical on TPU, where
        pulling full SR frames to the host for numpy PSNR (the
        reference's validate flow) is transfer-bound.
        """
        out = self._forward_impl(params, x)
        o = jnp.clip(jnp.round(out), 0, 255)
        tt = jnp.clip(jnp.round(t), 0, 255)
        tt = tt[:, : o.shape[1], : o.shape[2], :]
        mse = jnp.mean(jnp.square(tt - o))
        return 10.0 * jnp.log10(255.0 ** 2 / mse)

    def psnr_on_device(self, input_chw: np.ndarray, truth_chw: np.ndarray) -> float:
        """Challenge-protocol PSNR of upscale(input) vs truth (one scalar
        readback; jit cached per image shape)."""
        if getattr(self, "_val_psnr_jit", None) is None:
            self._val_psnr_jit = jax.jit(self._val_psnr_impl)
        x = chw_list_to_nhwc([input_chw])
        t = chw_list_to_nhwc([truth_chw])
        return float(self._val_psnr_jit(self.params, x, t))

    def get_next_train_scale(self):
        return self.scale_list[self._rng.integers(len(self.scale_list))]

    # ---- checkpointing ----------------------------------------------------

    def _state_dict(self) -> Dict[str, Any]:
        # leaves stay DEVICE arrays: host conversion happens in save()
        # (sync) or on the async writer thread — converting here would
        # block on the tunnel's slow D2H path even for async saves
        state = {
            "params": self.params,
            "global_step": self.global_step,
            "total_volume": self.total_volume,
        }
        if self.opt_state is not None:
            state["opt_state"] = self.opt_state
        return state

    def _load_state_dict(self, state: Dict[str, Any], strict: bool = True) -> None:
        _validate_param_shapes(
            serialization.to_state_dict(self.params),
            serialization.to_state_dict(state["params"]),
            strict=strict,
        )
        if strict:
            self.params = serialization.from_state_dict(self.params, serialization.to_state_dict(state["params"]))
        else:
            # Partial restore: only keys present in both (reference
            # models/LarvaNetV2.py:198-207 filters the loaded dict).
            loaded = serialization.to_state_dict(state["params"])
            current = serialization.to_state_dict(self.params)
            merged = _merge_partial(current, loaded)
            self.params = serialization.from_state_dict(self.params, merged)
        self.global_step = int(state.get("global_step", self.global_step))
        self.total_volume = float(state.get("total_volume", self.total_volume))
        # Eval-side restores (no live opt_state) keep the EMA subtree for
        # use_ema_params; training resumes read it from opt_state instead,
        # so don't pin a params-sized host copy for the whole run.
        # ("ema_params" kept for checkpoints written by an interim build.)
        if self.opt_state is None:
            self._restored_ema = (state.get("ema_params")
                                  or find_ema_in_state_dict(
                                      serialization.to_state_dict(
                                          state.get("opt_state", {}))))
        else:
            self._restored_ema = None
        if self.opt_state is not None and "opt_state" in state:
            saved_opt = serialization.to_state_dict(state["opt_state"])
            # --fused_opt layout conversion: per-leaf Adam moments <->
            # one ravel_pytree vector (the same leaf order optax.flatten
            # uses), so resumes cross the flag either way. Must run
            # BEFORE from_state_dict: flax accepts a dict into an array
            # leaf silently and the mismatch would only explode mid-step.
            adapted = _adapt_opt_layout(
                serialization.to_state_dict(self.opt_state), saved_opt,
                self.params)
            if adapted is not None:
                print("converted checkpoint optimizer state between "
                      "per-leaf and fused (--fused_opt) layouts")
                saved_opt = adapted
            try:
                self.opt_state = serialization.from_state_dict(
                    self.opt_state, saved_opt)
            except (KeyError, ValueError) as exc:
                raise ValueError(
                    "optimizer state in the checkpoint does not match this "
                    "run's optimizer — --ema_decay must be consistent across "
                    "a resumed run (on: EMA state present; off: absent). "
                    "Original error: %s" % (exc,)) from exc

    def use_ema_params(self) -> None:
        """Swap the restored EMA average into self.params (`--ema` on the
        eval CLIs). Call right after restore and BEFORE any fast-path
        routing that bakes weights (collapsed tail, int8 calibration)."""
        ema = self._restored_ema if getattr(self, "_restored_ema", None) is not None \
            else find_ema(self.opt_state)
        if ema is None:
            raise ValueError(
                "checkpoint has no EMA weights — train with --ema_decay")
        self.params = serialization.from_state_dict(
            self.params, serialization.to_state_dict(ema))

    def checkpoint_name(self) -> str:
        return "model_%d.ckpt" % (self.global_step,)

    def save(self, base_path: str) -> str:
        """Write a checkpoint. With `self.async_checkpoints` set (the
        train CLIs' --async_checkpoint), returns as soon as the state is
        snapshotted to fresh device buffers; serialization and disk IO
        happen on a background thread (utils/checkpoints.py) — on this
        TPU tunnel a synchronous save stalls the loop on ~200 KB/s D2H.
        Call wait_for_checkpoints() before depending on the file."""
        os.makedirs(base_path, exist_ok=True)
        path = os.path.join(base_path, self.checkpoint_name())
        state = serialization.to_state_dict(self._state_dict())

        if getattr(self, "orbax_checkpoints", False):
            return self._save_orbax(path, state)

        if getattr(self, "async_checkpoints", False):
            if getattr(self, "_ckpt_writer", None) is None:
                from larvanet_tpu.utils.checkpoints import AsyncCheckpointWriter

                self._ckpt_writer = AsyncCheckpointWriter()
            self._ckpt_writer.submit(state, path)
            return path

        def to_host(leaf):
            # Device arrays -> numpy; leave Python scalars/strings alone
            # (msgpack handles them natively; np.asarray('max') would
            # produce a str ndarray msgpack can't round-trip).
            if isinstance(leaf, (jax.Array, np.ndarray)):
                return np.asarray(leaf)
            return leaf

        payload = serialization.msgpack_serialize(
            jax.tree_util.tree_map(to_host, state)
        )
        with open(path, "wb") as f:
            f.write(payload)
        return path

    def _save_orbax(self, path: str, state) -> str:
        """Orbax-backed checkpoint (`--orbax_checkpoint`): a DIRECTORY at
        the same reference-contract path (model_<step>.ckpt/), per-leaf
        tensorstore storage with atomic finalization. The production
        option for very large or multi-host runs: under an initialized
        jax.distributed (parallel/distributed.py) orbax coordinates the
        save across processes, where the msgpack writer assumes
        single-host replicated state. With --async_checkpoint the disk
        IO runs on orbax's own async machinery (the device->host copy
        itself is synchronous by orbax design — donation-safe without
        a snapshot). restore() auto-detects the directory format."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        if os.path.isfile(path):
            # a prior non-orbax run left a msgpack FILE at this name
            # (advisor r2: rmtree would raise NotADirectoryError)
            os.unlink(path)
        if getattr(self, "async_checkpoints", False):
            # orbax refuses to overwrite, and the async writer's
            # completion point is unknown here — remove-first is the
            # only ordering; wait_for_checkpoints() surfaces failures
            if os.path.isdir(path):
                import shutil

                shutil.rmtree(path)
            if getattr(self, "_orbax_async", None) is None:
                self._orbax_async = ocp.AsyncCheckpointer(
                    ocp.PyTreeCheckpointHandler())
            self._orbax_async.save(path, state)
        else:
            # never delete the existing checkpoint before the new one is
            # durable: write to a temp name, then swap (advisor r2)
            import shutil

            tmp = path + ".tmp-new"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            ocp.PyTreeCheckpointer().save(tmp, state)
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.rename(tmp, path)
        return path

    def wait_for_checkpoints(self) -> None:
        """Block until every async save has reached disk (no-op for
        synchronous saves); re-raises writer errors."""
        if getattr(self, "_ckpt_writer", None) is not None:
            self._ckpt_writer.wait()
        if getattr(self, "_orbax_async", None) is not None:
            self._orbax_async.wait_until_finished()

    def restore(self, ckpt_path: str, target=None, strict: bool = True) -> None:
        if ckpt_path.endswith((".pth", ".pt")):
            self._restore_pth(ckpt_path, strict=strict)
            return
        if os.path.isdir(ckpt_path):  # orbax directory format
            state = _orbax_restore_numpy(os.path.abspath(ckpt_path))
        else:
            with open(ckpt_path, "rb") as f:
                state = serialization.msgpack_restore(f.read())
        self._load_state_dict(state, strict=strict)

    def _restore_pth(self, ckpt_path: str, strict: bool = True) -> None:
        """Restore directly from a reference torch checkpoint.

        Lets reference users point `--restore_path` at their trained
        `model_<step>.pth` (reference models/edsr.py:61-66 format) in any
        CLI; conversion runs through utils/torch_convert's per-family
        rules (OIHW->HWIO etc.). Optimizer state is not present in
        reference checkpoints (they save bare state_dicts), so resuming
        training from a .pth restarts Adam moments — same as the
        reference itself.
        """
        from larvanet_tpu.utils import torch_convert

        name = getattr(self, "registry_name", None)
        if name is None or name not in torch_convert.RULES:
            raise ValueError(
                "don't know how to convert a .pth for model %r; use "
                "utils/torch_convert manually" % (name,)
            )
        params, skipped, ms_overrides = torch_convert.load_pth(ckpt_path, name)
        if skipped:
            print("restore: skipped reference-only keys: %s" % (skipped,))
        if ms_overrides:
            # The checkpoint's frozen MeanShift convs deviate from the
            # intended identity+bias — the reference constructor bug
            # (models/edsr.py:131-133) leaves them RANDOM, so the model
            # was trained around them. Install the actual affines on the
            # module (layers.MeanShift.affine) for function parity.
            import dataclasses

            try:
                self.module = dataclasses.replace(self.module, **ms_overrides)
            except TypeError as e:
                raise ValueError(
                    "checkpoint %s carries trained (non-identity) MeanShift "
                    "convs %s but module %s does not accept the override "
                    "fields: %s" % (ckpt_path, sorted(ms_overrides),
                                    type(self.module).__name__, e))
            print("restore: installed the checkpoint's trained MeanShift "
                  "affines on the module (%s) — the reference trains around "
                  "its randomly-initialized frozen shifts"
                  % ", ".join(sorted(ms_overrides)))
            if getattr(self.args, "packed_trunk", 0):
                # the packed/collapsed/int8 graphs bake the INTENDED
                # +/-mean shifts (ops/packed_trunk.py), not arbitrary
                # affines; routing them would silently change the
                # restored function. ops/fastpath.py refuses too.
                self.args.packed_trunk = 0
                for attr in ("_packed_cache", "_qat_cache", "_packed_train"):
                    if getattr(self, attr, None) is not None:
                        setattr(self, attr, None)
                print("restore: disabled --packed_trunk — the packed graphs "
                      "bake the intended mean shifts, not this checkpoint's "
                      "trained affines; running the exact module graph")
            # the jitted closures captured the old module — rebuild them
            self._fwd_jit = jax.jit(self._forward_impl)
            self._val_psnr_jit = None
            if self.is_training and getattr(self, "_train_jit", None) is not None:
                self._train_jit = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        current = serialization.to_state_dict(self.params)
        _validate_param_shapes(current, params, strict=strict)
        if strict:
            self.params = serialization.from_state_dict(self.params, params)
        else:
            self.params = serialization.from_state_dict(
                self.params, _merge_partial(current, params)
            )


def _orbax_restore_numpy(path: str) -> Dict:
    """Restore an orbax checkpoint directory to HOST numpy leaves.

    Cross-topology safety (VERDICT r3 next#3): restoring without a
    target re-creates each array with the sharding recorded at SAVE
    time — orbax itself warns "Sharding info not provided ... unsafe
    when restoring on a different topology", and train-on-N /
    serve-on-1 (or resume-on-M) is the canonical multichip flow. Array
    leaves are therefore restored as plain np.ndarray (exactly what
    the msgpack path yields): host data carries no topology, and the
    first jitted call under the CURRENT mesh places it correctly.
    Scalars/strings (global_step, scheduler state) restore as saved.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)

    def rarg(m):
        if type(m).__name__ == "ArrayMetadata":
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return ocp.RestoreArgs()

    try:
        restore_args = jax.tree_util.tree_map(rarg, dict(tree))
    except (TypeError, ValueError):
        # metadata layout from an older orbax: fall back to the
        # targetless restore (single-topology only)
        return ckptr.restore(path)
    return ckptr.restore(path, restore_args=restore_args)


def _validate_param_shapes(current: Dict, loaded: Dict, strict: bool, prefix: str = "") -> None:
    """Fail loudly on architecture mismatch instead of silently loading
    wrong-shaped weights. strict additionally requires every current key
    to be present in the checkpoint."""
    for k, cur in current.items():
        path = "%s/%s" % (prefix, k) if prefix else str(k)
        if k not in loaded:
            if strict:
                raise ValueError("checkpoint is missing parameter %r" % (path,))
            continue
        ld = loaded[k]
        if isinstance(cur, dict):
            _validate_param_shapes(cur, ld, strict, path)
        else:
            cs, ls = np.shape(cur), np.shape(ld)
            if cs != ls:
                raise ValueError(
                    "checkpoint shape mismatch at %r: model %s vs checkpoint %s"
                    % (path, cs, ls)
                )


def _merge_partial(current: Dict, loaded: Dict) -> Dict:
    out = {}
    for k, v in current.items():
        if k in loaded:
            if isinstance(v, dict) and isinstance(loaded[k], dict):
                out[k] = _merge_partial(v, loaded[k])
            else:
                out[k] = loaded[k]
        else:
            out[k] = v
    return out


class StepDecayMixin:
    """lr = base * decay^(step // decay_steps) (reference models/edsr.py:124-125)."""

    lr_flag = "lr"
    decay_flag = "lr_decay"
    decay_steps_flag = "lr_step"

    def get_learning_rate(self) -> float:
        base = getattr(self.args, self.lr_flag)
        decay = getattr(self.args, self.decay_flag)
        steps = getattr(self.args, self.decay_steps_flag)
        return base * (decay ** (self.global_step // steps))
