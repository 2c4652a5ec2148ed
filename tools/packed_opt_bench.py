"""Packed-domain optimizer state: the measured verdict (VERDICT r3 #8).

After the LR-domain loss, the EDSR train step's residual copy share
(~0.4 ms/step, ~11% at 266 steps/s) is the packed layout's own fwd/bwd
crossings: every step packs each ResBlock kernel (slicing/concat of the
canonical f32[3,3,C,C] params into the [3,2,2C,2C] packed layout) in
the forward and transposes gradients back through the packing in the
backward. Round 3 floored "store the params packed between steps" as
out of proportion WITHOUT measuring; this tool measures it.

Arm A — the shipped default step: canonical params, packed+collapsed
  +LR-domain graph (models/edsr._compute_loss), Adam on canonical
  leaves. The per-step packing is inside fwd+bwd.

Arm B — packed-domain params: ResBlock kernels/biases pre-packed ONCE
  (ops/packed/core.pack_kernel_a/_b + pack_bias); the training graph
  consumes them directly (no pack in fwd, no unpack-transpose in bwd),
  Adam runs on the packed pytree. NOTE this arm is a TIMING UPPER
  BOUND, not a shippable trainer: the packed kernel's structural-zero
  slots become independently trainable (grads there are generally
  nonzero), so exactness would additionally require per-step grad
  re-symmetrization / zero-masking — work that can only make arm B
  slower. If even this bound shows no win, the idea is floored by
  measurement.

Methodology: chained lax.fori_loop train steps, two loop lengths
differenced (tools/train_microbench.py — the only trustworthy timing on
this tunnel, CLAUDE.md). Writes PACKED_OPT.json.

Usage (repo root, TPU):  python -m tools.packed_opt_bench
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _prepack(params_sd, dtype):
    """res_block_* conv pairs -> packed layout, everything else as is."""
    import jax.numpy as jnp

    from larvanet_tpu.ops.packed.core import (
        pack_bias, pack_kernel_a, pack_kernel_b)

    out = {}
    for key, sub in params_sd.items():
        if key.startswith("res_block_"):
            out[key] = {
                "conv1": {"kernel": jnp.asarray(
                              pack_kernel_a(jnp.asarray(sub["conv1"]["kernel"], dtype))),
                          "bias": pack_bias(jnp.asarray(sub["conv1"]["bias"], dtype))},
                "conv2": {"kernel": jnp.asarray(
                              pack_kernel_b(jnp.asarray(sub["conv2"]["kernel"], dtype))),
                          "bias": pack_bias(jnp.asarray(sub["conv2"]["bias"], dtype))},
            }
        else:
            out[key] = sub
    return out


def _prepacked_pair(dtype):
    """exact_pair minus the per-call kernel packing: p1/p2 already hold
    packed kernels/biases (same call contract as ops/packed/pairs)."""
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.ops.packed.core import conv_a, conv_b

    def pair(idx, hin, p1, p2, mask1, kind="res", act=jax.nn.relu,
             res_weight=1.0, mask0=None):
        t = conv_a(hin, jnp.asarray(p1["kernel"], dtype),
                   jnp.asarray(p1["bias"], dtype))
        t = act(t) * mask1
        t = conv_b(t, jnp.asarray(p2["kernel"], dtype),
                   jnp.asarray(p2["bias"], dtype))
        if res_weight != 1.0:
            t = t * jnp.asarray(res_weight, dtype)
        if kind == "both":
            out = hin + t
            if mask0 is not None:
                t, out = t * mask0, out * mask0
            return t, out
        out = hin + t if kind == "res" else t
        return out if mask0 is None else out * mask0

    return pair


def _time_chain(step_fn, params, opt_state, lr, x, t, n1, n2, reps):
    import jax
    import jax.numpy as jnp

    def chain(n):
        def body(_, carry):
            p, o, _ = carry
            return step_fn(p, o, lr, x, t)

        @jax.jit
        def run(p, o):
            _, _, loss = jax.lax.fori_loop(0, n, body, (p, o, jnp.float32(0)))
            return loss

        return run

    run1, run2 = chain(n1), chain(n2)
    l1 = float(run1(params, opt_state))
    l2 = float(run2(params, opt_state))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(params, opt_state))
        t1 = time.perf_counter()
        float(run2(params, opt_state))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        best = ms if best is None else min(best, ms)
    return best, l1, l2


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--input_patch_size", type=int, default=48)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=120)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="PACKED_OPT.json")
    args, remaining = ap.parse_known_args(argv)
    if remaining and remaining[0] == "--":
        remaining = remaining[1:]  # model flags after `--` (CPU smoke: tiny configs)

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from larvanet_tpu.cli.common import enable_compile_cache
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.ops.packed.edsr import _edsr_walk
    from larvanet_tpu.ops.pixel_shuffle import pixel_unshuffle
    from larvanet_tpu.train.losses import l1_loss

    enable_compile_cache()
    model = get_model("edsr")
    model.parse_args(list(remaining))
    model.prepare(is_training=True, scales=[args.scale])

    p = args.input_patch_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (args.batch_size, p, p, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(
        0, 255, (args.batch_size, p * args.scale, p * args.scale, 3)).astype(np.float32))
    lr = jnp.float32(model.get_learning_rate())

    # ---- arm A: the shipped default step -----------------------------------
    ms_a, la1, la2 = _time_chain(model._train_step_impl, model.params,
                                 model.opt_state, lr, x, t,
                                 args.n1, args.n2, args.reps)
    print("arm A (default packed+collapsed+lr_domain): %.3f ms/step "
          "(%.1f steps/s)" % (ms_a, 1e3 / ms_a), flush=True)

    # ---- arm B: packed-domain params + optimizer state ---------------------
    dtype = jnp.float32
    walk = _edsr_walk(model, dtype, "live_collapsed", lr_domain=True)
    pair = _prepacked_pair(dtype)
    sd = serialization.to_state_dict(model.params)
    packed_params = _prepack(sd, dtype)

    def loss_b(pp, xx, tt_unshuf):
        return l1_loss(walk(pp, xx, pair), tt_unshuf)

    tx = model.tx
    opt_b = tx.init(packed_params)

    def step_b(pp, oo, lr_, xx, tt):
        # unshuffle the PASSED target inside the timed graph — arm A's
        # lr_domain loss pays the same per-step unshuffle, so hoisting it
        # out (the round-4 review finding) would bias arm B's bound
        loss, grads = jax.value_and_grad(loss_b)(pp, xx, pixel_unshuffle(tt, args.scale))
        oo.hyperparams["learning_rate"] = jnp.asarray(lr_, jnp.float32)
        updates, oo = tx.update(grads, oo, pp)
        return optax.apply_updates(pp, updates), oo, loss

    ms_b, lb1, lb2 = _time_chain(step_b, packed_params, opt_b, lr, x, t,
                                 args.n1, args.n2, args.reps)
    print("arm B (packed-domain params, timing upper bound): %.3f ms/step "
          "(%.1f steps/s)" % (ms_b, 1e3 / ms_b), flush=True)

    # NOT an equality check: la1/lb1 are losses after n1 optimizer steps
    # of two arms whose trajectories legitimately diverge (arm B trains
    # the structural-zero slots) — recorded only as a sanity magnitude
    report = {
        "geometry": {"batch": args.batch_size, "patch": p, "scale": args.scale},
        "arm_a_default": {"ms_step": round(ms_a, 4),
                          "steps_s": round(1e3 / ms_a, 1)},
        "arm_b_packed_domain": {"ms_step": round(ms_b, 4),
                                "steps_s": round(1e3 / ms_b, 1),
                                "note": "timing UPPER BOUND: structural-zero "
                                        "slots trainable; exact variant needs "
                                        "extra grad re-symmetrization"},
        "speedup_bound": round(ms_a / ms_b, 4),
        "loss_after_n1_steps": {"arm_a": la1, "arm_b": lb1,
                                "note": "trajectories diverge by design "
                                        "(arm B trains zero slots); "
                                        "magnitude sanity only"},
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"speedup_bound": report["speedup_bound"]}))
    return report


if __name__ == "__main__":
    main()
