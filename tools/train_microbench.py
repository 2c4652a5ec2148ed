"""Train-step microbenchmark (hardened tunnel methodology, CLAUDE.md).

Chains N optimizer steps inside ONE jitted `lax.fori_loop` whose carry
is (params, opt_state, loss): every step consumes the previous step's
params, so XLA cannot hoist or dead-code-eliminate any of the work, and
the final scalar loss readback forces full execution. Two loop lengths
are differenced to cancel dispatch/readback overhead — naive per-step
wall timing is unreliable on this tunnel (block_until_ready acks early).

Usage:
  python tools/train_microbench.py --model edsr -- --packed_trunk 1 \
      --collapsed_tail_train 1
  (flags after `--` cascade into the model's own parser, reference-style)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from larvanet_tpu.cli.common import enable_compile_cache  # noqa: F401  (side effect)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="edsr")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--input_patch_size", type=int, default=48)
    parser.add_argument("--n1", type=int, default=20)
    parser.add_argument("--n2", type=int, default=120)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--fused_opt", type=int, default=0,
                        help="Flattened one-pass Adam (--fused_opt on the "
                             "train CLIs; models/base.make_optimizer).")
    args, remaining = parser.parse_known_args()
    if remaining and remaining[0] == "--":
        remaining = remaining[1:]

    from larvanet_tpu.core.registry import get_model

    model = get_model(args.model)
    model.parse_args(remaining)
    if args.fused_opt:
        model.fused_opt = 1
    model.prepare(is_training=True, scales=[args.scale])

    p = args.input_patch_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (args.batch_size, p, p, 3)).astype(np.float32))
    t = jnp.asarray(rng.uniform(
        0, 255, (args.batch_size, p * args.scale, p * args.scale, 3)
    ).astype(np.float32))
    lr = jnp.asarray(model.get_learning_rate(), jnp.float32)

    def chain(n):
        def body(_, carry):
            params, opt_state, _ = carry
            params, opt_state, loss = model._train_step_impl(
                params, opt_state, lr, x, t)
            return params, opt_state, loss

        @jax.jit
        def run(params, opt_state):
            _, _, loss = jax.lax.fori_loop(
                0, n, body, (params, opt_state, jnp.float32(0)))
            return loss

        return run

    run1, run2 = chain(args.n1), chain(args.n2)
    # compile + warm both
    float(run1(model.params, model.opt_state))
    float(run2(model.params, model.opt_state))

    best = None
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(run1(model.params, model.opt_state))
        t1 = time.perf_counter()
        float(run2(model.params, model.opt_state))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (args.n2 - args.n1) * 1e3
        best = ms if best is None else min(best, ms)
    steps_s = 1e3 / best
    mpix = args.batch_size * p * p * steps_s / 1e6
    print("model=%s  %.3f ms/step  %.1f steps/s  %.1f LR-MP/s"
          % (args.model, best, steps_s, mpix))


if __name__ == "__main__":
    main()
