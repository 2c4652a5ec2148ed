"""Device-pipeline sampler anatomy (round 4 recipe-throughput follow-up).

RECIPE_FULL.json measured the full EDSR recipe at 205 steps/s where the
bare train step runs 266 (tools/train_microbench.py): the on-device
sampler + augmentation costs ~23% of every recipe step. Suspect: each
vmapped sample indexes `stack[idx]` BEFORE dynamic-slicing the patch —
under vmap that's a gather materializing the full padded HR image
(~550 KB/sample, ~9 MB/step at batch 16) just to cut out a 192x192
window.

Variant v2 slices the (N, H, W, 3) stack directly with the image index
as the leading start — one 4-D dynamic_slice, no full-image
intermediate. Same key -> bitwise-identical batches (asserted here), so
it is a drop-in replacement if it wins.

Measures (chained-fori, nonlinear carry->key dependency so XLA cannot
hoist the sampling — CLAUDE.md methodology): sampler alone v1 vs v2,
and the full fused train chunk (sampler + EDSR default step) with each.
Writes SAMPLER_BENCH.json.

Usage (repo root, TPU):  python -m tools.sampler_bench
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_sample_legacy(pipe):
    """The pre-round-4 sampler: `stack[idx]` (a full-image gather under
    vmap) followed by a 3-D dynamic_slice — kept here as the measured
    baseline after device_pipeline switched to the direct 4-D slice."""
    import jax
    import jax.numpy as jnp

    s = pipe.scale

    def sample(key, batch_size, patch):
        hp = patch * s

        def one(k):
            k_img, k_y, k_x, k_rot, k_flip = jax.random.split(k, 5)
            idx = jax.random.randint(k_img, (), 0, pipe.dims.shape[0])
            h, w = pipe.dims[idx, 0], pipe.dims[idx, 1]
            y0 = jax.random.randint(k_y, (), 0, h - patch)
            x0 = jax.random.randint(k_x, (), 0, w - patch)
            lp = jax.lax.dynamic_slice(
                pipe.lr[idx], (y0, x0, 0), (patch, patch, 3))
            hq = jax.lax.dynamic_slice(
                pipe.hr[idx], (y0 * s, x0 * s, 0), (hp, hp, 3))
            kk = jax.random.randint(k_rot, (), 1, 5)
            flip = jax.random.bernoulli(k_flip)

            def aug(img):
                img = jax.lax.switch(kk % 4, [
                    lambda t: t,
                    lambda t: jnp.rot90(t, 1),
                    lambda t: jnp.rot90(t, 2),
                    lambda t: jnp.rot90(t, 3),
                ], img)
                return jnp.where(flip, img[:, ::-1, :], img)

            return aug(lp).astype(jnp.float32), aug(hq).astype(jnp.float32)

        keys = jax.random.split(key, batch_size)
        return jax.vmap(one)(keys)

    return sample


def _time_sampler(sample, key, batch, patch, n1, n2, reps):
    import jax
    import jax.numpy as jnp

    def chain(n):
        def body(i, acc):
            # nonlinear carry -> key dependency: sampling cannot hoist
            k = jax.random.fold_in(key, i * 2 + (acc.astype(jnp.int32) & 1))
            x, y = sample(k, batch, patch)
            return acc + x.sum() + y.sum()

        @jax.jit
        def run(z):
            return jax.lax.fori_loop(0, n, body, z)

        return run

    r1, r2 = chain(n1), chain(n2)
    float(r1(jnp.float32(0)))
    float(r2(jnp.float32(0)))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(jnp.float32(0)))
        t1 = time.perf_counter()
        float(r2(jnp.float32(0)))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        best = ms if best is None else min(best, ms)
    return best


def _time_chunk(model, sample, batch, patch, n1, n2, reps):
    import jax
    import jax.numpy as jnp

    def chain(n):
        def body(i, carry):
            params, opt_state, acc = carry
            k = jax.random.fold_in(jax.random.PRNGKey(0),
                                   i * 2 + (acc.astype(jnp.int32) & 1))
            x, y = sample(k, batch, patch)
            params, opt_state, loss = model._train_step_impl(
                params, opt_state, jnp.float32(1e-4), x, y)
            return params, opt_state, acc + loss

        @jax.jit
        def run(p, o):
            _, _, loss = jax.lax.fori_loop(0, n, body, (p, o, jnp.float32(0)))
            return loss

        return run

    r1, r2 = chain(n1), chain(n2)
    float(r1(model.params, model.opt_state))
    float(r2(model.params, model.opt_state))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(model.params, model.opt_state))
        t1 = time.perf_counter()
        float(r2(model.params, model.opt_state))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        best = ms if best is None else min(best, ms)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--input_patch_size", type=int, default=48)
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=120)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fixture", default="data/fixture_real")
    ap.add_argument("--out", default="SAMPLER_BENCH.json")
    args, remaining = ap.parse_known_args(argv)
    if remaining and remaining[0] == "--":
        remaining = remaining[1:]

    import jax

    from larvanet_tpu.cli.common import enable_compile_cache
    from larvanet_tpu.core.registry import get_model
    from larvanet_tpu.data import fixture, io
    from larvanet_tpu.data.device_pipeline import BucketedDevicePipeline
    import os

    fixture.ensure_realistic(args.fixture)
    names = sorted(os.listdir(os.path.join(args.fixture, "x4", "input")))
    lrs = [io.load_image_u8(os.path.join(args.fixture, "x4", "input", f))
           for f in names]
    hrs = [io.load_image_u8(os.path.join(args.fixture, "x4", "truth", f))
           for f in names]
    hrs = [h[: l.shape[0] * 4, : l.shape[1] * 4] for l, h in zip(lrs, hrs)]
    pipe = BucketedDevicePipeline.from_arrays(lrs, hrs, 4)

    legacy_inner = [make_sample_legacy(pp) for pp in pipe.pipelines]

    def v1(key, b, p):  # legacy: gather-then-slice
        import jax.numpy as jnp

        k_bucket, k_sample = jax.random.split(key)
        bb = jax.random.categorical(k_bucket, jnp.log(pipe.probs))
        return jax.lax.switch(
            bb, [lambda k, f=f: f(k, b, p) for f in legacy_inner], k_sample)

    def v2(key, b, p):  # current device_pipeline (direct 4-D slice)
        return pipe.sample_batch(key, b, p)

    # bitwise equivalence on a real key (drop-in safety)
    key = jax.random.PRNGKey(7)
    a = jax.jit(lambda k: v1(k, args.batch_size, args.input_patch_size))(key)
    b = jax.jit(lambda k: v2(k, args.batch_size, args.input_patch_size))(key)
    eq = all(bool((np.asarray(x) == np.asarray(y)).all()) for x, y in zip(a, b))
    print("v1 == v2 bitwise:", eq, flush=True)

    bsz, patch = args.batch_size, args.input_patch_size
    ms_v1 = _time_sampler(v1, key, bsz, patch, args.n1, args.n2, args.reps)
    ms_v2 = _time_sampler(v2, key, bsz, patch, args.n1, args.n2, args.reps)
    print("sampler alone: v1 %.3f ms  v2 %.3f ms" % (ms_v1, ms_v2), flush=True)

    enable_compile_cache()
    model = get_model("edsr")
    model.parse_args(list(remaining))
    model.prepare(is_training=True, scales=[4])
    ms_c1 = _time_chunk(model, v1, bsz, patch, args.n1, args.n2, args.reps)
    ms_c2 = _time_chunk(model, v2, bsz, patch, args.n1, args.n2, args.reps)
    print("full chunk: v1 %.3f ms/step (%.1f steps/s)  v2 %.3f ms/step (%.1f steps/s)"
          % (ms_c1, 1e3 / ms_c1, ms_c2, 1e3 / ms_c2), flush=True)

    report = {
        "bitwise_equal": eq,
        "sampler_only_ms": {"v1": round(ms_v1, 4), "v2": round(ms_v2, 4)},
        "train_chunk_ms_step": {"v1": round(ms_c1, 4), "v2": round(ms_c2, 4)},
        "chunk_speedup": round(ms_c1 / ms_c2, 4),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"chunk_speedup": report["chunk_speedup"]}))
    return report


if __name__ == "__main__":
    main()
