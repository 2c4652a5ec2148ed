"""Device-resident data pipeline: sampling + augmentation inside jit.

The reference feeds every step from host threads (numpy crop/rot/flip,
then a host->device copy per step — SURVEY.md §3.1 hot loop). On TPU the
roles invert: HBM is huge next to a patch batch, so the entire uint8
dataset is uploaded ONCE and each training step samples, crops, rotates,
flips and converts to float *on device*, inside the same jit as the
optimizer step. Zero per-step host work, zero per-step transfers; with
`steps_per_call` the whole inner loop runs as one XLA while-loop.

Augmentation semantics match the reference exactly (crop aligned to
scale, rot90 k in 1..4, 50% horizontal flip —
dataloaders/div2k_train_loader.py:77-95), driven by a jax PRNG key.

Images are stacked padded to the max H/W in the set; crops sample only
inside each image's valid region. Memory cost is the padding waste —
fine for same-sized or bucketed sets (DIV2K-scale datasets should be
grouped into a few size buckets; see `from_arrays` callers).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DevicePipeline:
    """Uint8 dataset resident in HBM + a pure sampling function."""

    def __init__(self, lr_stack, hr_stack, dims, scale: int):
        self.lr = lr_stack  # (N, Hmax, Wmax, 3) uint8 on device
        self.hr = hr_stack  # (N, Hmax*s, Wmax*s, 3) uint8
        self.dims = dims    # (N, 2) int32 valid (h, w) of each LR image
        self.scale = scale

    @classmethod
    def from_arrays(cls, lr_images: Sequence[np.ndarray], hr_images: Sequence[np.ndarray], scale: int):
        n = len(lr_images)
        hmax = max(a.shape[0] for a in lr_images)
        wmax = max(a.shape[1] for a in lr_images)
        lr = np.zeros((n, hmax, wmax, 3), np.uint8)
        hr = np.zeros((n, hmax * scale, wmax * scale, 3), np.uint8)
        dims = np.zeros((n, 2), np.int32)
        for i, (a, b) in enumerate(zip(lr_images, hr_images)):
            if (a.shape[0] * scale, a.shape[1] * scale) != b.shape[:2]:
                raise ValueError("HR dims must be LR dims * scale")
            lr[i, : a.shape[0], : a.shape[1]] = a
            hr[i, : b.shape[0], : b.shape[1]] = b
            dims[i] = (a.shape[0], a.shape[1])
        return cls(jnp.asarray(lr), jnp.asarray(hr), jnp.asarray(dims), scale)

    def nbytes(self) -> int:
        return self.lr.size + self.hr.size

    def sample_batch(self, key, batch_size: int, patch: int) -> Tuple[jax.Array, jax.Array]:
        """Jittable: (key) -> (lr [B,p,p,3] f32, hr [B,p*s,p*s,3] f32)."""
        s = self.scale
        hp = patch * s

        def one(k):
            k_img, k_y, k_x, k_rot, k_flip = jax.random.split(k, 5)
            idx = jax.random.randint(k_img, (), 0, self.dims.shape[0])
            h, w = self.dims[idx, 0], self.dims[idx, 1]
            # reference: randint(dim - patch), requires dim > patch
            y0 = jax.random.randint(k_y, (), 0, h - patch)
            x0 = jax.random.randint(k_x, (), 0, w - patch)
            # slice the STACKED array with the image index as the leading
            # start: `stack[idx]` first would gather the full padded image
            # per vmapped sample (~9 MB/step of HR at batch 16) just to
            # cut a patch — measured 1.09x on the full fused train chunk
            # on the v5e (3.2x on the sampler alone; SAMPLER_BENCH.json,
            # tools/sampler_bench.py, bitwise-identical batches)
            lp = jax.lax.dynamic_slice(
                self.lr, (idx, y0, x0, 0), (1, patch, patch, 3))[0]
            hq = jax.lax.dynamic_slice(
                self.hr, (idx, y0 * s, x0 * s, 0), (1, hp, hp, 3))[0]
            kk = jax.random.randint(k_rot, (), 1, 5)  # rot90 k in 1..4
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


class BucketedDevicePipeline:
    """Several size buckets of a variably-sized dataset, each padded only
    to its own bucket maximum — bounds the HBM padding waste that a
    single max-padded stack would pay on DIV2K-scale size variety.

    Sampling picks a bucket with probability proportional to its image
    count (matching the reference's uniform-over-images choice,
    dataloaders/div2k_train_loader.py:63), then samples within it; patch
    shapes are bucket-independent so the whole thing stays jittable via
    lax.switch.
    """

    def __init__(self, pipelines: Sequence[DevicePipeline]):
        if not pipelines:
            raise ValueError("need at least one bucket")
        self.pipelines = list(pipelines)
        counts = np.array([p.dims.shape[0] for p in self.pipelines], np.float64)
        self.probs = jnp.asarray(counts / counts.sum(), jnp.float32)
        self.scale = self.pipelines[0].scale

    @classmethod
    def from_arrays(cls, lr_images, hr_images, scale: int, num_buckets: int = 4):
        order = np.argsort([a.shape[0] * a.shape[1] for a in lr_images])
        buckets = np.array_split(order, min(num_buckets, len(order)))
        pipes = [
            DevicePipeline.from_arrays(
                [lr_images[i] for i in idxs], [hr_images[i] for i in idxs], scale)
            for idxs in buckets if len(idxs)
        ]
        return cls(pipes)

    def nbytes(self) -> int:
        return sum(p.nbytes() for p in self.pipelines)

    def sample_batch(self, key, batch_size: int, patch: int):
        k_bucket, k_sample = jax.random.split(key)
        b = jax.random.categorical(k_bucket, jnp.log(self.probs))
        return jax.lax.switch(
            b,
            [lambda k, p=p: p.sample_batch(k, batch_size, patch) for p in self.pipelines],
            k_sample,
        )


def make_device_train_fn(model, pipeline, batch_size: int,
                         patch: int, steps_per_call: int = 100):
    """Fuse sampling + N optimizer steps into one jitted call.

    Returns step_chunk(params, opt_state, lr, key) ->
    (params, opt_state, mean_loss). The host only touches the device
    once per `steps_per_call` steps — the TPU-native replacement for the
    reference's thread-queue feeding (SURVEY.md §2.5 'async input
    pipeline').
    """

    def chunk(params, opt_state, lr, key):
        def body(i, carry):
            params, opt_state, acc = carry
            k = jax.random.fold_in(key, i)
            x, y = pipeline.sample_batch(k, batch_size, patch)
            params, opt_state, loss = model._train_step_impl(params, opt_state, lr, x, y)
            return params, opt_state, acc + loss

        params, opt_state, total = jax.lax.fori_loop(
            0, steps_per_call, body, (params, opt_state, jnp.float32(0.0)))
        return params, opt_state, total / steps_per_call

    return jax.jit(chunk, donate_argnums=(0, 1))
