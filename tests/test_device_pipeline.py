"""Device-resident data pipeline tests."""

import jax
import numpy as np

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.data.device_pipeline import DevicePipeline, make_device_train_fn


def _pipe(rng, n=3, h=24, w=32, scale=4):
    lr = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(n)]
    hr = [np.repeat(np.repeat(a, scale, 0), scale, 1) for a in lr]
    return DevicePipeline.from_arrays(lr, hr, scale), lr, hr


def test_sample_shapes_and_alignment(rng):
    pipe, lr, hr = _pipe(rng)
    key = jax.random.PRNGKey(0)
    bl, bh = jax.jit(lambda k: pipe.sample_batch(k, 8, 8))(key)
    bl, bh = np.asarray(bl), np.asarray(bh)
    assert bl.shape == (8, 8, 8, 3) and bh.shape == (8, 32, 32, 3)
    assert bl.dtype == np.float32
    # every sample de-augments to an aligned pair (HR = LR nearest-replicated)
    for b in range(8):
        found = False
        for k in range(4):
            for f in (0, 1):
                x = bl[b][:, ::-1] if f else bl[b]
                y = bh[b][:, ::-1] if f else bh[b]
                if np.array_equal(np.rot90(x, -k), np.rot90(y, -k)[::4, ::4]):
                    found = True
        assert found, b


def test_sampling_is_deterministic_per_key(rng):
    pipe, _, _ = _pipe(rng)
    key = jax.random.PRNGKey(3)
    a = pipe.sample_batch(key, 4, 8)
    b = pipe.sample_batch(key, 4, 8)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = pipe.sample_batch(jax.random.PRNGKey(4), 4, 8)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_variable_size_images_pad_safely(rng):
    lr = [rng.integers(0, 256, (16, 20, 3), np.uint8),
          rng.integers(0, 256, (24, 12, 3), np.uint8)]
    hr = [np.repeat(np.repeat(a, 4, 0), 4, 1) for a in lr]
    pipe = DevicePipeline.from_arrays(lr, hr, 4)
    bl, bh = pipe.sample_batch(jax.random.PRNGKey(0), 16, 8)
    # all patches must come from valid regions: check alignment again
    bl, bh = np.asarray(bl), np.asarray(bh)
    for b in range(16):
        found = False
        for k in range(4):
            for f in (0, 1):
                x = bl[b][:, ::-1] if f else bl[b]
                y = bh[b][:, ::-1] if f else bh[b]
                if np.array_equal(np.rot90(x, -k), np.rot90(y, -k)[::4, ::4]):
                    found = True
        assert found, b


def test_fused_train_chunk_decreases_loss(rng):
    pipe, _, _ = _pipe(rng, h=24, w=24)
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=True, scales=[4])
    chunk = make_device_train_fn(m, pipe, batch_size=4, patch=8, steps_per_call=5)
    key = jax.random.PRNGKey(0)
    p, o = m.params, m.opt_state
    p, o, l1 = chunk(p, o, 1e-3, key)
    p, o, l2 = chunk(p, o, 1e-3, jax.random.fold_in(key, 1))
    assert float(l2) < float(l1)


def test_bucketed_pipeline(rng):
    from larvanet_tpu.data.device_pipeline import BucketedDevicePipeline

    sizes = [(16, 20), (18, 16), (40, 48), (44, 40), (80, 96)]
    lr = [rng.integers(0, 256, (h, w, 3), np.uint8) for h, w in sizes]
    hr = [np.repeat(np.repeat(a, 4, 0), 4, 1) for a in lr]
    pipe = BucketedDevicePipeline.from_arrays(lr, hr, 4, num_buckets=3)
    assert len(pipe.pipelines) == 3
    # bucketing pads far less than one max-padded stack would
    single = 5 * 80 * 96 * 3 * (1 + 16)
    assert pipe.nbytes() < single
    bl, bh = jax.jit(lambda k: pipe.sample_batch(k, 8, 8))(jax.random.PRNGKey(0))
    bl, bh = np.asarray(bl), np.asarray(bh)
    assert bl.shape == (8, 8, 8, 3) and bh.shape == (8, 32, 32, 3)
    for b in range(8):
        found = False
        for k in range(4):
            for f in (0, 1):
                x = bl[b][:, ::-1] if f else bl[b]
                y = bh[b][:, ::-1] if f else bh[b]
                if np.array_equal(np.rot90(x, -k), np.rot90(y, -k)[::4, ::4]):
                    found = True
        assert found, b


def test_bucketed_train_chunk(rng):
    from larvanet_tpu.data.device_pipeline import BucketedDevicePipeline, make_device_train_fn

    lr = [rng.integers(0, 256, (h, w, 3), np.uint8) for h, w in [(16, 16), (32, 32)]]
    hr = [np.repeat(np.repeat(a, 4, 0), 4, 1) for a in lr]
    pipe = BucketedDevicePipeline.from_arrays(lr, hr, 4, num_buckets=2)
    m = get_model("edsr")
    m.parse_args(["--edsr_res_blocks", "1", "--edsr_conv_features", "8"])
    m.prepare(is_training=True, scales=[4])
    chunk = make_device_train_fn(m, pipe, batch_size=4, patch=8, steps_per_call=4)
    p, o, loss = chunk(m.params, m.opt_state, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
