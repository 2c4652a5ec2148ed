"""Exact-resume reproducibility: with `--data_seed`, an interrupted +
resumed run must produce BITWISE the same parameters as an uninterrupted
one. The reference cannot do this (its loaders consume the global numpy
RNG, so resume re-deals the deck); here sampling is stateless in
(data_seed, global_step) — host loaders via reseed_for_step
(data/loaders.py / dataset.py / the native batcher's seek) and the
device pipeline via fold_in(base_key, global_step) chunk keys."""

import os

import numpy as np
import pytest

from larvanet_tpu.data import io

TINY = ["--edsr_conv_features", "8", "--edsr_res_blocks", "1"]


@pytest.fixture
def tree(tmp_path):
    rng = np.random.default_rng(11)
    lr, hr = tmp_path / "LR", tmp_path / "HR"
    (lr / "X4").mkdir(parents=True)
    hr.mkdir()
    for i in range(2):
        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        io.save_image_hwc(img, str(hr / ("%04d.png" % i)))
        io.save_image_hwc(img[::4, ::4], str(lr / "X4" / ("%04dx4.png" % i)))
    return str(lr), str(hr), str(tmp_path)


def _train(lr, hr, run_dir, max_steps, extra=(), resume=False):
    from larvanet_tpu.cli import train

    args = [
        "--dataloader", "div2k_train_loader", "--model", "edsr",
        "--data_input_path", lr, "--data_truth_path", hr, "--data_cached",
        "--data_seed", "123", "--train_path", run_dir,
        "--batch_size", "2", "--input_patch_size", "8", "--scales", "4",
        "--max_steps", str(max_steps), "--save_freq", "2",
        "--learning_rate", "1e-3", *TINY, *extra,
    ]
    if resume:
        args += ["--restore_path", "latest"]
    train.main(args)


def _params_of(ckpt):
    from larvanet_tpu.core.registry import get_model

    m = get_model("edsr")
    m.parse_args(list(TINY))
    m.prepare(is_training=True, scales=[4])
    m.restore(ckpt)
    return [np.asarray(a) for a in
            __import__("jax").tree_util.tree_leaves(m.params)]


@pytest.mark.parametrize("extra", [(), ("--device_pipeline", "1")],
                         ids=["host_loop", "device_pipeline"])
def test_resume_is_bitwise_identical(tree, extra):
    lr, hr, root = tree
    run_a = os.path.join(root, "uninterrupted")
    run_b = os.path.join(root, "resumed")

    _train(lr, hr, run_a, max_steps=4, extra=extra)
    _train(lr, hr, run_b, max_steps=2, extra=extra)
    _train(lr, hr, run_b, max_steps=4, extra=extra, resume=True)

    pa = _params_of(os.path.join(run_a, "model_4.ckpt"))
    pb = _params_of(os.path.join(run_b, "model_4.ckpt"))
    for a, b in zip(pa, pb):
        np.testing.assert_array_equal(a, b)


def test_reseed_stream_is_stateless():
    """Two dataset instances reseeded to the same step draw identical
    patches regardless of their prior draw history."""
    from larvanet_tpu.data.dataset import PairDataset

    rng = np.random.default_rng(5)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "lr", "X4"))
        os.makedirs(os.path.join(d, "hr"))
        for i in (1, 2):
            img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            io.save_image_hwc(img, os.path.join(d, "hr", "%04d.png" % i))
            io.save_image_hwc(img[::4, ::4],
                              os.path.join(d, "lr", "X4", "%04dx4.png" % i))

        def mk():
            ds = PairDataset(input_path=os.path.join(d, "lr"),
                             truth_path=os.path.join(d, "hr"),
                             scheme="div2k", cached=True, seed=123,
                             use_native=False)
            ds.prepare([4])
            return ds

        d1, d2 = mk(), mk()
        for _ in range(3):  # advance d1's stream only
            d1.random_patch_pair_u8(4, 4)
        d1.reseed_for_step(7)
        d2.reseed_for_step(7)
        a1, b1 = d1.random_patch_pair_u8(4, 4)
        a2, b2 = d2.random_patch_pair_u8(4, 4)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)


def test_unseeded_reseed_is_noop():
    from larvanet_tpu.data.loaders import PairLoader

    loader = PairLoader()
    loader.parse_args([])  # data_seed defaults to None
    loader.reseed_for_step(3)  # must not touch the (absent) dataset
