"""Native C++ data-path tests (native/lvt_data.cpp via ctypes).

Builds the library on the fly if a toolchain is present; skips cleanly
otherwise (the framework falls back to the PIL/numpy path).
"""

import numpy as np
import pytest

from larvanet_tpu.data import io, native


@pytest.fixture(scope="module")
def lib():
    if not native.available() and not native.build():
        pytest.skip("native toolchain/libpng unavailable")
    return True


def test_decode_parity_with_pil(lib, tmp_path, rng):
    img = rng.integers(0, 256, (40, 52, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    io.save_image_hwc(img, p)
    np.testing.assert_array_equal(native.decode_png(p), img)


def test_decode_missing_file_raises(lib, tmp_path):
    with pytest.raises(IOError):
        native.decode_png(str(tmp_path / "missing.png"))


def test_batcher_alignment_and_determinism(lib, rng):
    lr = [rng.integers(0, 256, (32, 40, 3), np.uint8) for _ in range(3)]
    hr = [np.repeat(np.repeat(a, 4, 0), 4, 1) for a in lr]
    nb = native.NativeBatcher(lr, hr, scale=4, seed=42)
    bl, bh = nb.batch(8, 8)
    assert bl.shape == (8, 8, 8, 3) and bh.shape == (8, 32, 32, 3)
    assert bl.dtype == np.float32
    # every sample de-augments to an aligned LR/HR pair
    for b in range(8):
        found = False
        for k in range(4):
            for f in (0, 1):
                x = bl[b][:, ::-1] if f else bl[b]
                y = bh[b][:, ::-1] if f else bh[b]
                if np.array_equal(np.rot90(x, -k), np.rot90(y, -k)[::4, ::4]):
                    found = True
        assert found, b
    nb2 = native.NativeBatcher(lr, hr, scale=4, seed=42)
    b2 = nb2.batch(8, 8)
    np.testing.assert_array_equal(b2[0], bl)
    np.testing.assert_array_equal(b2[1], bh)


def test_batcher_rejects_undersized_images(lib, rng):
    lr = [rng.integers(0, 256, (8, 8, 3), np.uint8)]
    hr = [np.repeat(np.repeat(lr[0], 4, 0), 4, 1)]
    nb = native.NativeBatcher(lr, hr, scale=4, seed=0)
    with pytest.raises(RuntimeError):
        nb.batch(2, 16)  # patch larger than image


def test_dataset_uses_native_when_cached(lib, tmp_path, rng):
    from larvanet_tpu.data.dataset import PairDataset

    hr_dir, lr_dir = tmp_path / "HR", tmp_path / "LR"
    (lr_dir / "X4").mkdir(parents=True)
    hr_dir.mkdir()
    for i in range(2):
        hr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        io.save_image_hwc(hr, str(hr_dir / ("%04d.png" % i)))
        io.save_image_hwc(hr[::4, ::4], str(lr_dir / "X4" / ("%04dx4.png" % i)))
    ds = PairDataset(str(lr_dir), str(hr_dir), cached=True, seed=3, use_native=True)
    ds.prepare([4])
    ins, trs = ds.patch_batch_nhwc(4, 4, 8)
    assert ds._native_batchers  # the native path actually engaged
    assert ins.shape == (4, 8, 8, 3) and trs.shape == (4, 32, 32, 3)
