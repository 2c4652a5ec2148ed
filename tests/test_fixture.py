"""The frozen eval fixture: deterministic generation, pinned hashes.

The canonical manifest (tests/data/fixture_manifest.json) freezes the
standard fixture's pixel hashes; any generator or dependency drift that
would silently change the benchmark data fails here (VERDICT round 1
item 2 — reproducible eval fixture).
"""

import json
import os

import numpy as np
import pytest

from larvanet_tpu.data import fixture, io

FROZEN = os.path.join(os.path.dirname(__file__), "data", "fixture_manifest.json")


def test_generator_matches_frozen_manifest(tmp_path):
    manifest = fixture.generate(str(tmp_path))
    with open(FROZEN) as f:
        frozen = json.load(f)
    assert manifest == frozen, "fixture generator drifted from the frozen manifest"


def test_verify_detects_drift(tmp_path):
    fixture.generate(str(tmp_path), shapes=((8, 9, 0, 0),), scales=(4,))
    fixture.verify(str(tmp_path))  # clean tree passes
    victim = os.path.join(str(tmp_path), "x4", "input", "img000.png")
    img = io.load_image_u8(victim).copy()  # PIL may hand back read-only
    img[0, 0, 0] ^= 1
    io.save_image_hwc(img, victim)
    with pytest.raises(ValueError, match="drift"):
        fixture.verify(str(tmp_path))


def test_fixture_shapes_and_downsample(tmp_path):
    fixture.generate(str(tmp_path), shapes=((10, 11, 1, 2),), scales=(3,))
    hr = io.load_image_u8(os.path.join(str(tmp_path), "x3", "truth", "img000.png"))
    lr = io.load_image_u8(os.path.join(str(tmp_path), "x3", "input", "img000.png"))
    assert hr.shape == (31, 35, 3)  # 10*3+1, 11*3+2
    assert lr.shape == (10, 11, 3)
    # LR is the exact box average of the aligned HR crop
    crop = hr[:30, :33].reshape(10, 3, 11, 3, 3).astype(np.float64).mean(axis=(1, 3))
    np.testing.assert_array_equal(lr, np.clip(np.round(crop), 0, 255).astype(np.uint8))
