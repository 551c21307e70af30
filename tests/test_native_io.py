"""Native JPEG batch decoder vs PIL (same libjpeg => identical pixels)."""

import os

import numpy as np
import pytest

from ocl_tpu.data.native_io import build_library, decode_jpeg_batch


def test_native_decode_matches_pil(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    if build_library() is None:
        pytest.skip("native toolchain unavailable")
    g = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = PIL.fromarray(g.randint(0, 255, (128, 128, 3), np.uint8))
        p = tmp_path / f"im{i}.jpg"
        img.save(p, quality=90)
        paths.append(str(p))
    got = decode_jpeg_batch(paths, 128, 128, n_threads=4)
    assert got is not None and got.shape == (6, 128, 128, 3)
    for i, p in enumerate(paths):
        want = np.array(PIL.open(p).convert("RGB"))
        np.testing.assert_array_equal(got[i], want)


def test_native_decode_geometry_mismatch_falls_back(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    if build_library() is None:
        pytest.skip("native toolchain unavailable")
    img = PIL.fromarray(np.zeros((64, 64, 3), np.uint8))
    p = tmp_path / "small.jpg"
    img.save(p)
    # wrong geometry -> None so callers take the PIL path
    assert decode_jpeg_batch([str(p)], 128, 128) is None


def test_native_decode_missing_file():
    if build_library() is None:
        pytest.skip("native toolchain unavailable")
    assert decode_jpeg_batch([os.path.join("/nonexistent", "x.jpg")], 128, 128) is None
