"""TexMex (fvecs/bvecs/ivecs) readers + DiskANN-bin conversion round trips."""

import numpy as np
import pytest

from bang_tpu.formats import texmex
from bang_tpu.formats.bin_io import load_bin, load_truthset


def _write_vecs(path, arr):
    dtype = arr.dtype
    with open(path, "wb") as f:
        for row in arr:
            np.asarray([arr.shape[1]], "<i4").tofile(f)
            row.astype(dtype).tofile(f)


@pytest.mark.parametrize("dtype,ext", [
    (np.float32, ".fvecs"), (np.uint8, ".bvecs"), (np.int32, ".ivecs"),
])
def test_read_vecs_roundtrip(tmp_path, dtype, ext):
    rng = np.random.default_rng(0)
    if dtype == np.float32:
        arr = rng.normal(size=(37, 12)).astype(dtype)
    else:
        arr = rng.integers(0, 100, (37, 12)).astype(dtype)
    p = str(tmp_path / f"x{ext}")
    _write_vecs(p, arr)
    np.testing.assert_array_equal(texmex.read_vecs(p), arr)
    np.testing.assert_array_equal(texmex.read_vecs(p, count=5, offset=30), arr[30:35])
    assert texmex.read_vecs(p, count=3, offset=100).shape == (0, 12)


def test_to_bin_streams(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (1000, 16)).astype(np.uint8)
    src = str(tmp_path / "base.bvecs")
    dst = str(tmp_path / "base.bin")
    _write_vecs(src, arr)
    n, dim = texmex.to_bin(src, dst, block=300)
    assert (n, dim) == (1000, 16)
    np.testing.assert_array_equal(load_bin(dst, np.uint8), arr)
    texmex.to_bin(src, dst, count=123)
    assert load_bin(dst, np.uint8).shape == (123, 16)


def test_groundtruth_conversion(tmp_path):
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 10_000, (50, 10)).astype(np.int32)
    dists = np.sort(rng.normal(size=(50, 10)).astype(np.float32) ** 2, axis=1)
    iv = str(tmp_path / "gt.ivecs")
    fv = str(tmp_path / "gt_dists.fvecs")
    out = str(tmp_path / "gt.bin")
    _write_vecs(iv, ids)
    _write_vecs(fv, dists)
    texmex.groundtruth_to_truthset(iv, out, fv)
    gi, gd = load_truthset(out)
    np.testing.assert_array_equal(gi, ids.astype(np.uint32))
    np.testing.assert_allclose(gd, dists)


def test_bad_extension(tmp_path):
    p = str(tmp_path / "x.vecs")
    open(p, "wb").write(b"\x04\x00\x00\x00")
    with pytest.raises(ValueError):
        texmex.read_vecs(p)
