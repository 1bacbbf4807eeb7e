"""DMA-gather frontier kernels (ops/pq_pallas.frontier_lookup_dma /
exact_frontier_dma): the parent-row gather runs INSIDE the kernel via
scalar-prefetched ids + per-row async copies, so the fused rows cross HBM
once instead of three times (XLA-gather write + kernel re-read).

Rows must be DMA-TILED [N, s, 128] with s % 8 == 0
(pack_frontier_rows_tiled): this backend's dynamic-row DMA crashes for any
other sublane extent (round-5 bisect series — s=8/16 compile and run, s=1
flat rows and s=9/34/68 abort the compile helper). Interpret mode on CPU;
the same code compiles to Mosaic on TPU (scripts/exp_dma_tiled.py is the
hardware probe). Reference behavior covered: the gather+lookup of BANG's
traversal hot loop (BANG_Base/bang_search.cu:1201-1241).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bang_tpu.ops.pq_pallas import (
    _dma_sublanes,
    frontier_decode_xla,
    frontier_lookup_dma,
    pack_frontier_rows,
    pack_frontier_rows_tiled,
    pack_tables,
)


def test_dma_sublanes():
    assert _dma_sublanes(4352) == 40   # r=64, m=64: 34 raw -> 40
    assert _dma_sublanes(1280) == 16   # r=64, m=16: 10 raw -> 16
    assert _dma_sublanes(1024) == 8    # exactly 8 raw stays 8
    assert _dma_sublanes(8704) == 72   # exact r=64 d=128: 68 raw -> 72


@pytest.mark.parametrize("q,beam", [(16, 1), (16, 2), (23, 2)])
def test_frontier_dma_matches_xla_decode(q, beam):
    """ids bit-exact, dists within bf16 budget, vs the XLA decode path —
    including a non-multiple-of-tile Q (padding parents with row 0)."""
    rng = np.random.default_rng(5)
    n, r, m = 300_000, 64, 16  # n > 2^16 exercises id byte-plane 2
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    codes = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    rows_flat = jnp.asarray(pack_frontier_rows(adj, codes))
    rows = jnp.asarray(pack_frontier_rows_tiled(adj, codes))
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32) * 4.0)
    parents = jnp.asarray(rng.integers(0, n, size=(q, beam), dtype=np.int32))

    ids, dists = frontier_lookup_dma(
        pack_tables(tables), rows, parents, m=m, r=r, beam=beam,
        tile_q=8, interpret=True,
    )
    want_ids, want_d = frontier_decode_xla(
        tables, rows_flat[parents], m=m, r=r, beam=beam
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_allclose(
        np.asarray(dists), np.asarray(want_d), rtol=2e-2, atol=2e-2 * m
    )


@pytest.mark.parametrize("q,beam", [(16, 1), (21, 2)])
def test_exact_frontier_dma_matches_xla(q, beam):
    """ids bit-exact and squared-L2 ~f32-exact vs the XLA decode + einsum.
    d=128 (the SIFT dim): the tiled exact kernel requires whole-sublane
    vectors (d % 128 == 0)."""
    import jax.numpy as jnp2

    from bang_tpu.ops.l2 import (
        decode_exact_frontier_rows,
        l2_distance_to_candidates,
        pack_exact_frontier_rows,
        squared_norms,
    )
    from bang_tpu.ops.pq_pallas import (
        exact_frontier_dma,
        pack_exact_frontier_rows_tiled,
    )

    rng = np.random.default_rng(7)
    n, r, d = 90_000, 64, 128
    vectors = jnp2.asarray(rng.integers(0, 256, size=(n, d), dtype=np.uint8))
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    norms = squared_norms(vectors)
    rows_flat = pack_exact_frontier_rows(jnp2.asarray(adj), vectors, norms)
    rows = jnp2.asarray(
        pack_exact_frontier_rows_tiled(jnp2.asarray(adj), vectors, norms)
    )
    queries = jnp2.asarray(rng.normal(size=(q, d)).astype(np.float32) * 80)
    parents = jnp2.asarray(rng.integers(0, n, size=(q, beam), dtype=np.int32))

    ids, dists = exact_frontier_dma(
        queries, rows, parents, r=r, d=d, beam=beam, tile_q=8, interpret=True
    )
    want_ids, want_norms, want_vecs = decode_exact_frontier_rows(
        rows_flat[parents], r, d
    )
    want_d = l2_distance_to_candidates(queries, want_vecs, want_norms)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_allclose(
        np.asarray(dists), np.asarray(want_d), rtol=1e-5, atol=1e-2
    )


def test_frontier_dma_ids_match_adjacency():
    """Decoded candidate ids must be exactly the parents' adjacency rows."""
    rng = np.random.default_rng(6)
    n, r, m, q = 70_000, 64, 8, 8
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    codes = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    rows = jnp.asarray(pack_frontier_rows_tiled(adj, codes))
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32))
    parents = jnp.asarray(rng.integers(0, n, size=(q, 1), dtype=np.int32))
    ids, _ = frontier_lookup_dma(
        pack_tables(tables), rows, parents, m=m, r=r, beam=1,
        tile_q=8, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(ids), adj[np.asarray(parents)[:, 0]]
    )


def test_dma_tiled_index_end_to_end(tmp_path):
    """build_device_index(fused_frontier='dma') stores the tiled layout, no
    resident adjacency, and the gather-path search over the tiled table
    (pad sliced off post-gather) matches the plain scattered index — the
    same traversal a TPU would run with pq_impl='pallas_dma' minus the
    in-kernel DMA."""
    from bang_tpu.formats.bin_io import load_bin
    from bang_tpu.formats.synthetic import build_synthetic_index
    from bang_tpu.formats.graph import load_graph_index
    from bang_tpu.formats.pq import load_pq
    from bang_tpu.models.index import build_device_index, device_index_from_files
    from bang_tpu.models.inmemory import search_inmemory
    from bang_tpu.ops.pq_pallas import _dma_sublanes
    from bang_tpu.utils.config import SearchParams

    info = build_synthetic_index(
        str(tmp_path / "dx"), n=3000, dim=32, r=64, m=8, n_queries=32, seed=13
    )
    prefix = info["prefix"]
    graph, pq = load_graph_index(prefix), load_pq(prefix)
    idx_dma = build_device_index(graph=graph, pq=pq, fused_frontier="dma")
    s = _dma_sublanes(64 * (4 + 8))
    assert idx_dma.fused_rows.shape == (3000, s, 128)
    assert idx_dma.adj is None and idx_dma.adj_planes is None

    idx_plain = device_index_from_files(prefix, neighbor_codes=False)
    queries = load_bin(prefix + "_query.bin", np.float32)[:32]
    for beam in (1, 2):
        params = SearchParams(L=32, k=10, beam_width=beam)
        ids_a, _, _ = search_inmemory(idx_plain, queries, params)
        ids_b, _, _ = search_inmemory(idx_dma, queries, params)
        np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))

def test_frontier_dma_rejects_flat_rows():
    """Flat rows (the layout that crashes the backend's DMA) are rejected
    loudly, as are unsupported r."""
    rng = np.random.default_rng(8)
    n, r, m, q = 1000, 64, 8, 8
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    codes = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    flat = jnp.asarray(pack_frontier_rows(adj, codes))
    tables = pack_tables(jnp.zeros((q, m, 256), jnp.float32))
    parents = jnp.zeros((q, 1), jnp.int32)
    with pytest.raises(ValueError, match="DMA-tiled"):
        frontier_lookup_dma(tables, flat, parents, m=m, r=r, beam=1,
                            interpret=True)
    tiled = jnp.asarray(pack_frontier_rows_tiled(adj, codes))
    with pytest.raises(ValueError, match="r=64"):
        frontier_lookup_dma(tables, tiled, parents, m=m, r=32, beam=1,
                            interpret=True)
