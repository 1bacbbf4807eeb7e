"""DMA-gather frontier kernel (ops/pq_pallas.frontier_lookup_dma): the
parent-row gather runs INSIDE the kernel via scalar-prefetched ids + per-row
async copies, so the fused rows cross HBM once instead of three times
(XLA-gather write + kernel re-read). Interpret mode on CPU; the same code
compiles to Mosaic on TPU. Reference behavior covered: the gather+lookup of
BANG's traversal hot loop (BANG_Base/bang_search.cu:1201-1241).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bang_tpu.ops.pq_pallas import (
    frontier_decode_xla,
    frontier_lookup_dma,
    pack_frontier_rows,
    pack_tables,
)


@pytest.mark.parametrize("q,beam", [(16, 1), (16, 2), (23, 2)])
def test_frontier_dma_matches_xla_decode(q, beam):
    """ids bit-exact, dists within bf16 budget, vs the XLA decode path —
    including a non-multiple-of-tile Q (padding parents with row 0)."""
    rng = np.random.default_rng(5)
    n, r, m = 300_000, 64, 16  # n > 2^16 exercises id byte-plane 2
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    codes = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    rows = jnp.asarray(pack_frontier_rows(adj, codes))
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32) * 4.0)
    parents = jnp.asarray(rng.integers(0, n, size=(q, beam), dtype=np.int32))

    ids, dists = frontier_lookup_dma(
        pack_tables(tables), rows, parents, m=m, r=r, beam=beam,
        tile_q=8, interpret=True,
    )
    want_ids, want_d = frontier_decode_xla(
        tables, rows[parents], m=m, r=r, beam=beam
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    np.testing.assert_allclose(
        np.asarray(dists), np.asarray(want_d), rtol=2e-2, atol=2e-2 * m
    )


@pytest.mark.parametrize("q,beam", [(16, 1), (21, 2)])
def test_exact_frontier_dma_matches_xla(q, beam):
    """ids bit-exact and squared-L2 ~f32-exact vs the XLA decode + einsum."""
    import jax.numpy as jnp2

    from bang_tpu.ops.l2 import (
        decode_exact_frontier_rows,
        l2_distance_to_candidates,
        pack_exact_frontier_rows,
        squared_norms,
    )
    from bang_tpu.ops.pq_pallas import exact_frontier_dma

    rng = np.random.default_rng(7)
    n, r, d = 90_000, 64, 32
    vectors = jnp2.asarray(rng.integers(0, 256, size=(n, d), dtype=np.uint8))
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    norms = squared_norms(vectors)
    rows = pack_exact_frontier_rows(jnp2.asarray(adj), vectors, norms)
    queries = jnp2.asarray(rng.normal(size=(q, d)).astype(np.float32) * 80)
    parents = jnp2.asarray(rng.integers(0, n, size=(q, beam), dtype=np.int32))

    ids, dists = exact_frontier_dma(
        queries, rows, parents, r=r, d=d, beam=beam, tile_q=8, interpret=True
    )
    want_ids, want_norms, want_vecs = decode_exact_frontier_rows(
        rows[parents], r, d
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
    rows = jnp.asarray(pack_frontier_rows(adj, codes))
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32))
    parents = jnp.asarray(rng.integers(0, n, size=(q, 1), dtype=np.int32))
    ids, _ = frontier_lookup_dma(
        pack_tables(tables), rows, parents, m=m, r=r, beam=1,
        tile_q=8, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(ids), adj[np.asarray(parents)[:, 0]]
    )
