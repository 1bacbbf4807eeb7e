"""R=32 fused-frontier kernel (ops/pq_pallas._frontier_kernel_r32).

Mosaic miscompiles 32-wide u8 lane slices at offsets >= 64 (plane 2 of the
byte-plane id decode was dropped at R=32 — ids silently truncated to 16
bits), so the generic _frontier_kernel is gated to R % 64 == 0. The r32
variant decodes the IDENTICAL packed row layout through constant-index lane
rotations + iota masks instead of sub-128 slices; validated bit-exact on
real v5e at N=1.2M (scripts/exp_fused32.py, FUSED32_r05.json). These tests
run the same kernel in interpret mode with hand-packed rows whose ids cross
byte-planes 2 AND 3 (values up to 2^30), which no affordable CPU-sized
pack_frontier_rows input can reach.

Reference behavior covered: the gather+lookup of BANG's traversal hot loop
(BANG_Base/bang_search.cu:1201-1241) at the reference's own SIFT PQ shape
(m=32) and DiskANN default degree R=32 (parANN.h:161-171 config family).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bang_tpu.ops.pq_pallas import (
    frontier_decode_xla,
    frontier_lookup,
    pack_frontier_rows,
    pack_tables,
    pq_lookup_packed,
)

R = 32


def _hand_pack(ids, codes_rows, m):
    """Fused rows for arbitrary (possibly huge) neighbor ids.

    ids [P, R] i32, codes_rows [P, R, m] u8 -> [P, 4R + m*R] u8, the exact
    pack_frontier_rows layout (little-endian id byte-planes, chunk-major
    codes) without requiring a real N-node table to gather from.
    """
    p = ids.shape[0]
    planes = (
        np.ascontiguousarray(ids, dtype=np.int32)
        .view(np.uint8).reshape(p, R, 4).transpose(0, 2, 1).reshape(p, 4 * R)
    )
    cm = np.ascontiguousarray(codes_rows.transpose(0, 2, 1)).reshape(p, m * R)
    return np.concatenate([planes, cm], axis=1)


@pytest.mark.parametrize("q,beam,m", [(16, 1, 4), (16, 2, 32), (19, 4, 8)])
def test_r32_kernel_matches_packed_lookup(q, beam, m):
    """ids bit-exact (planes 2 and 3 exercised); dists match pq_lookup_packed
    on the same bf16-packed tables up to f32 summation order (the r32 kernel
    folds 4 chunk lane-groups after the masked sum, so the add tree differs).
    Q padding covered."""
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 1 << 30, size=(q, beam, R), dtype=np.int32)
    codes = rng.integers(0, 256, size=(q, beam, R, m), dtype=np.uint8)
    rows = np.stack(
        [_hand_pack(ids[:, b], codes[:, b], m) for b in range(beam)], axis=1
    )
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32) ** 2)
    packed = pack_tables(tables)

    got_ids, got_d = frontier_lookup(
        packed, jnp.asarray(rows), m=m, r=R, beam=beam, tile_q=8,
        interpret=True,
    )
    want_d = pq_lookup_packed(
        packed, jnp.asarray(codes.reshape(q, beam * R, m)), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_ids), ids.reshape(q, beam * R))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-6, atol=1e-5
    )


def test_r32_pack_roundtrip_matches_xla_decode():
    """pack_frontier_rows now accepts R=32; kernel agrees with the XLA
    decode on a real packed table (n > 2^16 exercises plane 2)."""
    rng = np.random.default_rng(3)
    n, m, q, beam = 70_000, 8, 16, 2
    adj = rng.integers(0, n, size=(n, R), dtype=np.int32)
    codes = rng.integers(0, 256, size=(n, m), dtype=np.uint8)
    rows = jnp.asarray(pack_frontier_rows(adj, codes))
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32) ** 2)
    parents = jnp.asarray(rng.integers(0, n, size=(q, beam), dtype=np.int32))

    got_ids, got_d = frontier_lookup(
        pack_tables(tables), rows[parents], m=m, r=R, beam=beam, tile_q=8,
        interpret=True,
    )
    want_ids, want_d = frontier_decode_xla(tables, rows[parents], m, R, beam)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=2e-2, atol=2e-2 * m
    )


def test_r32_kernel_guards():
    """m % 4 != 0 and beam*r > 128 are rejected (the lane-group trick packs
    4 chunks per 128-lane block and one beam per 32-lane output group)."""
    packed = jnp.zeros((8, 6, 128), jnp.int32)
    rows = jnp.zeros((8, 1, 4 * R + 6 * R), jnp.uint8)
    with pytest.raises(ValueError, match="m % 4"):
        frontier_lookup(packed, rows, m=6, r=R, beam=1, interpret=True)
    packed = jnp.zeros((8, 4, 128), jnp.int32)
    rows = jnp.zeros((8, 5, 4 * R + 4 * R), jnp.uint8)
    with pytest.raises(ValueError, match="beam"):
        frontier_lookup(packed, rows, m=4, r=R, beam=5, interpret=True)


def test_r32_index_selects_fused(tmp_path):
    """device_index_from_files prefers fused rows at R=32 (the tuned-10M
    layout) and the fused search matches the scattered-gather search."""
    from bang_tpu.formats.synthetic import build_synthetic_index
    from bang_tpu.models.index import device_index_from_files
    from bang_tpu.models.inmemory import search_inmemory
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.formats.bin_io import load_bin

    info = build_synthetic_index(
        str(tmp_path / "r32"), n=3000, dim=32, r=R, m=8, n_queries=32, seed=5
    )
    prefix = info["prefix"]
    idx = device_index_from_files(prefix)
    assert idx.fused_rows is not None, "R=32 should select fused rows now"
    idx_plain = device_index_from_files(prefix, neighbor_codes=False)
    assert idx_plain.fused_rows is None

    queries = load_bin(prefix + "_query.bin", np.float32)[:32]
    for beam in (1, 2, 4):
        params = SearchParams(L=32, k=10, beam_width=beam)
        ids_a, _, _ = search_inmemory(idx_plain, queries, params)
        ids_b, _, _ = search_inmemory(idx, queries, params)
        np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
