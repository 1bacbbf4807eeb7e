"""Pallas PQ lookup kernel vs the XLA reference path (interpret mode on CPU;
the same code compiles to Mosaic on TPU — see bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bang_tpu.ops.pq import pq_lookup
from bang_tpu.ops.pq_pallas import pack_tables, pq_lookup_packed


@pytest.mark.parametrize("q,r,m", [(64, 32, 32), (33, 24, 7), (8, 64, 16)])
def test_pq_lookup_packed_matches_xla(q, r, m):
    rng = np.random.default_rng(0)
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32) * 4.0)
    codes = jnp.asarray(rng.integers(0, 256, (q, r, m)).astype(np.uint8))
    want = np.asarray(pq_lookup(tables, codes))
    got = np.asarray(pq_lookup_packed(pack_tables(tables), codes, interpret=True))
    # bf16 table entries: ~0.4% relative error budget
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * m)


def test_pack_tables_layout():
    tables = jnp.asarray(np.arange(2 * 1 * 256, dtype=np.float32).reshape(2, 1, 256))
    packed = pack_tables(tables)
    assert packed.shape == (2, 1, 128) and packed.dtype == jnp.int32
    # lane j packs entries (2j, 2j+1) as (low, high) bf16 halves
    w = np.asarray(packed)[0, 0, 3].astype(np.int64) & 0xFFFFFFFF
    lo = np.uint32(w & 0xFFFF) << 16
    hi = np.uint32(w >> 16) << 16
    assert lo.view(np.float32) == np.float32(jnp.bfloat16(6.0))
    assert hi.view(np.float32) == np.float32(jnp.bfloat16(7.0))


def test_pq_lookup_packed_wide_candidates():
    """Candidate axis > 128 lanes (beam expansion) splits into slices."""
    rng = np.random.default_rng(1)
    q, r, m = 16, 256, 8
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 256, (q, r, m)).astype(np.uint8))
    want = np.asarray(pq_lookup(tables, codes))
    got = np.asarray(pq_lookup_packed(pack_tables(tables), codes, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * m)


def test_pq_lookup_packed_wide_m_tile_shrink():
    """m=120 (gist960's m) must auto-shrink tile_q: tile_q*m > 4096 at the
    default tile blows v5e's 16M scoped-vmem limit (observed Mosaic OOM)."""
    rng = np.random.default_rng(3)
    q, r, m = 96, 32, 120
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 256, (q, r, m)).astype(np.uint8))
    want = np.asarray(pq_lookup(tables, codes))
    got = np.asarray(pq_lookup_packed(pack_tables(tables), codes, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * m)


def test_pq_lookup_packed_nonmultiple_wide():
    rng = np.random.default_rng(2)
    q, r, m = 8, 192, 4
    tables = jnp.asarray(rng.normal(size=(q, m, 256)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 256, (q, r, m)).astype(np.uint8))
    want = np.asarray(pq_lookup(tables, codes))
    got = np.asarray(pq_lookup_packed(pack_tables(tables), codes, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * m)
