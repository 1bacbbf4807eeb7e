"""Exact squared-L2 distance ops (MXU path).

TPU-native re-design of the reference's exact-distance kernels
(`compute_neighborDist_par` exact variant, BANG_Exactdistance/parANN.cu:
1139-1179, and the re-rank `compute_L2Dist`, BANG_Base/bang_search.cu:
1254-1299): instead of 8-thread warp reductions per neighbor, distances are
computed for all (query, candidate) pairs at once via the norm expansion
||v||^2 - 2 q.v + ||q||^2, whose cross term is a batched matmul on the MXU.
Candidate squared norms are precomputed once per index load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squared_norms(vectors: jnp.ndarray, block: int | None = None) -> jnp.ndarray:
    """[N] f32 squared norms of the dataset (precomputed at load)."""
    v = vectors.astype(jnp.float32)
    return (v * v).sum(-1)


def decode_row_gather(raw: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Undo a u8 bit-view packing of an f32 vector table after a row gather.

    MEASURED DEAD END — kept as a guard + documentation. Raw u8 row gathers
    are ~3x faster than narrow f32 rows at equal bytes (7.4 vs 24.5 ms for
    640K 128-B rows on v5e), but this bitcast decode forces a (..., 4)-minor
    relayout that costs far more than the gather saves: gather+decode+L2
    measured 41.7 ms vs 8.3 ms for the plain f32 path (Q=10K, C=64, D=128).
    Wide f32 rows (>= 512 B) gather at the same per-row cost as u8, so the
    packing is never worthwhile; indices store vectors in native dtype and
    this function is a passthrough in practice.
    """
    if raw.dtype == jnp.uint8 and raw.shape[-1] == 4 * dim:
        return jax.lax.bitcast_convert_type(
            raw.reshape(*raw.shape[:-1], dim, 4), jnp.float32
        )
    return raw


def l2_distance_to_candidates(
    queries: jnp.ndarray,
    cand_vectors: jnp.ndarray,
    cand_norms: jnp.ndarray | None = None,
    precision=None,
) -> jnp.ndarray:
    """Squared L2 of each query to its own candidate rows.

    queries: [Q, D] f32; cand_vectors: [Q, C, D] (any dtype, cast to f32);
    cand_norms: [Q, C] f32 precomputed ||v||^2, or None to compute here.
    precision: lax.Precision for the cross term — HIGHEST by default (exact
    distances must rank correctly); traversal-only callers may relax it.
    Returns [Q, C] f32.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    q = queries.astype(jnp.float32)
    v = cand_vectors.astype(jnp.float32)
    if cand_norms is None:
        cand_norms = (v * v).sum(-1)
    cross = jnp.einsum(
        "qd,qcd->qc",
        q,
        v,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    q_norms = (q * q).sum(-1, keepdims=True)
    return jnp.maximum(cand_norms - 2.0 * cross + q_norms, 0.0)
