"""Product-Quantization ops: distance-table construction and code lookup.

TPU-native re-design of the reference kernels:
  - `populate_pqDist_par` (BANG_Base/bang_search.cu:1083-1130): one 256-thread
    block per query computing, for each chunk c and center j,
    sum_{d in chunk c} (pivot[j,d] - (q[d] - centroid[d]))^2.
    Here this becomes one batched einsum on the MXU over all queries at once,
    using the norm expansion ||p||^2 - 2 p.q' + ||q'||^2 on zero-padded
    per-chunk layouts (padding contributes (0-0)^2 = 0).
  - `compute_neighborDist_par` PQ path (bang_search.cu:1201-1241): 8 threads
    per neighbor accumulating table[c, code[c]] with a warp reduction. Here:
    a flat per-query gather (take-along-axis over the fused (chunk, center)
    axis) summed over chunks; a Pallas variant lives in ops/pq_pallas.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PQCodebook(NamedTuple):
    """Device-ready padded-chunk codebook.

    piv_chunks: [m, 256, dmax] f32 — per-chunk pivot coords, zero-padded.
    piv_norms:  [m, 256] f32 — per-chunk squared pivot norms.
    dim_idx:    [m, dmax] i32 — source dim of each padded slot (clipped).
    dim_mask:   [m, dmax] f32 — 1 for real dims, 0 for padding.
    centroid:   [D] f32.
    """

    piv_chunks: jnp.ndarray
    piv_norms: jnp.ndarray
    dim_idx: jnp.ndarray
    dim_mask: jnp.ndarray
    centroid: jnp.ndarray

    @property
    def num_chunks(self) -> int:
        return self.piv_chunks.shape[0]


def prepare_pq_codebook(
    pivots: np.ndarray, centroid: np.ndarray, chunk_offsets: np.ndarray
) -> PQCodebook:
    """Convert the DiskANN codebook layout ([256, D] + offsets) to padded chunks."""
    offsets = np.asarray(chunk_offsets, dtype=np.int64)
    m = len(offsets) - 1
    sizes = offsets[1:] - offsets[:-1]
    dmax = int(sizes.max())
    dim_idx = np.minimum(
        offsets[:-1, None] + np.arange(dmax)[None, :], pivots.shape[1] - 1
    ).astype(np.int32)
    dim_mask = (np.arange(dmax)[None, :] < sizes[:, None]).astype(np.float32)
    piv_chunks = (
        pivots.T[dim_idx].transpose(0, 2, 1) * dim_mask[:, None, :]
    ).astype(np.float32)
    # pivots.T is [D, 256]; pivots.T[dim_idx] is [m, dmax, 256]
    piv_norms = (piv_chunks * piv_chunks).sum(-1).astype(np.float32)
    assert piv_chunks.shape == (m, 256, dmax)
    return PQCodebook(
        piv_chunks=jnp.asarray(piv_chunks),
        piv_norms=jnp.asarray(piv_norms),
        dim_idx=jnp.asarray(dim_idx),
        dim_mask=jnp.asarray(dim_mask),
        centroid=jnp.asarray(centroid, dtype=jnp.float32),
    )


def pq_distance_tables(codebook: PQCodebook, queries: jnp.ndarray) -> jnp.ndarray:
    """Per-query PQ distance tables: [Q, m, 256] f32.

    queries: [Q, D] float32 (already MIPS-transformed if applicable).
    """
    qc = (queries.astype(jnp.float32) - codebook.centroid)[:, codebook.dim_idx]
    qc = qc * codebook.dim_mask  # [Q, m, dmax], zero-padded
    # cross[q, c, j] = sum_t qc[q,c,t] * piv[c,j,t]  — MXU contraction.
    # Tables are built once per batch; full f32 precision costs nothing and
    # keeps PQ distances bit-comparable across backends.
    cross = jnp.einsum(
        "qct,cjt->qcj",
        qc,
        codebook.piv_chunks,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q_norms = (qc * qc).sum(-1)  # [Q, m]
    return codebook.piv_norms[None] - 2.0 * cross + q_norms[:, :, None]


def pq_lookup(tables: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Accumulate PQ distances: out[q, r] = sum_c tables[q, c, codes[q, r, c]].

    tables: [Q, m, 256] f32; codes: [Q, R, m] uint8/int32 (gathered per
    candidate). Returns [Q, R] f32.
    """
    q, m, nc = tables.shape
    flat = tables.reshape(q, m * nc)
    idx = codes.astype(jnp.int32) + (jnp.arange(m, dtype=jnp.int32) * nc)[None, None, :]
    vals = jnp.take_along_axis(flat[:, None, :], idx, axis=2)
    return vals.sum(-1)
