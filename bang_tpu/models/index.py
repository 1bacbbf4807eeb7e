"""Device-resident index container (the TPU analog of GPUInstance + IndexLoad,
BANG_Base/bang_search.cuh:53-135).

All arrays live in HBM as one pytree; what is populated depends on the
variant:
  - exactdistance: vectors + vector_norms + adj (no PQ)
  - inmemory:      vectors (for re-rank) + adj + PQ codebook + codes
  - base:          PQ codebook + codes only (graph + vectors stay in host RAM)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from bang_tpu.formats.graph import load_graph_index
from bang_tpu.formats.pq import load_pq
from bang_tpu.ops.pq import PQCodebook, prepare_pq_codebook


class DeviceIndex(NamedTuple):
    """HBM-resident search index (struct of arrays; static metadata on host)."""

    adj: Optional[jnp.ndarray]  # [N, R] int32, self-padded
    vectors: Optional[jnp.ndarray]  # [N, D] original dtype
    vector_norms: Optional[jnp.ndarray]  # [N] f32 squared norms
    codes: Optional[jnp.ndarray]  # [N, m] uint8 PQ codes
    codebook: Optional[PQCodebook]
    medoid: int  # static
    n: int  # static
    dim: int  # static


def build_device_index(
    graph=None,
    pq=None,
    with_vectors: bool = True,
    with_adj: bool = True,
    medoid: int | None = None,
) -> DeviceIndex:
    """Assemble a DeviceIndex from host-side containers (GraphIndex, PQData)."""
    adj = vectors = norms = codes = codebook = None
    n = dim = 0
    if graph is not None:
        n, dim = graph.n, graph.dim
        medoid = graph.medoid if medoid is None else medoid
        if with_adj:
            adj = jnp.asarray(graph.adj, dtype=jnp.int32)
        if with_vectors:
            vectors = jnp.asarray(graph.vectors)
            v64 = graph.vectors.astype(np.float64)
            norms = jnp.asarray((v64 * v64).sum(-1).astype(np.float32))
    if pq is not None:
        codebook = prepare_pq_codebook(pq.pivots, pq.centroid, pq.chunk_offsets)
        if pq.codes is not None:
            codes = jnp.asarray(pq.codes)
            if n == 0:
                n = pq.codes.shape[0]
        if dim == 0:
            dim = pq.dim
    assert medoid is not None, "medoid required"
    return DeviceIndex(
        adj=adj,
        vectors=vectors,
        vector_norms=norms,
        codes=codes,
        codebook=codebook,
        medoid=int(medoid),
        n=int(n),
        dim=int(dim),
    )


def device_index_from_files(
    prefix: str,
    variant: str = "inmemory",
) -> DeviceIndex:
    """Load an index bundle from `<prefix>_*` files for the given variant."""
    if variant == "exactdistance":
        graph = load_graph_index(prefix)
        return build_device_index(graph=graph, pq=None)
    if variant == "inmemory":
        graph = load_graph_index(prefix)
        pq = load_pq(prefix)
        return build_device_index(graph=graph, pq=pq)
    raise ValueError(f"unknown variant for device index: {variant!r}")
