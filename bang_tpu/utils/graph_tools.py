"""Graph diagnostics and warmup: BFS reachability from the medoid.

The reference uses a CPU BFS from the medoid to pick ~1M nodes whose PQ codes
a warmup kernel touches to heat GPU caches (ENABLE_CACHE_WARMUP,
BANG_Exactdistance/parANN.cu:1772-1853). On TPU there is no program-visible
cache to warm — the analogs are (a) ahead-of-time compilation (done by
bang_alloc) and (b) paging HBM-resident arrays once. This module keeps the
BFS itself: it doubles as an index sanity check (reachable fraction from the
medoid bounds attainable recall).
"""

from __future__ import annotations

import collections

import numpy as np


def bfs_from(adj: np.ndarray, start: int, max_nodes: int | None = None) -> np.ndarray:
    """Breadth-first order of nodes reachable from `start` (≤ max_nodes)."""
    n = adj.shape[0]
    seen = np.zeros(n, dtype=bool)
    seen[start] = True
    order = [start]
    queue = collections.deque([start])
    limit = n if max_nodes is None else max_nodes
    while queue and len(order) < limit:
        u = queue.popleft()
        for v in adj[u]:
            v = int(v)
            if not seen[v]:
                seen[v] = True
                order.append(v)
                queue.append(v)
                if len(order) >= limit:
                    break
    return np.asarray(order, dtype=np.int32)


def reachable_fraction(adj: np.ndarray, medoid: int, sample_cap: int = 2_000_000) -> float:
    """Fraction of (up to sample_cap) nodes reachable from the medoid."""
    order = bfs_from(adj, medoid, max_nodes=sample_cap)
    return len(order) / min(adj.shape[0], sample_cap)


def warmup_touch(index, n_nodes: int = 1_000_000) -> int:
    """ENABLE_CACHE_WARMUP analog: BFS-discover nodes and touch their
    device-resident PQ codes / vectors once (pages HBM, warms the jit path).
    Returns the number of nodes touched."""
    import jax
    import jax.numpy as jnp

    adj_np = np.asarray(index.adj) if index.adj is not None else None
    if adj_np is None:
        return 0
    order = bfs_from(adj_np, index.medoid, max_nodes=n_nodes)
    ids = jnp.asarray(order)
    touched = 0
    for arr in (index.codes, index.vectors):
        if arr is not None:
            jax.block_until_ready(arr[ids].sum())
            touched = len(order)
    return touched
