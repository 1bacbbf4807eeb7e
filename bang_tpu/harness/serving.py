"""Serving-mode query scheduler: stream arbitrary-size query batches through
one compiled search program.

The reference is a batch benchmark harness (10K queries in one shot); a
production deployment needs to accept query streams of arbitrary size. This
scheduler compiles the search once for a fixed batch shape and serves
requests by slicing/padding, amortizing compilation and keeping latency
predictable. Latency percentiles are tracked per request.
"""

from __future__ import annotations

import time

import numpy as np

from bang_tpu.api import BANGSearch
from bang_tpu.utils.config import SearchParams


class SearchServer:
    """Fixed-batch-shape search server over a BANGSearch engine."""

    def __init__(
        self,
        index_prefix: str,
        variant: str = "inmemory",
        batch_size: int = 1024,
        params: SearchParams | None = None,
    ):
        import dataclasses

        self.batch_size = batch_size
        self.params = params or SearchParams()
        self.engine = BANGSearch(variant=variant, dist_func=self.params.dist_func)
        self.engine.bang_load(index_prefix)
        extra = dataclasses.asdict(self.params)
        for consumed in ("L", "k", "dist_func"):
            extra.pop(consumed)
        self.engine.bang_set_searchparams(self.params.k, self.params.L, **extra)
        self.engine.bang_alloc(batch_size)
        self.latencies_ms: list[float] = []

    def query(self, queries: np.ndarray):
        """Search any number of queries; internally runs fixed-size batches.
        Returns (ids [Q, k] int64, dists [Q, k] f32)."""
        queries = np.asarray(queries)
        nq = queries.shape[0]
        k = self.params.k
        ids = np.empty((nq, k), np.int64)
        dists = np.empty((nq, k), np.float32)
        for s in range(0, nq, self.batch_size):
            t0 = time.perf_counter()
            chunk = queries[s : s + self.batch_size]
            i, d = self.engine.bang_query(chunk)
            self.latencies_ms.append((time.perf_counter() - t0) * 1000.0)
            ids[s : s + self.batch_size] = i
            dists[s : s + self.batch_size] = d
        return ids, dists

    def latency_percentiles(self, ps=(50, 90, 99)) -> dict:
        if not self.latencies_ms:
            return {f"p{p}": float("nan") for p in ps}
        arr = np.asarray(self.latencies_ms)
        return {f"p{p}": float(np.percentile(arr, p)) for p in ps}

    def close(self):
        self.engine.bang_free()
        self.engine.bang_unload()
