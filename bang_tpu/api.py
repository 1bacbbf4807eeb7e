"""Public search API: the `BANGSearch` facade.

Mirrors the reference's 7-method lifecycle (BANG_Base/bang.h:53-82):
    bang_load → bang_set_searchparams → bang_alloc → bang_init → bang_query
    → bang_free → bang_unload
with the reference's dtype dispatch (float32 / uint8 / int8, bang.h:85-87) and
L2 / MIPS distance functions (bang.h:26-30). On TPU, `bang_alloc`+`bang_init`
map to jit specialization + state initialization, which happen inside the
compiled search program; they are kept as explicit no-op-ish stages (alloc
triggers an ahead-of-time compile so that `bang_query` timing excludes
compilation, exactly like the reference excludes cudaMalloc from QPS).

Beyond the reference, the same facade also drives the Inmemory and
Exactdistance variants (which in the reference are separate binaries).
"""

from __future__ import annotations

import numpy as np

from bang_tpu.constants import ENUM_DIST_L2, ENUM_DIST_MIPS
from bang_tpu.formats.preprocess import preprocess_queries_mips
from bang_tpu.utils.config import SearchParams
from bang_tpu.utils.logging import log_message

# result ids are int64 on output for big-ann-benchmarks compatibility
# (reference: result_ann_t = unsigned long, bang.h:23).
RESULT_DTYPE = np.int64


class BANGSearch:
    """Facade over the three search variants.

    variant: "base" (host-RAM graph, billion-scale), "inmemory"
    (all-HBM graph + PQ + re-rank), or "exactdistance" (all-HBM, no PQ).
    """

    def __init__(self, variant: str = "base", dist_func: int = ENUM_DIST_L2):
        if variant not in ("base", "inmemory", "exactdistance"):
            raise ValueError(f"unknown variant {variant!r}")
        self.variant = variant
        self.dist_func = dist_func
        self._index = None
        self._searcher = None
        self._params: SearchParams | None = None
        self._compiled_for: tuple | None = None

    # -- lifecycle ----------------------------------------------------------

    def bang_load(
        self,
        index_prefix: str,
        mmap: bool | None = None,
        n_pipeline_batches: int | None = None,
    ) -> bool:
        """Load the index files for the configured variant.

        n_pipeline_batches (base variant only): query sub-batches kept in
        flight so host gathers overlap device steps (default 4)."""
        log_message(f"bang_load({index_prefix}) variant={self.variant}")
        if self.variant == "base":
            from bang_tpu.models.base import BaseVariantSearcher

            self._searcher = BaseVariantSearcher(
                index_prefix,
                mmap=True if mmap is None else mmap,
                n_pipeline_batches=4 if n_pipeline_batches is None else n_pipeline_batches,
            )
        else:
            from bang_tpu.models.index import device_index_from_files

            self._index = device_index_from_files(index_prefix, variant=self.variant)
        return True

    def bang_set_searchparams(
        self, recall_param: int, worklist_length: int, **kwargs
    ) -> None:
        """Set k (recall_param) and L (worklist length); extra kwargs feed
        SearchParams (visited_mode, rerank, ...). Reference:
        bang_search.cu:561-567."""
        self._params = SearchParams(
            L=worklist_length, k=recall_param, dist_func=self.dist_func, **kwargs
        )
        self._compiled_for = None

    def bang_alloc(self, num_queries: int) -> None:
        """Ahead-of-time compile the search program for this (Q, L, k) shape
        so bang_query measures steady-state throughput. Smaller batches are
        later padded up to this shape (one compiled program serves them all)."""
        assert self._params is not None, "call bang_set_searchparams first"
        from bang_tpu.constants import ENABLE_CACHE_WARMUP

        if self._params.capabilities & ENABLE_CACHE_WARMUP:
            # reference: BFS-discover nodes and touch their device arrays
            # (parANN.cu:437-455); on TPU this pages HBM + validates
            # reachability. For the base variant the BFS walks the host mmap.
            from bang_tpu.utils.graph_tools import warmup_touch

            touched = warmup_touch(
                self._index if self.variant != "base" else self._searcher
            )
            log_message(f"cache warmup touched {touched} nodes")
        dim = self._dim()
        warm = np.zeros((num_queries, dim), np.float32)
        self._run(warm)
        self._compiled_for = (num_queries,)

    def bang_init(self) -> None:
        """Per-batch state re-initialization happens inside the compiled
        program; nothing to do (kept for lifecycle parity)."""

    def bang_query(self, queries: np.ndarray):
        """Search. queries: [Q, D]; returns (ids [Q, k] int64, dists [Q, k] f32)."""
        assert self._params is not None, "call bang_set_searchparams first"
        queries = np.asarray(queries)
        if self.dist_func == ENUM_DIST_MIPS and queries.shape[1] == self._dim() - 1:
            queries = preprocess_queries_mips(queries)
        nq = queries.shape[0]
        if self._compiled_for is None:
            # no bang_alloc for this (params, shape): this call will pay the
            # compile inside its own wall time — loud, so a benchmark can't
            # silently fold compilation into QPS (the reference excludes
            # cudaMalloc the same way, test_driver.cpp:421-435)
            log_message(
                f"bang_query compiling for shape Q={nq} (no bang_alloc after "
                "the last bang_set_searchparams; timing includes compile)"
            )
        if self._compiled_for is not None:
            cap = self._compiled_for[0]
            if nq > cap:
                # split oversized batches into compiled-shape chunks instead
                # of silently recompiling for a bigger shape mid-serving
                outs = [
                    self.bang_query(queries[s : s + cap]) for s in range(0, nq, cap)
                ]
                return (
                    np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]),
                )
            if nq < cap:
                # pad to the compiled batch shape: no recompile for partial batches
                pad = cap - nq
                queries = np.concatenate(
                    [queries, np.zeros((pad, queries.shape[1]), queries.dtype)]
                )
        ids, dists = self._run(queries)
        return (
            np.asarray(ids)[:nq].astype(RESULT_DTYPE),
            np.asarray(dists)[:nq],
        )

    def bang_free(self) -> None:
        """Drop compiled-shape state. Device search buffers are transient
        (allocated inside each compiled search call); index arrays stay in
        HBM until bang_unload."""
        self._compiled_for = None

    def bang_unload(self) -> None:
        """Release the index: HBM buffers are deleted deterministically (see
        models.index.free_device_index), not left to garbage collection."""
        if self._index is not None:
            from bang_tpu.models.index import free_device_index

            free_device_index(self._index)
        if self._searcher is not None and getattr(self._searcher, "codes", None) is not None:
            self._searcher.codes.delete()
        self._index = None
        self._searcher = None
        self._compiled_for = None

    # -- internals ----------------------------------------------------------

    def _dim(self) -> int:
        if self.variant == "base":
            return self._searcher.meta.dim
        return self._index.dim

    def _run(self, queries: np.ndarray):
        if self.variant == "base":
            from bang_tpu.constants import ENABLE_GPU_STATS

            self._searcher.timers.enabled = bool(
                self._params.capabilities & ENABLE_GPU_STATS
            )
            self.last_stats = None
            return self._searcher.search(queries, self._params)
        if self.variant == "inmemory":
            from bang_tpu.models.inmemory import search_inmemory

            ids, dists, stats = search_inmemory(self._index, queries, self._params)
            self.last_stats = stats
            return ids, dists
        from bang_tpu.models.exactdistance import search_exact

        ids, dists, stats = search_exact(self._index, queries, self._params)
        self.last_stats = stats
        return ids, dists
