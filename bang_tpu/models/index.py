"""Device-resident index container (the TPU analog of GPUInstance + IndexLoad,
BANG_Base/bang_search.cuh:53-135).

All arrays live in HBM as one pytree; what is populated depends on the
variant:
  - exactdistance: vectors + vector_norms + adj (no PQ)
  - inmemory:      vectors (for re-rank) + adj + PQ codebook + codes
  - base:          PQ codebook + codes only (graph + vectors stay in host RAM)
"""

from __future__ import annotations

import functools
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
    nbr_codes: Optional[jnp.ndarray]  # [N, R*m] u8 — neighbors' codes, row-
    # aligned per parent, FLAT so no lane padding (gather-efficient
    # CAGRA-style layout; R x the code memory)
    adj_planes: Optional[jnp.ndarray]  # [N, 4R] u8 — byte-plane adjacency
    # (ops/adjacency), built with nbr_codes: an i32 minor dim of R<=64 is
    # lane-padded up to 128 on TPU (4x HBM at R=32), u8 4R is exactly one
    # lane tile; replaces `adj` (None) in neighbor_codes mode
    fused_rows: Optional[jnp.ndarray]  # [N, R*(4+m)] u8 — fused frontier rows
    # (id byte-planes + chunk-major neighbor codes): ONE gather per parent
    # yields both candidate ids and PQ distances (ops/pq_pallas.frontier_*)
    nbr_vecs: Optional[jnp.ndarray]  # [N, R, D] — neighbors' vectors (same
    # layout trick for the exactdistance variant; R x the vector memory)
    nbr_vec_norms: Optional[jnp.ndarray]  # [N, R] f32
    codebook: Optional[PQCodebook]
    medoid: int  # static
    n: int  # static
    dim: int  # static
    fused_vec_rows: Optional[jnp.ndarray] = None  # [N, 8R + R*D] u8 — fused
    # exact-frontier rows (id + norm byte-planes + u8 neighbor vectors): ONE
    # gather per parent replaces the adj + nbr_vecs + norms triple
    # (ops/l2.pack_exact_frontier_rows); u8 datasets only


def build_device_index(
    graph=None,
    pq=None,
    with_vectors: bool = True,
    with_adj: bool = True,
    medoid: int | None = None,
    neighbor_codes: bool = False,
    neighbor_vectors: bool = False,
    fused_frontier: bool = False,
    fused_exact_frontier: bool = False,
) -> DeviceIndex:
    """Assemble a DeviceIndex from host-side containers (GraphIndex, PQData).

    neighbor_codes=True materializes nbr_codes[N, R, m] (each node's
    neighbors' PQ codes, contiguous). Per-iteration candidate-code fetches
    then gather R*m-byte aligned rows instead of R scattered m-byte rows —
    measured ~5 ms/iter -> sub-ms at Q=10K, R=64, m=64 on v5e. Costs R x the
    code memory (4 GB at N=1M, m=64): use for <=10M-point indices.
    """
    adj = vectors = norms = codes = codebook = None
    nbr_codes = nbr_vecs = nbr_vec_norms = fused_rows = None
    n = dim = 0
    if graph is not None:
        n, dim = graph.n, graph.dim
        medoid = graph.medoid if medoid is None else medoid
        if with_adj and not neighbor_codes and not fused_frontier:
            # neighbor_codes / fused_frontier modes never keep the
            # lane-padded i32 table in HBM (byte-plane or fused rows replace
            # it) AND build from the host copy, so transferring it here would
            # add ~5.1 GB of peak build HBM at the tuned-10M point for
            # nothing — skip the upload entirely
            adj = jnp.asarray(graph.adj, dtype=jnp.int32)
        elif with_adj and fused_frontier and (
            neighbor_vectors or fused_exact_frontier
        ):  # pragma: no cover - exact-variant layouts still need the table
            adj = jnp.asarray(graph.adj, dtype=jnp.int32)
        if with_vectors:
            # vectors stay in their NATIVE dtype. A u8-bitview packing of f32
            # tables was tried (raw u8 row gathers are ~3x faster at equal
            # bytes) and reverted: the bitcast decode forces a (..., 4)-minor
            # relayout that costs 5x the gather win (see ops/l2 notes), and
            # scattered f32 gathers of >=512 B rows already run at the same
            # per-row cost as u8 (~8.3 ms / 640K rows on v5e).
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
    import jax

    adj_planes = None
    if neighbor_codes:
        assert codes is not None and (adj is not None or graph is not None)
        # stored FLAT [N, R*m]: a u8 minor dim of m=64 would be lane-padded
        # to 128 on TPU, doubling every gather's HBM traffic (measured
        # 6.9 -> 5.7 ms/iter for gather+lookup at Q=10K, beam=2, R=m=64).
        # Built in row BLOCKS: the naive codes[adj] materializes a [N, R, m]
        # u8 intermediate whose m-minor is lane-padded 128/m x — at the
        # tuned-10M point (R=m=32) that intermediate alone is 41 GB and the
        # load OOMs at compile time. Per-block transients stay ~256 MB and
        # the output is written in place (donated).
        # The same padding hits the resident [N, R] i32 adjacency (4x at
        # R=32, 5.1 GB at 10M), so neighbor_codes mode replaces it with
        # byte-plane rows (ops/adjacency): u8 [N, 4R], exactly lane-tile
        # wide, decoded on the VPU after each parent-row gather.
        from bang_tpu.ops.adjacency import pack_adj_planes

        adj_host = graph.adj if graph is not None else np.asarray(adj)
        n_rows, r = adj_host.shape
        m = codes.shape[1]
        blk = min(n_rows, max(4096, (256 * 1024**2) // max(1, r * 128)))

        @jax.jit
        def _build_block(c, a_blk):
            g = c[a_blk].reshape(a_blk.shape[0], -1)  # [B, R*m] u8
            return g, pack_adj_planes(a_blk)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _write_block(oc, op, g, pl, s):
            oc = jax.lax.dynamic_update_slice(oc, g, (s, 0))
            op = jax.lax.dynamic_update_slice(op, pl, (s, 0))
            return oc, op

        nbr_codes = jnp.zeros((n_rows, r * m), jnp.uint8)
        adj_planes = jnp.zeros((n_rows, 4 * r), jnp.uint8)
        starts = list(range(0, n_rows - blk + 1, blk))
        if n_rows % blk:
            # one compiled shape: the final block ENDS at n_rows and overlaps
            # the previous one — overlapped rows are rewritten with identical
            # values (both blocks gather the same source rows)
            starts.append(n_rows - blk)
        for s in starts:
            a_blk = jnp.asarray(np.asarray(adj_host[s : s + blk], np.int32))
            g, pl = _build_block(codes, a_blk)
            nbr_codes, adj_planes = _write_block(
                nbr_codes, adj_planes, g, pl, jnp.int32(s)
            )
        adj = None  # the padded i32 table is never HBM-resident in this mode
    if fused_frontier:
        assert graph is not None and pq is not None and pq.codes is not None
        adj_host = graph.adj
        n_rows, r = adj_host.shape
        dma_tiled = fused_frontier == "dma"
        if dma_tiled:
            # DMA-tiled layout [N, s, 128] (s % 8 == 0): the only row shape
            # this backend's in-kernel dynamic-row DMA accepts — enables
            # pq_impl='pallas_dma' (rows cross HBM once). r=64 envelope.
            if r != 64 or codes.shape[1] % 2:
                raise ValueError(
                    "fused_frontier='dma' requires R == 64 and m % 2 == 0 "
                    f"(got R={r}, m={codes.shape[1]}) — see "
                    "ops/pq_pallas.frontier_lookup_dma"
                )
        elif r % 64 and r != 32:
            raise ValueError(
                f"fused frontier rows require R % 64 == 0 or R == 32 (got "
                f"R={r}); use the nbr_codes layout instead — see the Mosaic "
                "slicing note in ops/pq_pallas.pack_frontier_rows"
            )
        # Built ON DEVICE in row blocks (same scheme as the nbr_codes build
        # above): the host-side pack_frontier_rows would materialize the
        # 11.5 GB table in RAM and push it through the slow H2D link, while
        # here only the [B, R] i32 adjacency blocks cross H2D and the row
        # assembly (byte-plane ids + chunk-major gathered codes) runs on the
        # VPU into a donated buffer. The naive codes[adj] intermediate would
        # be lane-padded 128/m x (41 GB at tuned-10M) — blocks keep it small.
        from bang_tpu.ops.adjacency import pack_adj_planes

        m = codes.shape[1]
        row_w = 4 * r + m * r
        if dma_tiled:
            from bang_tpu.ops.pq_pallas import _dma_sublanes

            sublanes = _dma_sublanes(row_w)
        blk = min(n_rows, max(4096, (256 * 1024**2) // max(1, r * 128)))

        @jax.jit
        def _build_fused(c, a_blk):
            planes = pack_adj_planes(a_blk)  # [B, 4R] u8, plane-major LE
            g = c[a_blk]  # [B, R, m] u8
            cm = jnp.swapaxes(g, 1, 2).reshape(a_blk.shape[0], m * r)
            flat = jnp.concatenate([planes, cm], axis=1)
            if dma_tiled:  # zero-pad to 8-aligned sublanes, tile to [B,s,128]
                b = a_blk.shape[0]
                pad = jnp.zeros((b, sublanes * 128 - row_w), jnp.uint8)
                return jnp.concatenate([flat, pad], 1).reshape(b, sublanes, 128)
            return flat

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _write_fused(buf, rows_blk, s):
            idx = (s, 0, 0) if dma_tiled else (s, 0)
            return jax.lax.dynamic_update_slice(buf, rows_blk, idx)

        shape = (n_rows, sublanes, 128) if dma_tiled else (n_rows, row_w)
        fused_rows = jnp.zeros(shape, jnp.uint8)
        starts = list(range(0, n_rows - blk + 1, blk))
        if n_rows % blk:
            starts.append(n_rows - blk)  # final block overlaps, same values
        for s in starts:
            a_blk = jnp.asarray(np.asarray(adj_host[s : s + blk], np.int32))
            fused_rows = _write_fused(
                fused_rows, _build_fused(codes, a_blk), jnp.int32(s)
            )
    if neighbor_vectors:
        assert adj is not None and vectors is not None
        nbr_vecs = jax.jit(lambda v, a: v[a])(vectors, adj)
        nbr_vec_norms = jax.jit(lambda nn, a: nn[a])(norms, adj)
    fused_vec_rows = None
    if fused_exact_frontier:
        assert adj is not None and vectors is not None
        from bang_tpu.ops.l2 import pack_exact_frontier_rows

        fused_vec_rows = pack_exact_frontier_rows(adj, vectors, norms)
    assert medoid is not None, "medoid required"
    return DeviceIndex(
        fused_vec_rows=fused_vec_rows,
        adj=adj,
        vectors=vectors,
        vector_norms=norms,
        codes=codes,
        nbr_codes=nbr_codes,
        adj_planes=adj_planes,
        fused_rows=fused_rows,
        nbr_vecs=nbr_vecs,
        nbr_vec_norms=nbr_vec_norms,
        codebook=codebook,
        medoid=int(medoid),
        n=int(n),
        dim=int(dim),
    )


def free_device_index(index) -> None:
    """Deterministically release an index's HBM buffers.

    `del index` alone only drops the Python reference — XLA keeps the device
    allocations alive until garbage collection runs AND no jit cache entry
    pins them. Benchmarks that load several multi-GB indices back to back
    must free explicitly or later allocations see a shrunken HBM pool.
    """
    import jax

    for leaf in jax.tree.leaves(index):
        if hasattr(leaf, "delete"):
            try:
                leaf.delete()
            except Exception:
                pass  # already deleted / donated


# Auto-budget (bytes) for the neighbor-aligned R x expansion layouts. Chosen
# to leave headroom on a 16 GB v5e chip next to the base arrays (which in
# neighbor_codes mode are lane-tight: u8 vectors + padded codes + byte-plane
# adjacency total ~3.9 GB at 10M/d128/m32).
NEIGHBOR_LAYOUT_BUDGET = 10_800_000_000
# The fused frontier layout REPLACES both nbr_codes and the adjacency planes
# (the i32 table is not HBM-resident in fused mode), so its budget is higher:
# at tuned-10M (R=32, m=32) fused rows are 11.52 GB and total residency is
# ~13.2 GB of 15.75 GB (vectors 1.28 + codes 0.32 + tables ~0.2), measured
# viable on v5e by FUSED32_r05.json's 11.5 GB working set.
FUSED_LAYOUT_BUDGET = 12_000_000_000


def device_index_from_files(
    prefix: str,
    variant: str = "inmemory",
    neighbor_codes: bool | None = None,
    neighbor_vectors: bool | None = None,
) -> DeviceIndex:
    """Load an index bundle from `<prefix>_*` files for the given variant.

    neighbor_codes (inmemory) / neighbor_vectors (exactdistance) control the
    gather-efficient neighbor-aligned layouts; None auto-enables each when its
    R x expansion stays under NEIGHBOR_LAYOUT_BUDGET.
    """
    if variant == "exactdistance":
        graph = load_graph_index(prefix)
        if neighbor_vectors is None:
            nv = graph.n * graph.r * graph.dim * graph.vectors.dtype.itemsize
            neighbor_vectors = nv <= NEIGHBOR_LAYOUT_BUDGET
        # NOTE: the fused exact-frontier row (build_device_index
        # fused_exact_frontier=True) is a MEASURED DEAD END on v5e: one
        # 8.7KB-u8-row gather alone costs 1.06 ms/iter and the byte decode
        # of the vector payload adds ~2 ms of relayout, vs 0.62 ms/iter for
        # the whole triple-gather + distance path it replaces (Q=10K, R=64,
        # D=128; /tmp/exp_fused_exact.py, round 3). Kept opt-in for
        # non-standard shapes; auto-selection stays on nbr_vecs.
        return build_device_index(
            graph=graph, pq=None, neighbor_vectors=bool(neighbor_vectors)
        )
    if variant == "inmemory":
        graph = load_graph_index(prefix)
        pq = load_pq(prefix)
        fused = False
        if neighbor_codes is None:
            # prefer the fused frontier rows (one gather/parent for ids +
            # codes) when the R x expansion fits and a slice-safe kernel
            # exists: R 64-aligned, or R=32 via _frontier_kernel_r32
            # (measured 1.34x over the nbr_codes two-gather path at the
            # tuned-10M op point, FUSED32_r05.json); otherwise fall back to
            # the flat nbr_codes layout
            fb = graph.n * graph.r * (4 + pq.num_chunks)
            r_ok = graph.r % 64 == 0 or (
                graph.r == 32 and pq.num_chunks % 4 == 0
            )
            fused = fb <= FUSED_LAYOUT_BUDGET and r_ok
            nc = graph.n * graph.r * pq.num_chunks
            neighbor_codes = (not fused) and nc <= NEIGHBOR_LAYOUT_BUDGET
        return build_device_index(
            graph=graph, pq=pq, neighbor_codes=bool(neighbor_codes),
            fused_frontier=fused,
        )
    raise ValueError(f"unknown variant for device index: {variant!r}")
