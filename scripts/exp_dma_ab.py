"""A/B: in-kernel-DMA frontier kernels vs the gathered-row Pallas path.

Verdict r04 item 2: `frontier_lookup_dma` / `exact_frontier_dma` landed with
interpret-mode tests only. This script (a) validates both bit-exact on the
REAL TPU — including R=32, the lane-slice width pack_frontier_rows documents
Mosaic miscompiling in the *gathered* kernel (the DMA kernel decodes from a
VMEM scratch ref, a different lowering path, so R=32 may work there) — and
(b) measures ms/iter for gathered vs DMA at the headline op points:

  PQ    1M  R=64 m=64 beam=2 Q=10K   (the r04 1M headline shape)
  PQ   10M  R=32 m=32 beam=2 Q=10K   (the tuned-10M shape, if R=32 decodes)
  exact 1M  R=64 D=128 beam=2 Q=10K  (exactdistance headline shape)

Timing tables are device-generated random bytes (no tunnel H2D); correctness
uses host-packed real layouts at N=100K (ids > 65536 exercise byte-plane 2).
Reference analog of the op under test: the gather+lookup hot loop,
BANG_Base/bang_search.cu:1201-1241.

Writes one JSON to stdout at the end; progress lines to stderr.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bang_tpu.ops.l2 import (
    decode_exact_frontier_rows,
    l2_distance_to_candidates,
    pack_exact_frontier_rows,
)
from bang_tpu.ops.pq_pallas import (
    exact_frontier_dma,
    frontier_lookup,
    frontier_lookup_dma,
    pack_frontier_rows,
    pack_tables,
    pq_lookup_packed,
)

ITERS = 20
RESULTS = {}


def log(msg):
    print(f"[dma_ab] {msg}", file=sys.stderr, flush=True)


def timed(fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts) / ITERS * 1000.0  # ms/iter


# ---------------------------------------------------------------------------
# Correctness: host-packed real layouts, N=100K (plane-2 coverage)
# ---------------------------------------------------------------------------

def check_pq(n, r, m, beam=2, nq=256):
    rng = np.random.default_rng(7)
    adj = rng.integers(0, n, (n, r), dtype=np.int32)
    codes = rng.integers(0, 256, (n, m), dtype=np.uint8)
    # pack_frontier_rows raises on r % 64 — build the same layout inline so
    # the R=32 probe can run
    idp = adj.view(np.uint8).reshape(n, r, 4).transpose(0, 2, 1).reshape(n, 4 * r)
    ccm = np.ascontiguousarray(codes[adj].transpose(0, 2, 1)).reshape(n, m * r)
    fused = jnp.asarray(np.concatenate([idp, ccm], axis=1))
    tables = jnp.asarray(rng.normal(size=(nq, m, 256)).astype(np.float32) ** 2)
    packed = jax.jit(pack_tables)(tables)
    parents_h = rng.integers(0, n, (nq, beam), dtype=np.int32)
    parents = jnp.asarray(parents_h)

    want_ids = adj[parents_h].reshape(nq, beam * r)
    want_d = jax.device_get(
        pq_lookup_packed(packed, jnp.asarray(codes[want_ids]))
    )

    out = {}
    try:
        ids, dists = jax.device_get(
            frontier_lookup_dma(packed, fused, parents, m, r, beam)
        )
        out["dma_ids_exact"] = bool((ids == want_ids).all())
        out["dma_dist_maxerr"] = float(np.max(np.abs(dists - want_d)))
    except Exception as e:
        out["dma_error"] = str(e).splitlines()[0][:200]
    if r % 64 == 0:
        ids, dists = jax.device_get(
            frontier_lookup(packed, fused[parents], m, r, beam)
        )
        out["gathered_ids_exact"] = bool((ids == want_ids).all())
        out["gathered_dist_maxerr"] = float(np.max(np.abs(dists - want_d)))
    else:
        # probe the documented Mosaic miscompile on the gathered kernel too
        try:
            ids, _ = jax.device_get(
                frontier_lookup(packed, fused[parents], m, r, beam)
            )
            out["gathered_ids_exact"] = bool((ids == want_ids).all())
        except Exception as e:
            out["gathered_error"] = str(e).splitlines()[0][:200]
    return out


def check_exact(n, r, d, beam=2, nq=256):
    rng = np.random.default_rng(8)
    adj = jnp.asarray(rng.integers(0, n, (n, r), dtype=np.int32))
    vecs = jnp.asarray(rng.integers(0, 256, (n, d), dtype=np.uint8))
    norms = (vecs.astype(jnp.float32) ** 2).sum(-1)
    fused = pack_exact_frontier_rows(adj, vecs, norms)
    queries = jnp.asarray(
        rng.integers(0, 256, (nq, d)).astype(np.float32)
    )
    parents_h = rng.integers(0, n, (nq, beam), dtype=np.int32)
    parents = jnp.asarray(parents_h)

    rows = fused[parents]
    w_ids, w_norms, w_vecs = decode_exact_frontier_rows(rows, r, d)
    want_d = jax.device_get(
        l2_distance_to_candidates(queries, w_vecs, w_norms)
    )
    want_ids = jax.device_get(w_ids)

    out = {}
    try:
        ids, dists = jax.device_get(
            exact_frontier_dma(queries, fused, parents, r, d, beam)
        )
        out["dma_ids_exact"] = bool((ids == want_ids).all())
        out["dma_dist_maxerr"] = float(np.max(np.abs(dists - want_d)))
        out["dma_dist_relerr"] = float(
            np.max(np.abs(dists - want_d) / np.maximum(want_d, 1.0))
        )
    except Exception as e:
        out["dma_error"] = str(e).splitlines()[0][:200]
    return out


# ---------------------------------------------------------------------------
# Timing: device-generated random tables (no tunnel H2D)
# ---------------------------------------------------------------------------

def time_pq(n, r, m, beam=2, q=10_000, tile_qs=(16, 32, 64)):
    row_w = 4 * r + m * r
    key = jax.random.PRNGKey(0)
    fused = jax.random.bits(key, (n, row_w), dtype=jnp.uint8)
    rngn = np.random.default_rng(1)
    tables = jnp.asarray(rngn.normal(size=(q, m, 256)).astype(np.float32) ** 2)
    packed = jax.jit(pack_tables)(tables)
    parents = jnp.asarray(rngn.integers(0, n - ITERS, (q, beam), dtype=np.int32))

    out = {}

    @jax.jit
    def pipe_gathered(parents, fused, packed):
        def step(i, acc):
            p = (parents + i) % n
            ids, dists = frontier_lookup(packed, fused[p], m, r, beam)
            return acc + dists.sum() + ids.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    if r % 64 == 0:
        out["gathered_ms"] = timed(pipe_gathered, parents, fused, packed)
        log(f"  gathered: {out['gathered_ms']:.3f} ms/iter")

    for tq in tile_qs:
        @functools.partial(jax.jit, static_argnames=("tq",))
        def pipe_dma(parents, fused, packed, tq):
            def step(i, acc):
                p = (parents + i) % n
                ids, dists = frontier_lookup_dma(
                    packed, fused, p, m, r, beam, tile_q=tq
                )
                return acc + dists.sum() + ids.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

        try:
            ms = timed(lambda a, b, c, tq=tq: pipe_dma(a, b, c, tq),
                       parents, fused, packed)
            out[f"dma_ms_tq{tq}"] = ms
            log(f"  dma tile_q={tq}: {ms:.3f} ms/iter")
        except Exception as e:
            out[f"dma_error_tq{tq}"] = str(e).splitlines()[0][:200]
            log(f"  dma tile_q={tq} FAILED: {e!s:.160}")
    # fundamental traffic: q*beam rows of row_w bytes, once
    best = min((v for k, v in out.items() if k.startswith("dma_ms")),
               default=None)
    if best:
        out["dma_hbm_gbps_best"] = q * beam * row_w / (best / 1e3) / 1e9
    fused.delete()
    return out


def time_exact(n, r, d, beam=2, q=10_000, tile_qs=(16, 32)):
    row_w = 8 * r + r * d
    key = jax.random.PRNGKey(2)
    fused = jax.random.bits(key, (n, row_w), dtype=jnp.uint8)
    rngn = np.random.default_rng(3)
    queries = jnp.asarray(rngn.integers(0, 256, (q, d)).astype(np.float32))
    parents = jnp.asarray(rngn.integers(0, n - ITERS, (q, beam), dtype=np.int32))

    out = {}

    @jax.jit
    def pipe_gathered(parents, fused, queries):
        def step(i, acc):
            p = (parents + i) % n
            rows = fused[p]
            ids, norms, vecs = decode_exact_frontier_rows(rows, r, d)
            dists = l2_distance_to_candidates(queries, vecs, norms)
            return acc + dists.sum() + ids.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    out["gathered_ms"] = timed(pipe_gathered, parents, fused, queries)
    log(f"  exact gathered: {out['gathered_ms']:.3f} ms/iter")

    for tq in tile_qs:
        @functools.partial(jax.jit, static_argnames=("tq",))
        def pipe_dma(parents, fused, queries, tq):
            def step(i, acc):
                p = (parents + i) % n
                ids, dists = exact_frontier_dma(
                    queries, fused, p, r, d, beam, tile_q=tq
                )
                return acc + dists.sum() + ids.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

        try:
            ms = timed(lambda a, b, c, tq=tq: pipe_dma(a, b, c, tq),
                       parents, fused, queries)
            out[f"dma_ms_tq{tq}"] = ms
            log(f"  exact dma tile_q={tq}: {ms:.3f} ms/iter")
        except Exception as e:
            out[f"dma_error_tq{tq}"] = str(e).splitlines()[0][:200]
            log(f"  exact dma tile_q={tq} FAILED: {e!s:.160}")
    best = min((v for k, v in out.items() if k.startswith("dma_ms")),
               default=None)
    if best:
        out["dma_hbm_gbps_best"] = q * beam * row_w / (best / 1e3) / 1e9
    fused.delete()
    return out


def main():
    sections = sys.argv[1:] or [
        "check64", "check32", "checkexact", "pq1m", "pq10m", "exact1m"
    ]
    t0 = time.time()
    if "check64" in sections:
        log("correctness PQ R=64 m=64 N=100K ...")
        RESULTS["check_pq_r64"] = check_pq(100_000, 64, 64)
        log(f"  {RESULTS['check_pq_r64']}")
    if "check32" in sections:
        log("correctness PQ R=32 m=32 N=100K (Mosaic lane-slice probe) ...")
        RESULTS["check_pq_r32"] = check_pq(100_000, 32, 32)
        log(f"  {RESULTS['check_pq_r32']}")
    if "checkexact" in sections:
        log("correctness exact R=64 D=128 N=100K ...")
        RESULTS["check_exact_r64"] = check_exact(100_000, 64, 128)
        log(f"  {RESULTS['check_exact_r64']}")
        log("correctness exact R=32 D=128 N=100K ...")
        RESULTS["check_exact_r32"] = check_exact(100_000, 32, 128)
        log(f"  {RESULTS['check_exact_r32']}")
    if "pq1m" in sections:
        log("timing PQ 1M R=64 m=64 ...")
        RESULTS["pq_1m_r64"] = time_pq(1_000_000, 64, 64)
    if "pq10m" in sections:
        ok32 = RESULTS.get("check_pq_r32", {}).get("dma_ids_exact")
        log(f"timing PQ 10M R=32 m=32 (r32 dma correct: {ok32}) ...")
        RESULTS["pq_10m_r32"] = time_pq(10_000_000, 32, 32)
    if "exact1m" in sections:
        log("timing exact 1M R=64 D=128 ...")
        RESULTS["exact_1m_r64"] = time_exact(1_000_000, 64, 128)
    RESULTS["wall_s"] = round(time.time() - t0, 1)
    RESULTS["iters"] = ITERS
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
