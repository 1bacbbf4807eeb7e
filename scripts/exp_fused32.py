"""Validate + time the R=32 fused-frontier kernel (_frontier_kernel_r32).

Verdict r05 context: the tuned-10M bundle (R=32/m=32) could not use fused
frontier rows because Mosaic miscompiles 32-wide lane slices at offset >= 64
(confirmed again in DMA_AB_r05.json: gathered_ids_exact=false at R=32). The
r32 kernel decodes the identical row layout through constant-index
dynamic_gather rotations + iota masks instead of sub-128 slices.

  correctness: host-packed real layout, N=1.2M (ids > 65536 exercise byte
               plane 2; > 2^20 rows also cross the i32 16-bit boundary many
               times), vs the XLA reference decode — bit-exact ids required.
  timing:      ms/iter at the tuned-10M op point (N=10M, R=32, m=32, beam=2,
               Q=10K) for (a) fused r32 kernel, (b) the nbr_codes two-gather
               path it would replace (gather nbr_codes row + pq_lookup_packed
               + separate adj_planes gather+decode).

Reference analog of the op: the gather+lookup hot loop,
BANG_Base/bang_search.cu:1201-1241.
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

from bang_tpu.ops.adjacency import pack_adj_planes_np
from bang_tpu.ops.pq_pallas import (
    frontier_lookup,
    pack_frontier_rows,
    pack_tables,
    pq_lookup_packed,
)

ITERS = 20
RESULTS = {}


def log(msg):
    print(f"[fused32] {msg}", file=sys.stderr, flush=True)


def timed(fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts) / ITERS * 1000.0  # ms/iter


def check(n=1_200_000, r=32, m=32, nq=512):
    rng = np.random.default_rng(7)
    adj = rng.integers(0, n, (n, r), dtype=np.int32)
    codes = rng.integers(0, 256, (n, m), dtype=np.uint8)
    fused = jnp.asarray(pack_frontier_rows(adj, codes))
    tables = jnp.asarray(rng.normal(size=(nq, m, 256)).astype(np.float32) ** 2)
    packed = jax.jit(pack_tables)(tables)
    out = {}
    for beam in (2, 4):
        parents_h = rng.integers(0, n, (nq, beam), dtype=np.int32)
        want_ids = adj[parents_h].reshape(nq, beam * r)
        want_d = jax.device_get(
            pq_lookup_packed(packed, jnp.asarray(codes[want_ids]))
        )
        ids, dists = jax.device_get(
            frontier_lookup(packed, fused[jnp.asarray(parents_h)], m, r, beam)
        )
        out[f"beam{beam}_ids_exact"] = bool((ids == want_ids).all())
        out[f"beam{beam}_dist_maxerr"] = float(np.max(np.abs(dists - want_d)))
    fused.delete()
    return out


def gen_u8(key, n, w, blocks=20):
    """[n, w] random u8 in row blocks: a single u8 random.bits request
    allocates 8x its size in u32 threefry counts (a (1M, 4352) u8 request
    OOMed at 32.4 GB), and bitcasting u32 -> u8 materializes a 4x-padded
    T(4,128) intermediate — per-block generation keeps the temp ~1/blocks."""
    assert n % blocks == 0
    keys = jax.random.split(key, blocks)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, k, s):
        blk = jax.random.bits(k, (n // blocks, w), dtype=jnp.uint8)
        return jax.lax.dynamic_update_slice(buf, blk, (s, 0))

    buf = jnp.zeros((n, w), jnp.uint8)
    for i in range(blocks):
        buf = fill(buf, keys[i], jnp.int32(i * (n // blocks)))
    return buf


def time_10m(n=10_000_000, r=32, m=32, beam=2, q=10_000):
    key = jax.random.PRNGKey(0)
    rngn = np.random.default_rng(1)
    tables = jnp.asarray(rngn.normal(size=(q, m, 256)).astype(np.float32) ** 2)
    packed = jax.jit(pack_tables)(tables)
    parents = jnp.asarray(rngn.integers(0, n - ITERS, (q, beam), dtype=np.int32))
    out = {}

    # (a) fused r32 rows: one gather + one kernel
    row_w = 4 * r + m * r
    fused = gen_u8(key, n, row_w)
    fused.block_until_ready()
    log("fused table materialized (11.5 GB)")

    for tq in (16, 32):
        @functools.partial(jax.jit, static_argnames=("tq",))
        def pipe_fused(parents, fused, packed, tq):
            def step(i, acc):
                p = (parents + i) % n
                ids, dists = frontier_lookup(packed, fused[p], m, r, beam,
                                             tile_q=tq)
                return acc + dists.sum() + ids.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

        try:
            ms = timed(lambda a, b, c, tq=tq: pipe_fused(a, b, c, tq),
                       parents, fused, packed)
            out[f"fused_ms_tq{tq}"] = ms
            log(f"  fused r32 tile_q={tq}: {ms:.3f} ms/iter")
        except Exception as e:
            out[f"fused_error_tq{tq}"] = str(e).splitlines()[0][:200]
            log(f"  fused tile_q={tq} FAILED: {e!s:.160}")
    fused.delete()

    # (b) the nbr_codes path: adj_planes gather+decode, nbr_codes gather,
    # pq_lookup_packed — what the tuned-10M bundle runs today
    nbr_codes = gen_u8(key, n, r * m)
    planes = gen_u8(jax.random.PRNGKey(3), n, 4 * r)
    nbr_codes.block_until_ready()
    log("nbr_codes + planes materialized (10.2 + 1.28 GB)")

    @jax.jit
    def pipe_nbr(parents, nbr_codes, planes, packed):
        def step(i, acc):
            p = (parents + i) % n
            pl_rows = planes[p].astype(jnp.int32)  # [q, beam, 4r]
            ids = (
                pl_rows[:, :, 0 * r : 1 * r]
                | (pl_rows[:, :, 1 * r : 2 * r] << 8)
                | (pl_rows[:, :, 2 * r : 3 * r] << 16)
                | (pl_rows[:, :, 3 * r : 4 * r] << 24)
            ).reshape(q, beam * r)
            rows = nbr_codes[p].reshape(q, beam * r, m)
            dists = pq_lookup_packed(packed, rows)
            return acc + dists.sum() + ids.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    out["nbr_codes_ms"] = timed(pipe_nbr, parents, nbr_codes, planes, packed)
    log(f"  nbr_codes path: {out['nbr_codes_ms']:.3f} ms/iter")

    best = min((v for k, v in out.items() if k.startswith("fused_ms")),
               default=None)
    if best:
        out["fused_hbm_gbps"] = q * beam * row_w / (best / 1e3) / 1e9 * 2
        out["speedup_vs_nbr_codes"] = out["nbr_codes_ms"] / best
    nbr_codes.delete()
    planes.delete()
    return out


def main():
    t0 = time.time()
    log("correctness N=1.2M R=32 m=32 (plane-2 coverage, REAL TPU) ...")
    RESULTS["check_r32_1m2"] = check()
    log(f"  {RESULTS['check_r32_1m2']}")
    ok = all(v for k, v in RESULTS["check_r32_1m2"].items() if "ids" in k)
    if ok:
        log("timing at the tuned-10M op point ...")
        RESULTS["tuned10m_op"] = time_10m()
    else:
        log("SKIPPING timing: ids not exact")
    RESULTS["wall_s"] = round(time.time() - t0, 1)
    RESULTS["iters"] = ITERS
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
