"""TPU probe for the DMA-tiled frontier kernels (verdict r04 item 2).

Round-5 findings this script exists to confirm on hardware:
  - this backend's dynamic single-row DMA requires the copied block's
    sublane extent to be a multiple of 8 (bisect series: s=8/16 ran
    bit-exact; s=1 flat rows and s=9/34/68 aborted the compile helper with
    an opaque HTTP 500), so the kernels now take [N, s, 128] tiled rows
    (pack_frontier_rows_tiled, s%8==0, +17.6% pad at r=64/m=64);
  - with the pad, the in-kernel DMA still moves ~2.5x fewer row bytes than
    the gather-then-decode path (which writes the gathered intermediate to
    HBM and reads it straight back).

Stages (JSON out to argv[1] or DMA_TILED_r05.json):
  1. sublane probe: bare dynamic DMA at s=40 and s=72 (the exact shapes the
     kernels use) — pass/fail + bit-exactness
  2. frontier_lookup_dma correctness at N=1.2M r=64 m=64 (byte-plane 2+
     coverage) vs the on-device gathered reference
  3. timing at the 1M headline op point (Q=10K, beam=2):
     gather+frontier_lookup (flat) vs frontier_lookup_dma (tiled)
  4. exact_frontier_dma correctness + timing (r=64, d=128)

Everything is generated on device (no multi-GB H2D through the tunnel).
Reference analog: the traversal hot loop, BANG_Base/bang_search.cu:1201-1241.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bang_tpu.ops.pq_pallas import (
    _dma_sublanes,
    exact_frontier_dma,
    frontier_lookup,
    frontier_lookup_dma,
    pack_tables,
)

ITERS = 20
RESULTS = {}


def log(msg):
    print(f"[dma_tiled] {msg}", file=sys.stderr, flush=True)


def timed(fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts) / ITERS * 1000.0  # ms/iter


# ---- stage 1: bare dynamic-DMA sublane probe at the kernel shapes ----
def sublane_probe(s, n=4096):
    rows = jax.random.bits(jax.random.PRNGKey(s), (n, s, 128), dtype=jnp.uint8)
    par = jnp.asarray([5, 9, 77, 1033], jnp.int32)

    def k(par_ref, rows_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            rows_hbm.at[par_ref[i]], scratch, sem
        )
        dma.start()
        dma.wait()
        out_ref[...] = scratch[...]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((s, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s, 128), jnp.uint8),
                        pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((4 * s, 128), jnp.uint8),
    )(par, rows)
    want = rows[par].reshape(4 * s, 128)
    return bool(jax.device_get((out == want).all()))


# ---- on-device packers (no multi-GB H2D) ----
# Chunked through a fori_loop: the single-shot version materialized the
# codes[adj] gather ([N,R,m] u8), its swapaxes copy, AND the concat output
# simultaneously (~16 GB at N=1.2M r=m=64 > 15.75 GB HBM) — the
# RESOURCE_EXHAUSTED in the first committed DMA_TILED_r05 artifact. The loop
# carry updates the output in place, so peak = output + one chunk's temps.
@functools.partial(jax.jit, static_argnames=("s", "nchunks"))
def pack_tiled_dev(adj, codes, s, nchunks=8):
    n, r = adj.shape
    m = codes.shape[1]
    assert n % nchunks == 0
    chunk = n // nchunks

    def body(i, out):
        a = jax.lax.dynamic_slice_in_dim(adj, i * chunk, chunk, 0)
        by = jax.lax.bitcast_convert_type(a, jnp.uint8)  # [chunk, R, 4] LE
        planes = jnp.swapaxes(by, 1, 2).reshape(chunk, 4 * r)
        cm = jnp.swapaxes(codes[a], 1, 2).reshape(chunk, m * r)
        flat = jnp.concatenate(
            [planes, cm,
             jnp.zeros((chunk, s * 128 - 4 * r - m * r), jnp.uint8)], axis=1
        )
        return jax.lax.dynamic_update_slice_in_dim(
            out, flat.reshape(chunk, s, 128), i * chunk, 0
        )

    return jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((n, s, 128), jnp.uint8)
    )


@functools.partial(jax.jit, static_argnames=("nchunks",))
def pack_flat_dev(adj, codes, nchunks=8):
    n, r = adj.shape
    m = codes.shape[1]
    assert n % nchunks == 0
    chunk = n // nchunks

    def body(i, out):
        a = jax.lax.dynamic_slice_in_dim(adj, i * chunk, chunk, 0)
        by = jax.lax.bitcast_convert_type(a, jnp.uint8)
        planes = jnp.swapaxes(by, 1, 2).reshape(chunk, 4 * r)
        cm = jnp.swapaxes(codes[a], 1, 2).reshape(chunk, m * r)
        return jax.lax.dynamic_update_slice_in_dim(
            out, jnp.concatenate([planes, cm], axis=1), i * chunk, 0
        )

    return jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((n, (4 + m) * r), jnp.uint8)
    )


def frontier_stage(n=1_200_000, r=64, m=64, q=10_000, beam=2):
    out = {}
    key = jax.random.PRNGKey(0)
    adj = jax.random.randint(key, (n, r), 0, n, jnp.int32)
    codes = jax.random.bits(jax.random.PRNGKey(1), (n, m), dtype=jnp.uint8)
    rngn = np.random.default_rng(2)
    tables = jnp.asarray(rngn.normal(size=(q, m, 256)).astype(np.float32) ** 2)
    packed = jax.jit(pack_tables)(tables)
    parents = jnp.asarray(rngn.integers(0, n - ITERS, (q, beam), np.int32))
    s = _dma_sublanes(4 * r + m * r)

    tiled = pack_tiled_dev(adj, codes, s)
    tiled.block_until_ready()
    log(f"tiled rows materialized ({n * s * 128 / 1e9:.1f} GB)")

    # correctness: ids bit-exact vs adjacency; dists vs the flat-row kernel
    ids, dists = frontier_lookup_dma(packed, tiled, parents, m, r, beam)
    want_ids = adj[parents].reshape(q, beam * r)
    out["ids_exact"] = bool(jax.device_get((ids == want_ids).all()))
    log(f"correctness: ids_exact={out['ids_exact']}")

    @jax.jit
    def pipe_dma(parents, tiled, packed):
        def step(i, acc):
            p = (parents + i) % n
            ids, d = frontier_lookup_dma(packed, tiled, p, m, r, beam)
            return acc + d.sum() + ids.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    out["dma_ms"] = timed(pipe_dma, parents, tiled, packed)
    log(f"  dma (tiled): {out['dma_ms']:.3f} ms/iter")
    tiled.delete()

    flat = pack_flat_dev(adj, codes)
    flat.block_until_ready()

    @jax.jit
    def pipe_gather(parents, flat, packed):
        def step(i, acc):
            p = (parents + i) % n
            rows = flat[p]
            ids, d = frontier_lookup(packed, rows, m, r, beam)
            return acc + d.sum() + ids.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    out["gather_ms"] = timed(pipe_gather, parents, flat, packed)
    log(f"  gather (flat): {out['gather_ms']:.3f} ms/iter")
    flat.delete()

    # dists agreement on one batch (recompute small tables both ways)
    out["speedup_dma_vs_gather"] = round(out["gather_ms"] / out["dma_ms"], 3)
    out["dma_hbm_gbps"] = round(
        q * beam * s * 128 / (out["dma_ms"] / 1e3) / 1e9, 1
    )
    return out


def exact_stage(n=800_000, r=64, d=128, q=10_000, beam=2):
    out = {}
    adj = jax.random.randint(jax.random.PRNGKey(3), (n, r), 0, n, jnp.int32)
    vecs = jax.random.bits(jax.random.PRNGKey(4), (n, d), dtype=jnp.uint8)
    rngn = np.random.default_rng(5)
    queries = jnp.asarray(rngn.normal(size=(q, d)).astype(np.float32) * 50)
    parents = jnp.asarray(rngn.integers(0, n - ITERS, (q, beam), np.int32))
    s = _dma_sublanes(8 * r + r * d)

    @functools.partial(jax.jit, static_argnames=("s", "nchunks"))
    def pack_exact_dev(adj, vecs, s, nchunks=8):
        nn, rr = adj.shape
        assert nn % nchunks == 0
        chunk = nn // nchunks
        v32 = vecs.astype(jnp.int32).astype(jnp.float32)
        norms = (v32 * v32).sum(-1)

        # chunked for the same HBM reason as pack_tiled_dev: the vecs[adj]
        # gather alone is [N,R,D] u8 = 6.6 GB at N=800K, and the single-shot
        # concat needs it plus the 7.4 GB output simultaneously
        def body(i, out):
            a = jax.lax.dynamic_slice_in_dim(adj, i * chunk, chunk, 0)
            by = jax.lax.bitcast_convert_type(a, jnp.uint8)
            planes = jnp.swapaxes(by, 1, 2).reshape(chunk, 4 * rr)
            nbby = jax.lax.bitcast_convert_type(
                norms[a].astype(jnp.float32), jnp.uint8
            )  # [chunk, R, 4]
            nplanes = jnp.swapaxes(nbby, 1, 2).reshape(chunk, 4 * rr)
            vrows = vecs[a].reshape(chunk, rr * d)
            pad = jnp.zeros((chunk, s * 128 - 8 * rr - rr * d), jnp.uint8)
            flat = jnp.concatenate([planes, nplanes, vrows, pad], 1)
            return jax.lax.dynamic_update_slice_in_dim(
                out, flat.reshape(chunk, s, 128), i * chunk, 0
            )

        return jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((nn, s, 128), jnp.uint8)
        )

    tiled = pack_exact_dev(adj, vecs, s)
    tiled.block_until_ready()
    log(f"exact tiled rows materialized ({n * s * 128 / 1e9:.1f} GB)")

    ids, dists = exact_frontier_dma(queries, tiled, parents, r, d, beam)
    want_ids = adj[parents].reshape(q, beam * r)
    out["ids_exact"] = bool(jax.device_get((ids == want_ids).all()))
    # spot-check distances against the direct einsum on device
    pv = vecs[want_ids[:64]].astype(jnp.float32)  # [64, beam*r, d]
    qd = queries[:64]
    want_d = (
        (pv * pv).sum(-1)
        - 2.0 * jnp.einsum("qd,qcd->qc", qd, pv)
        + (qd * qd).sum(-1, keepdims=True)
    )
    err = jax.device_get(
        jnp.max(jnp.abs(jnp.maximum(want_d, 0) - dists[:64]))
    )
    out["dist_maxerr_64q"] = float(err)
    log(f"exact correctness: ids_exact={out['ids_exact']} maxerr={err:.2e}")

    @jax.jit
    def pipe(parents, tiled, queries):
        def step(i, acc):
            p = (parents + i) % n
            ids, dd = exact_frontier_dma(queries, tiled, p, r, d, beam)
            return acc + dd.sum() + ids.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    out["dma_ms"] = timed(pipe, parents, tiled, queries)
    log(f"  exact dma: {out['dma_ms']:.3f} ms/iter")
    tiled.delete()
    return out


def e2e_stage(prefix="bench_data/synth_v2_n1000000_d128_r64_m64_vamana",
              L=11, beam=2, extra=11, nq=10_000):
    """End-to-end search A/B at the 1M headline op point: the flat fused
    index (gather + decode kernel) vs the DMA-tiled index (in-kernel DMA,
    selected by 'auto' for tiled tables). Decides whether the tiled layout
    should become the build default at r=64."""
    import bench
    from bang_tpu.formats.graph import load_graph_index
    from bang_tpu.formats.pq import load_pq
    from bang_tpu.models.index import (
        build_device_index, device_index_from_files, free_device_index,
    )
    from bang_tpu.models.inmemory import search_inmemory
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.utils.recall import calculate_recall

    out = {"L": L, "beam": beam, "extra": extra}
    queries, gt_ids, gt_dists = bench.load_bundle(prefix, nq)
    params = SearchParams(L=L, k=10, beam_width=beam, extra_iters=extra)
    graph, pq = load_graph_index(prefix), load_pq(prefix)
    for name in ("flat", "dma"):
        if name == "flat":
            index = device_index_from_files(prefix)  # auto: flat fused rows
        else:
            index = build_device_index(graph=graph, pq=pq,
                                       fused_frontier="dma")
        # stats.sync() (scalar device_get) is the completion barrier — on the
        # remote axon platform block_until_ready is a no-op (bench.py:684)
        ids, _d, stats = search_inmemory(index, queries, params)  # warm
        stats.sync()
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, _d, stats = search_inmemory(index, queries, params)
            stats.sync()
            reps.append(time.perf_counter() - t0)
        out[name] = {
            "recall": round(calculate_recall(gt_ids, np.asarray(ids), 10,
                                             gt_dists), 2),
            "qps": round(nq / min(reps), 1),
            "rep_s": [round(x, 4) for x in reps],
        }
        log(f"e2e {name}: {out[name]}")
        free_device_index(index)
    out["dma_speedup_e2e"] = round(out["dma"]["qps"] / out["flat"]["qps"], 3)
    return out


def main():
    t0 = time.time()
    for s in (40, 72):
        try:
            RESULTS[f"sublane_s{s}"] = sublane_probe(s)
        except Exception as e:  # noqa: BLE001 — record and continue
            RESULTS[f"sublane_s{s}"] = str(e).splitlines()[0][:200]
        log(f"sublane s={s}: {RESULTS[f'sublane_s{s}']}")
    if RESULTS.get("sublane_s40") is True:
        try:
            RESULTS["frontier_1m"] = frontier_stage()
        except Exception as e:  # noqa: BLE001
            RESULTS["frontier_1m"] = {"error": str(e).splitlines()[0][:300]}
    if RESULTS.get("sublane_s72") is True:
        try:
            RESULTS["exact_1m"] = exact_stage()
        except Exception as e:  # noqa: BLE001
            RESULTS["exact_1m"] = {"error": str(e).splitlines()[0][:300]}
    ok_kernel = isinstance(RESULTS.get("frontier_1m"), dict) and \
        RESULTS["frontier_1m"].get("ids_exact") is True
    if ok_kernel:
        try:
            RESULTS["e2e_1m"] = e2e_stage()
        except Exception as e:  # noqa: BLE001
            RESULTS["e2e_1m"] = {"error": str(e).splitlines()[0][:300]}
    RESULTS["wall_s"] = round(time.time() - t0, 1)
    RESULTS["iters"] = ITERS
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/DMA_TILED_r05.json"
    with open(dst, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
