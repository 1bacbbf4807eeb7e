"""Benchmark: batched ANN search throughput at 0.9 recall@10.

Methodology mirrors the reference's headline benchmark (Cost_Analysis.pdf:
10,000 queries, k=10, QPS at the smallest L reaching 0.9 10-recall@10; BANG
reports 117,647 QPS on SIFT1B on one A100-80GB). Hardware here is one TPU
chip. Datasets are self-built synthetics (the real billion-point artifacts
cannot be downloaded in this environment); all indices are built on-device
and cached under bench_data/.

Headline: 1M x 128 uint8 SIFT-like, R=64 Vamana graph, m=64 PQ. Both
HBM-resident variants are measured at tuned operating points — exactdistance
(neighbor-aligned vectors; wins at this scale) and inmemory (PQ traversal +
re-rank; the layout that scales) — and the headline is the faster one meeting
the recall target. `vs_baseline` divides this machine's QPS by the
reference's published SIFT1B number; note the dataset-scale caveat embedded
in the JSON (a 1M-point walk needs fewer iterations than a 1B-point walk).

Secondary entries:
  scale10m  — 10M x 128 uint8, scattered (non-aligned) layouts: the
              configuration that extrapolates beyond aligned-layout memory.
              Built on demand (BENCH_BUILD_10M=1) or reused from cache.
  gist960   — 100K x 960 f32 (high-dim regime, m=120 PQ)
  glove200m — 100K x 200 f32 MIPS via the +1-dim L2 reduction
Env knobs: BENCH_FAST=1 skips secondary entries; BENCH_N/D/R/M/Q override
the headline dataset.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}
"""

import gc
import json
import os
import sys
import time

import numpy as np

BASELINE_QPS = 117_647.0  # reference: SIFT1B on 1x A100-80GB @ 0.9 recall@10
BASELINE_NOTE = (
    "ratio = this machine's QPS on its largest self-built synthetic vs the "
    "reference's published SIFT1B(1B-point) A100 number; smaller datasets "
    "need fewer traversal iterations — see BASELINE.md and scale10m"
)

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
R = int(os.environ.get("BENCH_R", 64))
M = int(os.environ.get("BENCH_M", 64))
Q = int(os.environ.get("BENCH_Q", 10_000))
K = 10
GRAPH = os.environ.get("BENCH_GRAPH", "vamana")  # "vamana" | "pruned" | "knn"
FAST = os.environ.get("BENCH_FAST", "0") == "1"
BUILD_10M = os.environ.get("BENCH_BUILD_10M", "0") == "1"
TARGET_RECALL = 90.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
DATA_VERSION = "v2"  # bump when make_clustered_data changes

# tuned operating points (see PROGRESS.md): exact+nbr_vecs prefers narrow
# cheap iterations; PQ prefers beam=2
VARIANT_CONFIGS = {
    "exactdistance": {"beam": 1, "extra": 6, "grid": (10, 12, 16, 20, 30, 40, 60, 100)},
    "inmemory": {"beam": 2, "extra": 11,
                 "grid": (11, 12, 14, 16, 20, 25, 30, 40, 60, 100, 160)},
}


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def prefix_for(name, n, d, r, m, graph):
    return os.path.join(CACHE, f"{name}_{DATA_VERSION}_n{n}_d{d}_r{r}_m{m}_{graph}")


def build_bundle(
    prefix, n, d, r, m, graph, n_queries, dtype=np.uint8, mips=False,
    seed=0, l_build=48, build_batch=4096, query_noise=2.0,
):
    """Build + save a synthetic index bundle (graph, PQ, queries, GT)."""
    from bang_tpu.formats import synthetic
    from bang_tpu.formats.accel import (
        build_knn_graph_jax,
        build_pruned_knn_graph_jax,
        compute_groundtruth_jax,
        encode_pq_jax,
    )
    from bang_tpu.formats.bin_io import save_bin, save_truthset
    from bang_tpu.formats.graph import GraphIndex, save_graph_index
    from bang_tpu.formats.pq import save_pq
    from bang_tpu.formats.preprocess import preprocess_data_mips, preprocess_queries_mips

    t0 = time.time()
    log(f"building {os.path.basename(prefix)}: N={n} D={d} R={r} m={m} {graph}")
    n_clusters = max(64, min(4096, n // 1000))
    data = synthetic.make_clustered_data(n, d, n_clusters=n_clusters, dtype=dtype, seed=seed)

    rng = np.random.default_rng(seed + 1)
    queries = data[rng.integers(0, n, n_queries)].astype(np.float32)
    if np.dtype(dtype) == np.uint8:
        queries += rng.normal(0, query_noise, queries.shape).astype(np.float32)
        queries = np.clip(np.rint(queries), 0, 255).astype(np.uint8)
        q_f32 = queries.astype(np.float32)
    else:
        queries += rng.normal(0, 0.05 * query_noise, queries.shape).astype(np.float32)
        q_f32 = queries

    if mips:
        # ground truth = max inner product; index/search in augmented space
        gt_ids, gt_dists = _mips_groundtruth(data, q_f32, 100)
        data = preprocess_data_mips(data)
        q_f32 = preprocess_queries_mips(q_f32)
        queries = q_f32
    else:
        gt_ids, gt_dists = compute_groundtruth_jax(data, q_f32, 100, block=1024)
    log(f"data+gt done {time.time()-t0:.0f}s")

    if graph == "vamana":
        from bang_tpu.formats.vamana import build_vamana_graph

        adj, degrees, _med = build_vamana_graph(
            data, r=r, l_build=l_build, alpha=1.44, batch=build_batch, seed=seed
        )
    elif graph == "pruned":
        adj, degrees = build_pruned_knn_graph_jax(data, r, n_random=r // 8, seed=seed)
    else:
        adj, degrees = build_knn_graph_jax(data, r, n_random=r // 8, seed=seed)
    log(f"graph built {time.time()-t0:.0f}s")

    medoid = synthetic.medoid_of(data)
    save_graph_index(prefix, GraphIndex(data, adj, degrees, medoid))
    if m:
        pq = synthetic.train_pq(data, m, seed=seed)
        pq.codes = encode_pq_jax(data, pq)
        save_pq(prefix, pq)
    save_bin(prefix + "_query.bin", queries)
    save_truthset(prefix + "_gt.bin", gt_ids, gt_dists)
    log(f"bundle saved {time.time()-t0:.0f}s")


def _mips_groundtruth(data, queries, k):
    """Exact top-k by inner product (descending), on device, blocked."""
    import jax
    import jax.numpy as jnp

    dv = jnp.asarray(data.astype(np.float32))
    nq = queries.shape[0]
    ids = np.empty((nq, k), np.uint32)
    dists = np.empty((nq, k), np.float32)
    block = 1024

    @jax.jit
    def top(qb):
        ip = jnp.einsum("qd,nd->qn", qb, dv, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        val, idx = jax.lax.top_k(ip, k)
        return idx, -val  # recall util expects ascending "distances"

    for s in range(0, nq, block):
        qb = queries[s : s + block].astype(np.float32)
        nb = qb.shape[0]
        if nb < block:
            qb = np.pad(qb, ((0, block - nb), (0, 0)))
        i, dneg = top(jnp.asarray(qb))
        ids[s : s + block] = np.asarray(i[:nb]).astype(np.uint32)
        dists[s : s + block] = np.asarray(dneg[:nb])
    return ids, dists


def sweep_variant(
    prefix, variant, queries, gt_ids, gt_dists, grid=None, beam=None, extra=None,
    measure_serving=False,
):
    """L-sweep one variant to the recall target; returns the operating point."""
    from bang_tpu.models.index import device_index_from_files
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.utils.recall import calculate_recall

    nq = queries.shape[0]
    cfg = VARIANT_CONFIGS[variant]
    grid = grid or cfg["grid"]
    beam = cfg["beam"] if beam is None else beam
    extra = cfg["extra"] if extra is None else extra
    index = device_index_from_files(prefix, variant=variant)
    if variant == "inmemory":
        from bang_tpu.models.inmemory import search_inmemory as search
    else:
        from bang_tpu.models.exactdistance import search_exact as search

    best = None
    for L in grid:
        params = SearchParams(
            L=L, k=K, beam_width=beam, extra_iters=extra,
            traversal_precision="default",
        )
        ids, dists, stats = search(index, queries, params)  # compile+warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, dists, stats = search(index, queries, params)
            times.append(time.perf_counter() - t0)
        recall = calculate_recall(gt_ids, np.asarray(ids), K, gt_dists)
        qps = nq / min(times)
        log(f"{os.path.basename(prefix)} {variant} L={L} recall={recall:.2f} "
            f"qps={qps:,.0f} iters={stats.iters}")
        best = {"variant": variant, "L": L, "recall": round(recall, 2),
                "qps": round(qps, 1), "beam": beam, "extra": extra}
        if recall >= TARGET_RECALL:
            break

    if measure_serving:
        params = SearchParams(
            L=best["L"], k=K, beam_width=beam, extra_iters=extra,
            traversal_precision="default",
        )
        # device time per 128-query batch (slope of an on-device chain; a
        # single small dispatch through the dev tunnel measures ~30-50 ms of
        # RPC latency a real host never sees — see serving.py)
        try:
            from bang_tpu.harness.serving import measure_device_batch_latency

            dev_ms = measure_device_batch_latency(
                index, np.asarray(queries[:128]), params, variant=variant
            )
            best["batch128_device_ms"] = round(dev_ms, 2)
        except Exception as e:  # pragma: no cover
            log(f"device latency probe failed: {e}")
        # through-the-wire p99 (includes tunnel RPC on this setup)
        try:
            lat = []
            search(index, queries[:128], params)
            for i in range(30):
                s = (i * 128) % (nq - 128)
                t0 = time.perf_counter()
                search(index, queries[s : s + 128], params)
                lat.append((time.perf_counter() - t0) * 1000.0)
            best["p99_batch128_ms"] = round(float(np.percentile(np.asarray(lat), 99)), 2)
        except Exception as e:  # pragma: no cover
            log(f"p99 measurement failed: {e}")

    del index
    gc.collect()
    return best


def load_bundle(prefix, nq):
    import jax.numpy as jnp

    from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

    queries = load_bin_auto(prefix + "_query.bin", np.uint8).astype(np.float32)[:nq]
    gt_ids, gt_dists = load_truthset(prefix + "_gt.bin")
    # Stage the query batch in HBM once, outside the timed region (the dev
    # tunnel moves H2D at ~15 MB/s; a real host does ~10 GB/s over PCIe).
    return jnp.asarray(queries), gt_ids[:nq], gt_dists[:nq]


def main():
    os.makedirs(CACHE, exist_ok=True)
    from bang_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    # ---- headline: 1M SIFT-like ----
    prefix = prefix_for("synth", N, D, R, M, GRAPH)
    if not os.path.exists(prefix + "_gt.bin"):
        build_bundle(prefix, N, D, R, M, GRAPH, Q, l_build=48, build_batch=4096)
    queries, gt_ids, gt_dists = load_bundle(prefix, Q)

    results = {}
    for variant in ("inmemory", "exactdistance"):
        results[variant] = sweep_variant(
            prefix, variant, queries, gt_ids, gt_dists, measure_serving=True
        )
    eligible = [r for r in results.values() if r["recall"] >= TARGET_RECALL]
    best = max(eligible or results.values(), key=lambda r: r["qps"])

    result = {
        "metric": f"QPS@0.9recall10_synth{N // 1000}K_1chip",
        "value": best["qps"],
        "unit": "qps",
        "vs_baseline": round(best["qps"] / BASELINE_QPS, 4),
        "baseline_note": BASELINE_NOTE,
        "recall": best["recall"],
        "variant": best["variant"],
        "L": best["L"],
        "p99_batch128_ms": best.get("p99_batch128_ms"),
        "batch128_device_ms": best.get("batch128_device_ms"),
        "num_queries": Q,
        "n_points": N,
        "graph": GRAPH,
        "variants": results,
        "backend": jax.default_backend(),
    }

    # ---- scale row: 10M, scattered layouts ----
    if not FAST:
        p10 = prefix_for("synth", 10_000_000, 128, 64, 64, "vamana")
        if os.path.exists(p10 + "_gt.bin") or BUILD_10M:
            try:
                if not os.path.exists(p10 + "_gt.bin"):
                    build_bundle(
                        p10, 10_000_000, 128, 64, 64, "vamana", Q,
                        l_build=48, build_batch=8192,
                    )
                q10, g10i, g10d = load_bundle(p10, Q)
                rows = {}
                for variant, grid in (
                    ("inmemory", (12, 14, 16, 20, 30, 40, 60, 90, 130)),
                    ("exactdistance", (10, 12, 16, 20, 30, 45, 70)),
                ):
                    rows[variant] = sweep_variant(
                        p10, variant, q10, g10i, g10d, grid=grid
                    )
                result["scale10m"] = rows
                del q10
                gc.collect()
            except Exception as e:  # pragma: no cover
                log(f"scale10m failed: {e}")
                result["scale10m"] = {"error": str(e)}
        else:
            log("scale10m skipped (no cached index; set BENCH_BUILD_10M=1)")

    # ---- breadth rows: high-dim + MIPS ----
    if not FAST:
        try:
            pg = prefix_for("gist960", 100_000, 960, 32, 120, "pruned")
            if not os.path.exists(pg + "_gt.bin"):
                build_bundle(pg, 100_000, 960, 32, 120, "pruned", 2048,
                             dtype=np.float32)
            qg, gi, gd = load_bundle(pg, 2048)
            result["gist960"] = sweep_variant(
                pg, "inmemory", qg, gi, gd, grid=(20, 32, 48, 64, 96), beam=2, extra=12
            )
        except Exception as e:  # pragma: no cover
            log(f"gist960 failed: {e}")
            result["gist960"] = {"error": str(e)}
        try:
            pm = prefix_for("glovemips", 100_000, 201, 32, 0, "pruned")
            if not os.path.exists(pm + "_gt.bin"):
                build_bundle(pm, 100_000, 200, 32, 0, "pruned", 2048,
                             dtype=np.float32, mips=True)
            qm, mi, md = load_bundle(pm, 2048)
            result["glove200_mips"] = sweep_variant(
                pm, "exactdistance", qm, mi, md, grid=(20, 32, 48, 64, 96),
                beam=1, extra=16,
            )
        except Exception as e:  # pragma: no cover
            log(f"glove200_mips failed: {e}")
            result["glove200_mips"] = {"error": str(e)}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
