"""Benchmark: batched ANN search throughput at 0.9 recall@10.

Methodology mirrors the reference's headline benchmark (Cost_Analysis.pdf:
10,000 queries, k=10, QPS at the smallest L reaching 0.9 10-recall@10; BANG
reports 117,647 QPS on SIFT1B on one A100-80GB). Hardware here is one TPU
chip. The dataset is a self-built SIFT-like synthetic (1M x 128 uint8,
R=64 Vamana graph, m=64 PQ) because the real SIFT1B artifacts cannot be
downloaded in this environment; `vs_baseline` therefore compares single-chip
QPS against the reference's published single-GPU number on its (larger)
dataset — see BASELINE.md. The index is built once on-device and cached
under bench_data/.

Both HBM-resident variants are measured at their tuned operating points —
exactdistance (neighbor-aligned vectors; wins at this scale) and inmemory
(PQ traversal + re-rank; the layout that scales to >=100M) — and the
headline is the faster one that meets the recall target.

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

N = int(os.environ.get("BENCH_N", 1_000_000))
D = int(os.environ.get("BENCH_D", 128))
R = int(os.environ.get("BENCH_R", 64))
M = int(os.environ.get("BENCH_M", 64))
Q = int(os.environ.get("BENCH_Q", 10_000))
K = 10
GRAPH = os.environ.get("BENCH_GRAPH", "vamana")  # "vamana" | "pruned" | "knn"
TARGET_RECALL = 90.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
DATA_VERSION = "v2"  # bump when make_clustered_data changes
PREFIX = os.path.join(CACHE, f"synth_{DATA_VERSION}_n{N}_d{D}_r{R}_m{M}_{GRAPH}")

# tuned operating points (see PROGRESS.md): exact+nbr_vecs prefers narrow
# cheap iterations; PQ prefers beam=2
VARIANT_CONFIGS = {
    "exactdistance": {"beam": 1, "extra": 6, "grid": (10, 12, 16, 20, 30, 40, 60, 100)},
    "inmemory": {"beam": 2, "extra": 12, "grid": (12, 16, 20, 25, 30, 40, 60, 100, 160)},
}


def build_index():
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

    t0 = time.time()
    print(f"[bench] building synthetic index N={N} D={D} R={R} m={M}", file=sys.stderr)
    data = synthetic.make_clustered_data(N, D, n_clusters=1024, dtype=np.uint8, seed=0)
    if GRAPH == "vamana":
        from bang_tpu.formats.vamana import build_vamana_graph

        adj, degrees, _med = build_vamana_graph(
            data, r=R, l_build=48, alpha=1.44, batch=4096, seed=0
        )
    elif GRAPH == "pruned":
        adj, degrees = build_pruned_knn_graph_jax(
            data, R, n_random=R // 8, seed=0, block=1024
        )
    else:
        adj, degrees = build_knn_graph_jax(data, R, n_random=R // 8, seed=0, block=1024)
    print(f"[bench] graph built {time.time()-t0:.0f}s", file=sys.stderr)
    pq = synthetic.train_pq(data, M, seed=0)
    pq.codes = encode_pq_jax(data, pq)
    print(f"[bench] pq built {time.time()-t0:.0f}s", file=sys.stderr)
    rng = np.random.default_rng(1)
    queries = data[rng.integers(0, N, Q)].astype(np.float32)
    queries += rng.normal(0, 2.0, queries.shape).astype(np.float32)
    queries = np.clip(np.rint(queries), 0, 255).astype(np.uint8)
    gt_ids, gt_dists = compute_groundtruth_jax(
        data, queries.astype(np.float32), 100, block=1024
    )
    print(f"[bench] gt built {time.time()-t0:.0f}s", file=sys.stderr)

    medoid = synthetic.medoid_of(data)
    save_graph_index(PREFIX, GraphIndex(data, adj, degrees, medoid))
    save_pq(PREFIX, pq)
    save_bin(PREFIX + "_query.bin", queries)
    save_truthset(PREFIX + "_gt.bin", gt_ids, gt_dists)


def sweep_variant(variant, queries, gt_ids, gt_dists):
    """L-sweep one variant to the recall target; returns the operating point."""
    from bang_tpu.models.index import device_index_from_files
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.utils.recall import calculate_recall

    cfg = VARIANT_CONFIGS[variant]
    index = device_index_from_files(PREFIX, variant=variant)
    if variant == "inmemory":
        from bang_tpu.models.inmemory import search_inmemory as search
    else:
        from bang_tpu.models.exactdistance import search_exact as search

    best = None
    for L in cfg["grid"]:
        params = SearchParams(
            L=L, k=K, beam_width=cfg["beam"], extra_iters=cfg["extra"],
            traversal_precision="default",
        )
        ids, dists, stats = search(index, queries, params)  # compile+warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, dists, stats = search(index, queries, params)
            times.append(time.perf_counter() - t0)
        recall = calculate_recall(gt_ids, np.asarray(ids), K, gt_dists)
        qps = Q / min(times)
        print(
            f"[bench] {variant} L={L} recall={recall:.2f} qps={qps:,.0f} "
            f"iters={stats.iters}",
            file=sys.stderr,
        )
        best = {"variant": variant, "L": L, "recall": round(recall, 2),
                "qps": round(qps, 1), "beam": cfg["beam"], "extra": cfg["extra"]}
        if recall >= TARGET_RECALL:
            break

    # serving-style p99 latency at the operating point (128-query batches)
    try:
        serve = queries[:128]
        params = SearchParams(
            L=best["L"], k=K, beam_width=cfg["beam"], extra_iters=cfg["extra"],
            traversal_precision="default",
        )
        search(index, serve, params)
        lat = []
        for i in range(30):
            s = (i * 128) % (Q - 128)
            t0 = time.perf_counter()
            search(index, queries[s : s + 128], params)
            lat.append((time.perf_counter() - t0) * 1000.0)
        best["p99_batch128_ms"] = round(float(np.percentile(np.asarray(lat), 99)), 2)
    except Exception as e:  # pragma: no cover
        print(f"[bench] p99 measurement failed: {e}", file=sys.stderr)

    del index
    gc.collect()
    return best


def main():
    os.makedirs(CACHE, exist_ok=True)
    from bang_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    if not os.path.exists(PREFIX + "_gt.bin"):
        build_index()

    from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

    queries = load_bin_auto(PREFIX + "_query.bin", np.uint8).astype(np.float32)[:Q]
    gt_ids, gt_dists = load_truthset(PREFIX + "_gt.bin")
    gt_ids, gt_dists = gt_ids[:Q], gt_dists[:Q]
    # Stage the query batch in HBM once, outside the timed region. The axon
    # dev tunnel moves H2D at ~15 MB/s (vs ~10 GB/s PCIe on a real TPU host),
    # so including the 5 MB upload would measure the tunnel, not the search.
    queries = jnp.asarray(queries)

    results = {}
    for variant in ("inmemory", "exactdistance"):
        results[variant] = sweep_variant(variant, queries, gt_ids, gt_dists)

    eligible = [r for r in results.values() if r["recall"] >= TARGET_RECALL]
    best = max(eligible or results.values(), key=lambda r: r["qps"])

    result = {
        "metric": f"QPS@0.9recall10_synth{N // 1000}K_1chip",
        "value": best["qps"],
        "unit": "qps",
        "vs_baseline": round(best["qps"] / BASELINE_QPS, 4),
        "recall": best["recall"],
        "variant": best["variant"],
        "L": best["L"],
        "p99_batch128_ms": best.get("p99_batch128_ms"),
        "num_queries": Q,
        "n_points": N,
        "graph": GRAPH,
        "variants": results,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
