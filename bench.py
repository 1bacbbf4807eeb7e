"""Benchmark: batched ANN search throughput at 0.9 recall@10.

Methodology mirrors the reference's headline benchmark (Cost_Analysis.pdf:
10,000 queries, k=10, QPS at the smallest L reaching 0.9 10-recall@10; BANG
reports 117,647 QPS on SIFT1B on one A100-80GB). Hardware here is one TPU
chip. The dataset is a self-built SIFT-like synthetic (1M x 128 uint8,
R=64 graph, m=64 PQ) because the real SIFT1B artifacts cannot be downloaded
in this environment; `vs_baseline` therefore compares single-chip QPS against
the reference's published single-GPU number on its (larger) dataset — see
BASELINE.md. The index is built once on-device and cached under bench_data/.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}
"""

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
BEAM = int(os.environ.get("BENCH_BEAM", 2))
EXTRA = int(os.environ.get("BENCH_EXTRA", 12))  # expansion budget beyond L
TARGET_RECALL = 90.0
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_data")
DATA_VERSION = "v2"  # bump when make_clustered_data changes
PREFIX = os.path.join(CACHE, f"synth_{DATA_VERSION}_n{N}_d{D}_r{R}_m{M}_{GRAPH}")


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
    gt_ids, gt_dists = compute_groundtruth_jax(data, queries, 100, block=1024)
    print(f"[bench] gt built {time.time()-t0:.0f}s", file=sys.stderr)

    medoid = synthetic.medoid_of(data)
    save_graph_index(PREFIX, GraphIndex(data, adj, degrees, medoid))
    save_pq(PREFIX, pq)
    save_bin(PREFIX + "_query.bin", queries)
    save_truthset(PREFIX + "_gt.bin", gt_ids, gt_dists)


def main():
    os.makedirs(CACHE, exist_ok=True)
    from bang_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    if not os.path.exists(PREFIX + "_gt.bin"):
        build_index()

    from bang_tpu.formats.bin_io import load_bin_auto, load_truthset
    from bang_tpu.models.index import device_index_from_files
    from bang_tpu.models.inmemory import search_inmemory
    from bang_tpu.utils.config import SearchParams
    from bang_tpu.utils.recall import calculate_recall

    import jax.numpy as jnp

    index = device_index_from_files(PREFIX, variant="inmemory")
    queries = load_bin_auto(PREFIX + "_query.bin", np.uint8).astype(np.float32)[:Q]
    gt_ids, gt_dists = load_truthset(PREFIX + "_gt.bin")
    gt_ids, gt_dists = gt_ids[:Q], gt_dists[:Q]
    # Stage the query batch in HBM once, outside the timed region. The axon
    # dev tunnel moves H2D at ~15 MB/s (vs ~10 GB/s PCIe on a real TPU host),
    # so including the 5 MB upload would measure the tunnel, not the search.
    queries = jnp.asarray(queries)

    best = None
    for L in (12, 16, 20, 25, 30, 40, 50, 60, 80, 100, 130, 160, 200):
        params = SearchParams(L=L, k=K, beam_width=BEAM, extra_iters=EXTRA)
        ids, dists, stats = search_inmemory(index, queries, params)  # compile+warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, dists, stats = search_inmemory(index, queries, params)
            times.append(time.perf_counter() - t0)
        recall = calculate_recall(gt_ids, np.asarray(ids), K, gt_dists)
        qps = Q / min(times)
        print(
            f"[bench] L={L} recall={recall:.2f} qps={qps:,.0f} iters={stats.iters}",
            file=sys.stderr,
        )
        best = {"L": L, "recall": recall, "qps": qps}
        if recall >= TARGET_RECALL:
            break

    # serving-style p99 latency at the chosen operating point (128-query
    # batches; the BASELINE.json secondary metric)
    p99_ms = None
    try:
        serve_params = SearchParams(L=best["L"], k=K, beam_width=BEAM, extra_iters=EXTRA)
        serve_batch = 128
        warm = queries[:serve_batch]
        params = serve_params
        search_inmemory(index, warm, params)  # compile
        lat = []
        for i in range(30):
            s = (i * serve_batch) % (Q - serve_batch)
            t0 = time.perf_counter()
            search_inmemory(index, queries[s : s + serve_batch], params)
            lat.append((time.perf_counter() - t0) * 1000.0)
        p99_ms = float(np.percentile(np.asarray(lat), 99))
    except Exception as e:
        print(f"[bench] p99 measurement failed: {e}", file=sys.stderr)

    result = {
        "metric": f"QPS@0.9recall10_synth{N // 1000}K_1chip",
        "value": round(best["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(best["qps"] / BASELINE_QPS, 4),
        "recall": round(best["recall"], 2),
        "L": best["L"],
        "num_queries": Q,
        "n_points": N, "graph": GRAPH, "beam": BEAM, "extra_iters": EXTRA,
        "p99_batch128_ms": None if p99_ms is None else round(p99_ms, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
