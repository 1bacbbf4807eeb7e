"""Microbench: exact-dense vs bloom visited modes at large L on real TPU.

The dense mode's per-iteration cost grows with the compare width
C * (L + max_iters*beam); the bloom filter's cost is ~constant but pays a
scatter. This measures both at the reference's operating range (L up to 512)
to document the crossover and validate the default.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from bang_tpu.formats import synthetic
from bang_tpu.formats.graph import GraphIndex
from bang_tpu.models.exactdistance import search_exact
from bang_tpu.models.index import build_device_index
from bang_tpu.utils.config import SearchParams
from bang_tpu.utils.recall import calculate_recall

N, D, R, Q = 200_000, 64, 32, 2048

d = synthetic.make_clustered_data(N, D, n_clusters=256, seed=3)
from bang_tpu.formats.accel import build_pruned_knn_graph_jax, compute_groundtruth_jax

adj, degrees = build_pruned_knn_graph_jax(d, R, seed=3)
rng = np.random.default_rng(4)
q = d[rng.integers(0, N, Q)] + rng.normal(0, 0.05, (Q, D)).astype(np.float32)
gt_ids, gt_dists = compute_groundtruth_jax(d, q, 10)
index = build_device_index(graph=GraphIndex(d, adj, degrees, synthetic.medoid_of(d)))
qd = jax.numpy.asarray(q.astype(np.float32))

for L in (64, 128, 256, 512):
    for mode in ("exact", "bloom"):
        params = SearchParams(L=L, k=10, visited_mode=mode, extra_iters=50)
        ids, _, stats = search_exact(index, qd, params)  # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            ids, _, stats = search_exact(index, qd, params)
            ts.append(time.perf_counter() - t0)
        rec = calculate_recall(gt_ids, np.asarray(ids), 10, gt_dists)
        print(
            f"L={L:4d} mode={mode:6s} wall={min(ts)*1000:8.1f} ms "
            f"qps={Q/min(ts):9.0f} recall={rec:.2f} iters={stats.iters}",
            flush=True,
        )
