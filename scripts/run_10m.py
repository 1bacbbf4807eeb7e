"""10M-scale validation on the real chip: HBM variants + host-RAM base.

Runs after the 10M bundle is built (bench.build_bundle / BENCH_BUILD_10M=1):
  1. inmemory (PQ, scattered codes — the layout that scales) L-sweep
  2. exactdistance (scattered vectors) L-sweep
  3. base variant: graph memory-mapped from disk, PQ codes on device —
     the reference's billion-scale configuration (bang_search.cu:311-328) —
     with the stage breakdown proving gather/device overlap
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import bench
from bang_tpu.utils.recall import calculate_recall

P10 = bench.prefix_for("synth", 10_000_000, 128, 64, 64, "vamana")
Q = 10_000

queries, gt_ids, gt_dists = bench.load_bundle(P10, Q)

for variant, grid in (
    ("inmemory", (12, 14, 16, 20, 30, 40, 60, 90, 130)),
    ("exactdistance", (10, 12, 16, 20, 30, 45, 70)),
):
    row = bench.sweep_variant(P10, variant, queries, gt_ids, gt_dists, grid=grid)
    print(f"[10m] {row}", flush=True)

# ---- base variant over the mmap'd graph ----
from bang_tpu.api import BANGSearch
from bang_tpu.constants import ENABLE_GPU_STATS

engine = BANGSearch(variant="base")
engine.bang_load(P10, mmap=True, n_pipeline_batches=8)
q_np = np.asarray(queries)
for L in (30, 60):
    engine.bang_set_searchparams(
        10, L, beam_width=2, extra_iters=16, capabilities=ENABLE_GPU_STATS
    )
    engine.bang_alloc(Q)
    engine.bang_init()
    t0 = time.perf_counter()
    ids, dists = engine.bang_query(q_np)
    wall = time.perf_counter() - t0
    rec = calculate_recall(gt_ids, np.asarray(ids), 10, gt_dists)
    print(f"[10m] base L={L} recall={rec:.2f} qps={Q/wall:,.0f} wall={wall*1e3:.0f}ms", flush=True)
    print("[10m] base stage breakdown:\n" + engine._searcher.timers.report(), flush=True)
    engine.bang_free()
    if rec >= 90:
        break
