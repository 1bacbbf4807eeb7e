"""Validate the HBM-budget-tuned 10M bundle (R=32 graph + m=32 PQ) on the
real chip and record the result as a standalone artifact.

The tuned bundle exists so the neighbor-aligned nbr_codes layout (one
[R*m]-byte row per parent, 10 GB at 10M) replaces the row-count-bound
scattered code gather (~15 ms/iter at Q=10K) — the same RAM-budget knob as
DiskANN's -B chunk selection (reference README.md:49). Target: >=60K QPS at
recall >=0.9 (VERDICT round-2 item 3).
"""

import json
import sys

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import bench

SRC = bench.prefix_for("synth", 10_000_000, 128, 64, 64, "vamana")
TUNED = bench.prefix_for("synth", 10_000_000, 128, 32, 32, "vamana")
Q = 10_000

# the tuned bundle reuses the source bundle's vectors, queries and GT
queries, gt_ids, gt_dists = bench.load_bundle(SRC, Q)

row = bench.sweep_variant(
    TUNED, "inmemory", queries, gt_ids, gt_dists,
    grid=(14, 16, 20, 25, 30, 40, 60, 90), refine=True,
    index_kwargs={"neighbor_codes": True},
)
print(f"[10mtuned] {row}", flush=True)
with open("/root/repo/SCALE10M_TUNED_r03.json", "w") as f:
    json.dump(row, f, indent=1)
print("[10mtuned] artifact written", flush=True)
