"""Final 100M Base point: L=512 (reference MAX_L) with a deeper iteration
budget to cross the 0.9 recall target on the R=32 single-pass sharded graph.
Merges the prior curve rows into BASE100M_r03.json."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import bench
from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

PREFIX = "/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana"
OUT = "/root/repo/BASE100M_r03.json"
Q = 10_000

queries = load_bin_auto(PREFIX + "_query.bin", np.uint8).astype(np.float32)[:Q]
gt_ids, gt_dists = load_truthset(PREFIX + "_gt.bin")
row = bench.sweep_base(
    PREFIX, queries, gt_ids[:Q], gt_dists[:Q],
    grid=(512,), beam=2, extra=48, mmap=False,
)
row["n_points"] = 100_000_000
row["num_queries"] = Q
prior = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        prior = json.load(f)
curve = prior.get("curve", [])
for p in (prior.get("low_L_rows"), {k: prior.get(k) for k in
          ("L", "recall", "qps_wall", "projected_pcie_qps")} if prior else None):
    if p and p.get("L") and all(c["L"] != p["L"] for c in curve):
        curve.append(p)
row["curve"] = sorted(curve, key=lambda c: c["L"])
print(json.dumps(row))
with open(OUT, "w") as f:
    json.dump(row, f, indent=1)
