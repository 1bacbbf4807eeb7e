"""Follow-up 100M Base sweep at high L (reference methodology: the L-sweep
runs to MAX_L=512, test_driver.cpp:376-418). The first-pass grid (<=180)
lands below the 0.9 recall target on the R=32 single-pass sharded graph;
this continues the sweep upward and merges the best row into
BASE100M_r03.json (keeping the low-L rows for the recall/QPS curve)."""

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
    grid=(260, 380, 512), beam=2, extra=24, mmap=False,
)
row["n_points"] = 100_000_000
row["num_queries"] = Q
prior = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        prior = json.load(f)
if prior:
    row["low_L_rows"] = {
        k: prior[k] for k in ("L", "recall", "qps_wall", "projected_pcie_qps")
        if k in prior
    }
print(json.dumps(row))
with open(OUT, "w") as f:
    json.dump(row, f, indent=1)
