"""100M-point Base-variant demonstration on one chip (standalone runner).

Runs bench.sweep_base over the sharded-build 100M bundle and writes the row
to BASE100M_r03.json at the repo root — the same row bench.py's `base100m`
entry produces, available independently of the full bench's runtime.
"""

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
Q = 10_000

queries = load_bin_auto(PREFIX + "_query.bin", np.uint8).astype(np.float32)[:Q]
gt_ids, gt_dists = load_truthset(PREFIX + "_gt.bin")
row = bench.sweep_base(
    PREFIX, queries, gt_ids[:Q], gt_dists[:Q],
    grid=(45, 60, 90, 130, 180), beam=2, extra=16,
)
row["n_points"] = 100_000_000
row["num_queries"] = Q
print(json.dumps(row))
with open("/root/repo/BASE100M_r03.json", "w") as f:
    json.dump(row, f, indent=1)
