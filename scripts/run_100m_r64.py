"""Sweep the R=64 100M bundle (Base variant, host-RAM graph) and write
BASE100M_R64.json — the DiskANN-quality-degree rerun of BASE100M_r03.json.

The round-3 R=32 single-pass graph needed the MAX_L=512 ceiling to reach
recall 89.75; the reference's own billion-scale recipe is R=64 (README.md:49,
bang_search.cu:35 MAX_R=64), which should put the 0.9 frontier near L~100
with ~5x fewer device steps.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import bench
from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

PREFIX = "/root/repo/bench_data/synthg_v1_n100000000_d128_r64_m32_shardvamana"
OUT = "/root/repo/BASE100M_R64.json"
Q = 10_000

queries = load_bin_auto(PREFIX + "_query.bin", np.uint8).astype(np.float32)[:Q]
gt_ids, gt_dists = load_truthset(PREFIX + "_gt.bin")
row = bench.sweep_base(
    PREFIX, queries, gt_ids[:Q], gt_dists[:Q],
    grid=(40, 60, 100, 150, 220), beam=2, extra=24, mmap=False,
)
row["n_points"] = 100_000_000
row["num_queries"] = Q
row["graph"] = "sharded-vamana R=64 warm-started from the R=32 graph"
# probe the sampled-entry extension at the chosen operating point (saves
# host-loop steps: each one costs a host gather + RPC round trip)
try:
    row_s = bench.sweep_base(
        PREFIX, queries, gt_ids[:Q], gt_dists[:Q],
        grid=(row["L"],), beam=2, extra=24, mmap=False, entry_mode="sampled",
    )
    row["sampled_entry"] = {k: row_s.get(k) for k in
                            ("recall", "qps_wall", "n_device_steps",
                             "projected_pcie_qps", "device_step_ms")}
except Exception as e:
    row["sampled_entry"] = {"error": str(e)}
with open(OUT, "w") as f:
    json.dump(row, f, indent=1)
print("[100m-r64] " + json.dumps(row)[:400], flush=True)
