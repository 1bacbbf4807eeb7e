"""Quick quality check of the 2M R=64 warm-start calibration bundle:
Base-variant sweep (same engine the 100M row uses) vs the 2M R=32 bundle.
Informs the go/no-go + l_build choice for the 100M R=64 rebuild."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import bench
from bang_tpu.formats.bin_io import load_bin_auto, load_truthset

Q = 10_000
for tag in ("r64", "r32"):
    prefix = f"/root/repo/bench_data/synthg_v1_n2000000_d128_{tag}_m32_shardvamana"
    import os
    if not os.path.exists(prefix + "_disk.bin"):
        print(f"[2mcheck] {tag}: bundle missing, skipped", flush=True)
        continue
    queries = load_bin_auto(prefix + "_query.bin", np.uint8).astype(np.float32)[:Q]
    gt_ids, gt_dists = load_truthset(prefix + "_gt.bin")
    row = bench.sweep_base(
        prefix, queries, gt_ids[:Q], gt_dists[:Q],
        grid=(20, 30, 45, 60, 90), beam=2, extra=16, mmap=False,
    )
    print(f"[2mcheck] {tag}: {row}", flush=True)
