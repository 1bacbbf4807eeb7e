#!/bin/bash
# Round-5 session-3 chain (~90 min window, written 01:35 UTC 2026-08-20).
# State on entry: the second machine reset (23:51 UTC) wiped bench_data/
# again — every bundle AND the compile cache — and tonight the tunnel's
# remote-compile path is degraded/wedged (a 256x256 matmul compile took
# 280 s at 00:48; by 01:20 even 400 s probes hang; a 1M GT top_k compile
# made zero progress in 28 min). Historically these wedges clear on their
# own or on client restart (PROGRESS.md round-5 notes), so this chain
# leans on watchdog_run restarts and keeps each stage's budget tight.
# Priority order (highest value for the driver's end-of-round bench and
# the judge, cheapest first):
#   1. 1M headline bundle   — unblocks the driver's headline sweep, bloom,
#                             and the DMA probe's e2e stage
#   2. BLOOM_r05.json       — verdict r04 item 6a (short, needs 1M bundle)
#   3. DMA_TILED_r05.json   — verdict r04 item 2 (self-contained stages
#                             run even without the bundle)
#   4. breadth bundles      — saves the driver's bench budget
# Everything stops at DEADLINE so the driver's own bench gets a free tunnel.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/chain_r5e.pid
cd /root/repo
LOG=/tmp/chain_r5e.log
DEADLINE=${CHAIN_R5E_DEADLINE:-$(date -d "2026-08-20 02:20:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chainR5e] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }
commit_art() {
  if [ -s "$1" ]; then
    git add "$1" && git commit -q -m "$2" && say "committed $1" \
      || say "commit of $1 failed"
  else
    say "$1 missing/empty; not committed"
  fi
}
say "start"

# ---- 1. 1M headline bundle (watchdog restarts ride out tunnel wedges) ----
PB=bench_data/synth_v2_n1000000_d128_r64_m64_vamana
if [ ! -f "${PB}_gt.bin" ] && [ "$(left)" -gt 600 ]; then
  B=$(( $(left) - 480 )); [ "$B" -gt 3000 ] && B=3000
  say "1M bundle build (budget ${B}s)"
  python scripts/watchdog_run.py --log /tmp/prebuild_1m.log --stall 600 \
    --max-restarts 6 --budget "$B" -- \
    python -u -c '
import sys; sys.path.insert(0, "/root/repo")
import bench
bench.build_bundle(
    "bench_data/synth_v2_n1000000_d128_r64_m64_vamana",
    1_000_000, 128, 64, 64, "vamana", 10_000, l_build=48, build_batch=4096)
print("1M bundle built")
' || say "1M build failed/budget"
fi

# ---- 2. bloom visited-mode A/B at the 1M headline point ----
if [ -f "${PB}_gt.bin" ] && [ ! -s BLOOM_r05.json ] && [ "$(left)" -gt 500 ]; then
  say "bloom A/B"
  python scripts/watchdog_run.py --log /tmp/bloom_r05.log --stall 420 \
    --max-restarts 1 --budget $(( $(left) - 240 > 900 ? 900 : $(left) - 240 )) -- \
    python -u scripts/exp_bloom.py /root/repo/BLOOM_r05.json \
    || say "bloom A/B failed"
  commit_art BLOOM_r05.json \
    "Bloom visited-mode A/B at the 1M headline point (BLOOM_r05.json)"
fi

# ---- 3. DMA-tiled kernel probe ----
if [ ! -s DMA_TILED_r05.json ] && [ "$(left)" -gt 600 ]; then
  say "DMA tiled probe"
  python scripts/watchdog_run.py --log /tmp/dma_tiled.log --stall 600 \
    --max-restarts 2 --budget $(( $(left) - 180 > 1800 ? 1800 : $(left) - 180 )) -- \
    python -u scripts/exp_dma_tiled.py /root/repo/DMA_TILED_r05.json \
    || say "DMA probe failed"
  commit_art DMA_TILED_r05.json \
    "DMA-tiled frontier kernel TPU probe (DMA_TILED_r05.json)"
fi

# ---- 4. breadth bundles (only with real slack) ----
if [ "$(left)" -gt 1200 ] && [ ! -f bench_data/spacev_v2_n100000_d100_r32_m50_pruned_gt.bin ]; then
  say "breadth bundles prebuild"
  timeout $(( $(left) - 600 )) python - >>"$LOG" 2>&1 <<'PYEOF' || say "breadth prebuild incomplete"
import os, sys; sys.path.insert(0, "/root/repo")
import numpy as np
import bench
for args, kw in (
    ((bench.prefix_for("gist960", 100_000, 960, 32, 120, "pruned"),
      100_000, 960, 32, 120, "pruned", 2048), {"dtype": np.float32}),
    ((bench.prefix_for("glovemips", 100_000, 201, 32, 0, "pruned"),
      100_000, 200, 32, 0, "pruned", 2048), {"dtype": np.float32, "mips": True}),
    ((bench.prefix_for("spacev", 100_000, 100, 32, 50, "pruned"),
      100_000, 100, 32, 50, "pruned", 2048), {"dtype": np.int8}),
):
    if not os.path.exists(args[0] + "_gt.bin"):
        bench.build_bundle(*args, **kw)
        print("built", args[0])
PYEOF
fi

say "chain done"
rm -f /tmp/tpu_pids/chain_r5e.pid
