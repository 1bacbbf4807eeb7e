#!/bin/bash
# Round-5 session-2 TPU chain (the 19:28 UTC machine reset wiped bench_data/
# — every bundle, checkpoint and the compile cache — while the 100M R=64
# build and the armed eval queue were in flight; see PROGRESS.md). This
# session's window (~6h) cannot refit the 100M graph stage (20 shards x
# ~19 min measured), so the largest deadline-fitting R=64 build (40M,
# 8 x 10M-member shards — the known-good sizing) runs first, then:
#   1. BASE40M_r05.json   — base-variant sweep to >=0.9 recall@10 at 40M
#                           (verdict r04 #1 at the scale this window fits)
#   2. DMA_TILED_r05.json — DMA-tiled frontier kernel probe (verdict #2;
#                           self-contained, generates data on device)
#   3. 1M headline bundle prebuild (~4 min) — so bloom can run tonight and
#                           the driver's end-of-round bench (its own 6000s
#                           budget rebuilds everything else) skips the build
#   4. BLOOM_r05.json     — bloom visited-mode A/B (needs the 1M bundle)
#   5. BENCH_r05_builder.json — full builder bench, LAST, only if time
#                           remains (pure insurance: the driver runs the
#                           same bench in its own window after disarm)
# Each artifact commits the moment it lands. disarm_at protects the
# driver's bench window.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/chain_r5d.pid
cd /root/repo
P=bench_data/synthg_v1_n40000000_d128_r64_m32_shardvamana
LOG=/tmp/chain_r5d.log
DEADLINE=${CHAIN_R5D_DEADLINE:-$(date -d "2026-08-20 01:15:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chainR5d] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }

say "start; waiting for 40M build (watchdog $(cat /tmp/b100_wd.pid 2>/dev/null))"
BUILD_OK=0
while true; do
  if grep -q "^DONE:" /tmp/b100.log 2>/dev/null && [ -f "${P}_disk.bin" ]; then
    BUILD_OK=1; break
  fi
  WD=$(cat /tmp/b100_wd.pid 2>/dev/null || echo 0)
  if [ "$WD" = 0 ] || ! kill -0 "$WD" 2>/dev/null; then
    say "build watchdog gone without DONE"; break
  fi
  if [ "$(left)" -lt 1500 ]; then
    say "deadline too close; stopping the build to free the tunnel"
    kill -- -"$(cat /tmp/b100_wd.pid 2>/dev/null)" 2>/dev/null
    kill "$WD" 2>/dev/null
    sleep 20
    break
  fi
  sleep 60
done
say "build wait over (ok=$BUILD_OK)"

commit_art() {  # commit_art <file> <msg>
  if [ -s "$1" ]; then
    git add "$1" && git commit -q -m "$2" && say "committed $1" \
      || say "commit of $1 failed"
  else
    say "$1 missing/empty; not committed"
  fi
}

# ---- 1. 40M base sweep (only if the bundle landed) ----
if [ "$BUILD_OK" = 1 ] && [ "$(left)" -gt 1200 ]; then
  B=$(( $(left) - 900 )); [ "$B" -gt 3600 ] && B=3600
  # R=64 DiskANN-quality degree: recall knee expected near L~100; the grid
  # is ascending and sweep_base stops at the first >=0.9 point, so longer
  # grids only cost time in the miss case where they are needed
  PROBE=""
  if [ "$(left)" -gt 4500 ]; then GRID="60 100 150 220"; PROBE="--probe-sampled-entry"
  elif [ "$(left)" -gt 3600 ]; then GRID="60 100 150 220"
  else GRID="100 150 220"; fi
  say "BASE40M eval (budget ${B}s, grid $GRID $PROBE)"
  python scripts/watchdog_run.py --log /tmp/base40m_r05.log --stall 900 \
    --max-restarts 1 --budget "$B" -- \
    python -u scripts/run_eval.py --prefix "$P" --variant base \
      --grid $GRID --beam 2 --extra 24 $PROBE \
      --note "r05 40M R=64 8-shard vamana (largest deadline-fitting R=64 build after the 19:28 UTC reset wiped the in-flight 100M); RAM-resident graph" \
      --out BASE40M_r05.json || say "BASE40M eval failed"
  commit_art BASE40M_r05.json \
    "40M R=64 base-variant evaluation (BASE40M_r05.json)"
  # recall-miss fallback: push the last grid point with the recall knobs
  # (wider beam, longer tail, sampled entries — bench.py's base tuned
  # protocol) and record it as a separate artifact
  RECALL=$(python -c "import json;print(json.load(open('BASE40M_r05.json')).get('recall',0))" 2>/dev/null || echo 0)
  if [ -s BASE40M_r05.json ] && [ "$(left)" -gt 1500 ] \
     && python -c "exit(0 if float('$RECALL') < 90.0 else 1)"; then
    say "recall $RECALL < 90: beam-4/sampled fallback"
    python scripts/watchdog_run.py --log /tmp/base40m_tuned.log --stall 900 \
      --max-restarts 1 --budget $(( $(left) - 900 > 2400 ? 2400 : $(left) - 900 )) -- \
      python -u scripts/run_eval.py --prefix "$P" --variant base \
        --grid 300 --beam 4 --extra 48 --entry-mode sampled \
        --note "r05 recall-push fallback (beam=4, extra=48, sampled entries)" \
        --out BASE40M_TUNED_r05.json || say "fallback eval failed"
    commit_art BASE40M_TUNED_r05.json \
      "40M R=64 recall-push fallback eval (BASE40M_TUNED_r05.json)"
  fi
fi

# ---- 2. 1M headline bundle prebuild (cheap; unblocks the DMA probe's
#         e2e stage, bloom, and the driver's headline build) ----
PB=bench_data/synth_v2_n1000000_d128_r64_m64_vamana
if [ "$(left)" -gt 900 ] && [ ! -f "${PB}_gt.bin" ]; then
  say "1M bundle prebuild"
  timeout 900 python - >>"$LOG" 2>&1 <<'PYEOF' || say "1M prebuild failed"
import sys; sys.path.insert(0, "/root/repo")
import bench
bench.build_bundle(
    "bench_data/synth_v2_n1000000_d128_r64_m64_vamana",
    1_000_000, 128, 64, 64, "vamana", 10_000, l_build=48, build_batch=4096)
print("1M bundle built")
PYEOF
fi

# ---- 3. DMA-tiled kernel probe (device-generated data + 1M e2e A/B) ----
if [ "$(left)" -gt 1400 ]; then
  say "DMA tiled probe"
  python scripts/watchdog_run.py --log /tmp/dma_tiled.log --stall 600 \
    --max-restarts 1 --budget $(( $(left) - 240 > 1800 ? 1800 : $(left) - 240 )) -- \
    python -u scripts/exp_dma_tiled.py /root/repo/DMA_TILED_r05.json \
    || say "DMA probe failed"
  commit_art DMA_TILED_r05.json \
    "DMA-tiled frontier kernel TPU probe (DMA_TILED_r05.json)"
fi

# ---- 4. bloom visited-mode A/B at the 1M headline point ----
if [ "$(left)" -gt 800 ] && [ -f "${PB}_gt.bin" ]; then
  say "bloom A/B"
  python scripts/watchdog_run.py --log /tmp/bloom_r05.log --stall 600 \
    --max-restarts 1 --budget 700 -- \
    python -u scripts/exp_bloom.py /root/repo/BLOOM_r05.json \
    || say "bloom A/B failed"
  commit_art BLOOM_r05.json \
    "Bloom visited-mode A/B at the 1M headline point (BLOOM_r05.json)"
fi

# ---- 5. tuned-10M direct rebuild + fused-R32 sweep (when time allows) ----
# Restores the scale-matched headline comparable (the reset wiped the 10M
# bundles). Direct standalone build of the tuned R=32/m=32 bundle (~40 min,
# scripts/build_10m_tuned_direct.py — same data/GT generator+seed as the
# source-bundle path) instead of source(43min)+derive(25min). bench.py's
# tuned-only fallback then lets the driver's end-of-round bench sweep it.
PT=bench_data/synth_v2_n10000000_d128_r32_m32_vamana
if [ "$(left)" -gt 3600 ] && [ ! -f "${PT}_gt.bin" ]; then
  say "10M tuned direct build"
  python scripts/watchdog_run.py --log /tmp/b10tuned.log --stall 900 \
    --max-restarts 1 --budget $(( $(left) - 1500 )) -- \
    python -u scripts/build_10m_tuned_direct.py || say "10M tuned build failed"
fi
if [ "$(left)" -gt 1200 ] && [ -f "${PT}_gt.bin" ]; then
  say "SCALE10M fused eval"
  python scripts/watchdog_run.py --log /tmp/scale10m_fused.log --stall 900 \
    --max-restarts 1 --budget $(( $(left) - 600 > 1800 ? 1800 : $(left) - 600 )) -- \
    python -u scripts/run_eval.py \
      --prefix "$PT" \
      --variant inmemory --grid 25 30 40 60 --refine \
      --note "r05 fused frontier rows at R=32 (_frontier_kernel_r32); direct-built tuned bundle (own queries/GT, same generator+seed as the source path)" \
      --out SCALE10M_FUSED_r05.json || say "scale10m fused failed"
  commit_art SCALE10M_FUSED_r05.json \
    "Tuned-10M re-sweep on fused R=32 frontier rows (SCALE10M_FUSED_r05.json)"
fi

# ---- 5b. breadth-row bundle prebuild (gist960 / glove-MIPS / spacev) ----
# ~100K points each, minutes on TPU; with these cached the driver's
# end-of-round bench spends its budget measuring instead of building
if [ "$(left)" -gt 1700 ] && [ ! -f bench_data/spacev_v2_n100000_d100_r32_m50_pruned_gt.bin ]; then
  say "breadth bundles prebuild"
  timeout $(( $(left) - 1200 > 1500 ? 1500 : $(left) - 1200 )) \
    python - >>"$LOG" 2>&1 <<'PYEOF' || say "breadth prebuild incomplete"
import sys; sys.path.insert(0, "/root/repo")
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
    import os
    if not os.path.exists(args[0] + "_gt.bin"):
        bench.build_bundle(*args, **kw)
        print("built", args[0])
PYEOF
fi

# ---- 6. full builder bench (insurance; the driver reruns it after disarm) ----
if [ "$(left)" -gt 1500 ]; then
  B=$(( $(left) - 600 )); [ "$B" -gt 3600 ] && B=3600
  say "full bench (budget ${B}s)"
  BENCH_TIME_BUDGET=$(( B - 240 )) timeout "$B" \
    python -u bench.py > /tmp/bench_r05_out.json 2>/tmp/bench_r05.log \
    || say "bench exited nonzero"
  if [ -s /tmp/bench_r05_out.json ]; then
    tail -1 /tmp/bench_r05_out.json > BENCH_r05_builder.json
    commit_art BENCH_r05_builder.json \
      "Builder-captured round-5 scoreboard (BENCH_r05_builder.json)"
  else
    say "no bench output"
  fi
fi

say "chain done"
rm -f /tmp/tpu_pids/chain_r5d.pid
