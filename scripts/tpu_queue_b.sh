#!/bin/bash
# Round-4 TPU queue, phase B: the R=64 100M rebuild (DiskANN-quality degree)
# and its Base-variant sweep. Auto-launched when phase A completes.
# l_build adapts to the time left before the 08:00 UTC disarm deadline so
# the build + sweep fit; a build killed mid-way still leaves per-shard
# checkpoints for the next round.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/queue_b_$$.pid
cd /root/repo
LOG=/tmp/phaseB.log
: > "$LOG"

NOW=$(date +%s)
DISARM=$(date -d "2026-08-18 08:00:00 UTC" +%s)
LEFT=$(( DISARM - NOW ))
if [ "$LEFT" -lt 14400 ]; then LB=32
elif [ "$LEFT" -lt 21600 ]; then LB=36
else LB=40; fi
BUILD_BUDGET=$(( LEFT - 4500 ))
[ "$BUILD_BUDGET" -lt 3600 ] && BUILD_BUDGET=3600
echo "[queueB] left=${LEFT}s l_build=$LB build_budget=${BUILD_BUDGET}s $(date)" >>"$LOG"

# Warm start from the round-3 R=32 bundle: a single warm pass at R=64 is
# effectively the second pass of a 2-pass build (the R=32 pass was already
# paid for in round 3).
B100_R=64 B100_M=32 B100_SHARDS=${B100_SHARDS:-8} \
B100_LBUILD=${B100_LBUILD:-$LB} \
B100_WARM=/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana \
B100_REUSE=/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana \
python scripts/watchdog_run.py --log /tmp/build100m_r64.log --stall 420 \
  --budget "$BUILD_BUDGET" -- python -u scripts/build_100m.py \
  || { echo "[queueB] 100M R64 BUILD FAILED/TIMED OUT" >>"$LOG"; exit 1; }
echo "[queueB] 100M R=64 build done $(date)" >>"$LOG"

python scripts/watchdog_run.py --log /tmp/run100m_r64.log --stall 600 \
  --budget 7200 -- python -u scripts/run_100m_r64.py \
  || { echo "[queueB] 100M R64 SWEEP FAILED" >>"$LOG"; exit 2; }
echo "[queueB] PHASE B COMPLETE $(date)" >>"$LOG"
