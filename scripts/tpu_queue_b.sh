#!/bin/bash
# Round-4 TPU queue, phase B: the R=64 100M rebuild (DiskANN-quality degree)
# and its Base-variant sweep. Launch AFTER phase A (tpu_queue_a.sh) finishes
# and the 2M calibration numbers look sane. Override L_BUILD via env if the
# calibration projects past the wall budget.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/queue_b_$$.pid
cd /root/repo
LOG=/tmp/phaseB.log
: > "$LOG"

# Warm start from the round-3 R=32 bundle: a single warm pass at R=64 is
# effectively the second pass of a 2-pass build (the R=32 pass was already
# paid for in round 3), so l_build can stay moderate.
B100_R=64 B100_M=32 B100_SHARDS=${B100_SHARDS:-8} \
B100_LBUILD=${B100_LBUILD:-40} \
B100_WARM=${B100_WARM:-/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana} \
B100_REUSE=/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana \
python scripts/watchdog_run.py --log /tmp/build100m_r64.log --stall 420 \
  --budget ${B100_BUDGET:-28800} -- python -u scripts/build_100m.py \
  || { echo "[queueB] 100M R64 BUILD FAILED" >>"$LOG"; exit 1; }
echo "[queueB] 100M R=64 build done $(date)" >>"$LOG"

python scripts/watchdog_run.py --log /tmp/run100m_r64.log --stall 600 \
  --budget 7200 -- python -u scripts/run_100m_r64.py \
  || { echo "[queueB] 100M R64 SWEEP FAILED" >>"$LOG"; exit 2; }
echo "[queueB] PHASE B COMPLETE $(date)" >>"$LOG"
