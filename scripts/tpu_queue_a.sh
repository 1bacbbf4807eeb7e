#!/bin/bash
# Round-4 TPU queue, phase A. The tunnel is exclusive, so TPU jobs run
# strictly serially:
#   0. wait for the wedged tunnel to come back (probe with timeout)
#   1. build the HBM-budget-tuned 10M bundle (R=32 graph + m=32 PQ)
#   2. validate it on-chip -> SCALE10M_TUNED_r03.json
#   3. 2M R=64 calibration build (timing + recall data for the 100M rebuild)
set -u
cd /root/repo
LOG=/tmp/phaseA.log
: > "$LOG"
while true; do
  if timeout 300 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))@jnp.ones((128,8))).sum()))" >>"$LOG" 2>&1; then
    echo "[queue] TPU BACK $(date)" >>"$LOG"; break
  fi
  echo "[queue] tunnel still down $(date)" >>"$LOG"
  sleep 60
done

python scripts/watchdog_run.py --log /tmp/build10m_tuned.log --stall 420 \
  --budget 10800 -- python -u scripts/build_10m_tuned.py \
  || { echo "[queue] 10M BUILD FAILED" >>"$LOG"; exit 1; }
echo "[queue] 10M tuned build done $(date)" >>"$LOG"

python scripts/watchdog_run.py --log /tmp/run10m_tuned.log --stall 600 \
  --budget 5400 -- python -u scripts/run_10m_tuned.py \
  || { echo "[queue] 10M SWEEP FAILED" >>"$LOG"; exit 2; }
echo "[queue] 10M tuned sweep done $(date)" >>"$LOG"

B100_N=2000000 B100_R=64 B100_M=32 B100_SHARDS=8 B100_LBUILD=40 \
B100_WARM=/root/repo/bench_data/synthg_v1_n2000000_d128_r32_m32_shardvamana \
B100_REUSE=/root/repo/bench_data/synthg_v1_n2000000_d128_r32_m32_shardvamana \
python scripts/watchdog_run.py --log /tmp/build2m_r64.log --stall 420 \
  --budget 5400 -- python -u scripts/build_100m.py \
  || { echo "[queue] 2M R64 BUILD FAILED" >>"$LOG"; exit 3; }
echo "[queue] 2M R=64 calibration done $(date)" >>"$LOG"
echo "[queue] PHASE A COMPLETE $(date)" >>"$LOG"
