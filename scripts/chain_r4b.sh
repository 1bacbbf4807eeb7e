#!/bin/bash
# Round-4 phase B serial TPU chain — runs after chain_r4.sh releases the
# tunnel (EXCLUSIVE: one JAX client at a time). Continuation decided
# 04:20 UTC: this builder session extends past chain_r4.sh's conservative
# 05:55 deadline, so the remaining tunnel hours go to:
#   1. Base/inmemory device-step decomposition (verdict #4) — short, lands
#      evidence THIS round
#   2. 100M R=64/m=32 cold sharded rebuild (verdict #2) — cannot finish in
#      this session (~11h of device time; bench_data was wiped by the
#      machine reset, so no warm seed exists). Runs checkpointed until the
#      DEADLINE so round 5 resumes from per-shard checkpoints instead of
#      starting cold.
# DEADLINE discipline: every job is watchdog-bounded and registered in
# /tmp/tpu_pids; nothing may hold the tunnel into the driver's bench window.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/chain_r4b.pid
cd /root/repo
LOG=/tmp/chain_r4b.log
DEADLINE=${CHAIN_B_DEADLINE:-$(date -d "2026-08-19 09:10:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chainB] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }

say "start"
# wait for phase A (watch its pid — passed explicitly since chain_r4.sh
# predates the pidfile convention; never pattern-match)
A_PID=${CHAIN_A_PID:?set CHAIN_A_PID to the running chain_r4.sh pid}
while kill -0 "$A_PID" 2>/dev/null; do
  sleep 30
done
say "phase A gone"

# ---- 1. device-step decomposition (verdict #4) ----
if [ ! -f /root/repo/MERGE_AB_r04.json ] && [ "$(left)" -gt 2700 ]; then
  python scripts/watchdog_run.py --log /tmp/merge_ab.log --stall 600 \
    --budget 2100 -- python -u scripts/profile_base_step.py \
      --q 10000 --beam 2 --r 64 --m 64 --n 2000000 --l-grid 20 512 \
      --out /root/repo/MERGE_AB_r04.json \
    || say "merge A/B profile failed"
  say "profile 1 done"
fi
if [ ! -f /root/repo/STEP_PROFILE_INMEM_r04.json ] && [ "$(left)" -gt 2100 ]; then
  python scripts/watchdog_run.py --log /tmp/profile_inmem.log --stall 600 \
    --budget 1500 -- python -u scripts/profile_base_step.py \
      --q 10000 --beam 2 --r 64 --m 64 --n 1000000 --l-grid 11 20 32 \
      --out /root/repo/STEP_PROFILE_INMEM_r04.json \
    || say "inmem profile failed"
  say "profile 2 done"
fi

# ---- 2. 100M R=64 cold rebuild, checkpointed, until the deadline ----
B=$(( $(left) - 300 ))
if [ "$B" -gt 3600 ]; then
  say "100M R64 build start budget=${B}s"
  B100_R=64 B100_M=32 B100_SHARDS=8 B100_LBUILD=40 \
  python scripts/watchdog_run.py --log /tmp/build100m_r64.log --stall 600 \
    --budget "$B" -- python -u scripts/build_100m.py \
    && say "100M build COMPLETE" || say "100M build stopped (budget/fail) — checkpoints kept"
else
  say "skipping 100M build (<1h left)"
fi

# ---- 3. if the build finished inside the window, sweep it ----
if [ -f bench_data/synthg_v1_n100000000_d128_r64_m32_shardvamana_gt.bin ] && \
   [ -f bench_data/synthg_v1_n100000000_d128_r64_m32_shardvamana_disk.bin ] && \
   [ "$(left)" -gt 3000 ]; then
  python scripts/watchdog_run.py --log /tmp/run100m_r64.log --stall 600 \
    --budget $(( $(left) - 240 )) -- python -u scripts/run_eval.py \
      --prefix bench_data/synthg_v1_n100000000_d128_r64_m32_shardvamana \
      --variant base --grid 60 100 150 --beam 2 --extra 24 \
      --no-mmap --out BASE100M_R64.json \
      --note "cold sharded-vamana R=64 l_build=40 (bench_data wiped by machine reset; no warm seed)" \
    || say "100M sweep failed"
  say "100M sweep done"
fi
say "chain B complete — TPU idle"
