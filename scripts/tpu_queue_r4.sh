#!/bin/bash
# Round-4 TPU queue: strictly-serial device jobs (the tunnel is EXCLUSIVE —
# a second concurrent JAX client blocks forever). Order per the round-3
# close roadmap (PROGRESS.md "Round 4/5 candidates"):
#   0. wait for the (possibly wedged) tunnel to come back
#   A1. build the HBM-budget-tuned 10M bundle (R=32 graph + m=32 PQ)
#   A2. sweep it on-chip -> SCALE10M_TUNED_r04.json
#   B1. warm-started R=64 100M rebuild (DiskANN-quality degree)
#   B2. short 100M R=64 Base sweep -> BASE100M_R64.json (the end-of-round
#       bench re-sweeps the bundle too, so this stays minimal)
#   C.  best-effort: per-component device-step profiles (verdict #4)
# Budgets adapt to the time left before DISARM (21:00 UTC) so the driver's
# end-of-round bench window finds an idle TPU; a build killed mid-way still
# leaves per-shard checkpoints for the next phase/round.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/queue_r4.pid
cd /root/repo
LOG=/tmp/queue_r4.log
: > "$LOG"
DISARM=$(date -d "2026-08-18 21:00:00 UTC" +%s)

left() { echo $(( DISARM - $(date +%s) )); }

echo "[r4] queue start $(date) left=$(left)s" >>"$LOG"
while true; do
  [ "$(left)" -lt 600 ] && { echo "[r4] DISARM reached while probing" >>"$LOG"; exit 9; }
  if timeout 300 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,128))@jnp.ones((128,8))).sum()))" >>"$LOG" 2>&1; then
    echo "[r4] TPU BACK $(date)" >>"$LOG"; break
  fi
  echo "[r4] tunnel still down $(date)" >>"$LOG"
  sleep 60
done

# ---- Phase A0: quick per-component step decomposition + merge A/B ----
# (first 30 min of tunnel time: verdict #4 evidence + the sort-vs-ranked
# merge decision BEFORE the headline sweeps run; builder watches and flips
# the BANG_MERGE_IMPL default in code if ranked wins)
if [ ! -f /root/repo/MERGE_AB_r04.json ]; then
  python scripts/watchdog_run.py --log /tmp/merge_ab.log --stall 600 \
    --budget 1800 -- python -u scripts/profile_base_step.py \
      --q 10000 --beam 2 --r 64 --m 64 --n 2000000 --l-grid 20 512 \
      --out /root/repo/MERGE_AB_r04.json \
    || echo "[r4] merge A/B profile failed" >>"$LOG"
  echo "[r4] phase A0 done $(date) left=$(left)s" >>"$LOG"
fi

# ---- Phase A: tuned 10M ----
if [ ! -f bench_data/synth_v2_n10000000_d128_r32_m32_vamana_gt.bin ]; then
  B=9000; L=$(left)
  [ "$B" -gt $(( L - 7200 )) ] && B=$(( L - 7200 )); [ "$B" -lt 3600 ] && B=3600
  python scripts/watchdog_run.py --log /tmp/build10m_tuned.log --stall 420 \
    --budget "$B" -- python -u scripts/build_10m_tuned.py \
    || echo "[r4] 10M BUILD FAILED (continuing to B)" >>"$LOG"
  echo "[r4] 10M tuned build exit=$? $(date) left=$(left)s" >>"$LOG"
fi
if [ -f bench_data/synth_v2_n10000000_d128_r32_m32_vamana_gt.bin ]; then
  python scripts/watchdog_run.py --log /tmp/run10m_tuned.log --stall 600 \
    --budget 4500 -- python -u scripts/run_eval.py \
      --prefix bench_data/synth_v2_n10000000_d128_r32_m32_vamana \
      --queries-from bench_data/synth_v2_n10000000_d128_r64_m64_vamana \
      --variant inmemory --grid 14 16 20 25 30 40 60 90 --refine \
      --neighbor-codes --out SCALE10M_TUNED_r04.json \
      --note "HBM-budget-tuned 10M: R=32 graph + m=32 PQ, nbr_codes layout" \
    || echo "[r4] 10M SWEEP FAILED" >>"$LOG"
  echo "[r4] 10M tuned sweep exit=$? $(date) left=$(left)s" >>"$LOG"
fi

# ---- Phase B0: 2M R=64 calibration (evidence the warm R=64 recipe moves
# the recall knee BEFORE committing ~3 h to the 100M rebuild; both 2M
# bundles get a quick Base eval for the R=32 vs R=64 delta) ----
if [ "$(left)" -gt 16200 ] && \
   [ ! -f bench_data/synthg_v1_n2000000_d128_r64_m32_shardvamana_disk.bin ]; then
  B100_N=2000000 B100_R=64 B100_M=32 B100_SHARDS=8 B100_LBUILD=40 \
  B100_WARM=/root/repo/bench_data/synthg_v1_n2000000_d128_r32_m32_shardvamana \
  B100_REUSE=/root/repo/bench_data/synthg_v1_n2000000_d128_r32_m32_shardvamana \
  python scripts/watchdog_run.py --log /tmp/build2m_r64.log --stall 420 \
    --budget 2700 -- python -u scripts/build_100m.py \
    || echo "[r4] 2M R64 CALIBRATION BUILD FAILED" >>"$LOG"
  echo "[r4] 2M R=64 calibration build exit=$? $(date) left=$(left)s" >>"$LOG"
fi
if [ -f bench_data/synthg_v1_n2000000_d128_r64_m32_shardvamana_disk.bin ]; then
  python scripts/watchdog_run.py --log /tmp/cal2m.log --stall 600 \
    --budget 1500 -- python -u scripts/run_eval.py \
      --prefix bench_data/synthg_v1_n2000000_d128_r64_m32_shardvamana \
      --variant base --grid 40 60 100 --beam 2 --extra 24 --no-mmap \
      --out CAL2M_R64.json --note "2M R=64 warm calibration for the 100M rebuild" \
    || echo "[r4] 2M R64 eval failed" >>"$LOG"
  python scripts/watchdog_run.py --log /tmp/cal2m_r32.log --stall 600 \
    --budget 1200 -- python -u scripts/run_eval.py \
      --prefix bench_data/synthg_v1_n2000000_d128_r32_m32_shardvamana \
      --variant base --grid 40 60 100 --beam 2 --extra 24 --no-mmap \
      --out CAL2M_R32.json --note "2M R=32 baseline for the R=64 delta" \
    || echo "[r4] 2M R32 eval failed" >>"$LOG"
  echo "[r4] 2M calibration evals done $(date) left=$(left)s" >>"$LOG"
fi

# ---- Phase B: 100M R=64 warm rebuild ----
BUILD_BUDGET=$(( $(left) - 4800 ))
if [ "$BUILD_BUDGET" -lt 3600 ]; then
  echo "[r4] skipping 100M R64 build: only $(left)s left" >>"$LOG"
else
  B100_R=64 B100_M=32 B100_SHARDS=8 B100_LBUILD=40 \
  B100_WARM=/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana \
  B100_REUSE=/root/repo/bench_data/synthg_v1_n100000000_d128_r32_m32_shardvamana \
  python scripts/watchdog_run.py --log /tmp/build100m_r64.log --stall 420 \
    --budget "$BUILD_BUDGET" -- python -u scripts/build_100m.py \
    || { echo "[r4] 100M R64 BUILD FAILED/TIMED OUT $(date)" >>"$LOG"; exit 1; }
  echo "[r4] 100M R=64 build done $(date) left=$(left)s" >>"$LOG"
  python scripts/watchdog_run.py --log /tmp/run100m_r64.log --stall 600 \
    --budget 4200 -- python -u scripts/run_eval.py \
      --prefix bench_data/synthg_v1_n100000000_d128_r64_m32_shardvamana \
      --variant base --grid 60 100 150 --beam 2 --extra 24 \
      --no-mmap --probe-sampled-entry --out BASE100M_R64.json \
      --note "sharded-vamana R=64 warm-started from the round-3 R=32 graph" \
    || { echo "[r4] 100M R64 SWEEP FAILED" >>"$LOG"; exit 2; }
  echo "[r4] 100M R=64 sweep done $(date) left=$(left)s" >>"$LOG"
fi

# ---- Phase C (best-effort): device-step component profiles ----
if [ "$(left)" -gt 2700 ]; then
  python scripts/watchdog_run.py --log /tmp/profile_base.log --stall 900 \
    --budget 2400 -- python -u scripts/profile_base_step.py \
      --q 1250 --beam 2 --r 64 --m 32 --n 10000000 --l-grid 512 128 64 \
      --out STEP_PROFILE_BASE_r04.json \
    || echo "[r4] base profile failed" >>"$LOG"
fi
if [ "$(left)" -gt 2400 ]; then
  python scripts/watchdog_run.py --log /tmp/profile_inmem.log --stall 900 \
    --budget 2100 -- python -u scripts/profile_base_step.py \
      --q 10000 --beam 2 --r 64 --m 64 --n 1000000 --l-grid 20 32 \
      --out STEP_PROFILE_INMEM_r04.json \
    || echo "[r4] inmem profile failed" >>"$LOG"
fi
echo "[r4] QUEUE COMPLETE $(date)" >>"$LOG"
