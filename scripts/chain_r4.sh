#!/bin/bash
# Round-4 serial TPU chain (the tunnel is EXCLUSIVE — one client at a time):
#   1. wait for the running 10M R=64/m=64 source build to finish
#   2. build the HBM-budget-tuned 10M bundle (R=32 graph + m=32 PQ)
#   3. full bench run -> warms every compile cache + BENCH_r04_builder.json
#   4. if time remains: per-component Base step decomposition (verdict #4)
# DEADLINE: all device work stops well before the driver's end-of-round
# bench window (round 3 died because a builder job held the tunnel).
set -u
cd /root/repo
LOG=/tmp/chain_r4.log
DEADLINE=${CHAIN_DEADLINE:-$(date -d "2026-08-19 05:55:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chain] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }

say "start"
SRC=bench_data/synth_v2_n10000000_d128_r64_m64_vamana
# 1. wait for the source build (watch its pidfile, not a pattern)
while kill -0 "$(cat /tmp/build10m.pid 2>/dev/null)" 2>/dev/null; do
  [ "$(left)" -lt 4500 ] && { say "deadline squeeze while waiting"; break; }
  sleep 30
done
say "source build process gone"
if [ ! -f ${SRC}_gt.bin ] || [ ! -f ${SRC}_pq_compressed.bin ]; then
  say "SOURCE BUNDLE INCOMPLETE — retrying build inline"
  timeout $(( $(left) - 3600 > 600 ? $(left) - 3600 : 600 )) \
    python -u scripts/build_10m_source.py >>/tmp/build10m.log 2>&1 \
    || say "source rebuild failed"
fi

# 2. tuned bundle (needs the source; ~15-20 min)
if [ -f ${SRC}_gt.bin ] && [ "$(left)" -gt 3300 ]; then
  timeout 2400 python -u scripts/build_10m_tuned.py >/tmp/build10m_tuned.log 2>&1 \
    || say "tuned build failed/timeout"
  say "tuned build done"
else
  say "skipping tuned build (missing source or <55min left)"
fi

# 3. full bench — budget leaves 5 min of slack before the deadline
if [ "$(left)" -gt 1200 ]; then
  B=$(( $(left) - 300 ))
  say "bench start budget=${B}s"
  BENCH_TIME_BUDGET=$B timeout $(( B + 240 )) python -u bench.py \
    >/tmp/bench_r04.json 2>/tmp/bench_r04.log
  tail -1 /tmp/bench_r04.json > /root/repo/BENCH_r04_builder.json
  say "bench done"
fi

# 4. best-effort step decomposition (verdict #4)
if [ "$(left)" -gt 1500 ]; then
  timeout $(( $(left) - 240 )) python -u scripts/profile_base_step.py \
    --q 10000 --beam 2 --r 64 --m 64 --n 2000000 --l-grid 20 512 \
    --out /root/repo/MERGE_AB_r04.json >/tmp/merge_ab.log 2>&1 \
    || say "profile failed/timeout"
  say "profile done"
fi
say "chain complete — TPU idle for the driver window"
