#!/bin/bash
# Round-5 post-build TPU chain (v2: adaptive to how much window the build
# leaves). The 100M R=64 sharded build (watchdog pid in /tmp/b100_wd.pid)
# holds the EXCLUSIVE tunnel for hours; this script waits for it, then runs
# the round's eval queue, committing each artifact the moment it lands so a
# driver-side round cut never loses measured evidence:
#   1. BASE100M_r05.json     — base-variant sweep to >=0.9 recall@10 at 100M
#                              (verdict r04 #1, the round's primary ask);
#                              grid shrinks to the expected knee when the
#                              build finishes late
#   2. BLOOM_r05.json        — bloom visited-mode A/B at the 1M headline
#                              operating point (verdict #6a; short)
#   3. SCALE10M_FUSED_r05.json — tuned-10M inmemory re-sweep on the new
#                              R=32 fused frontier rows (verdict #3; the
#                              driver's end-of-round bench also covers this
#                              via scale10m_tuned's auto layout)
# DEADLINE discipline: jobs are watchdog-bounded, registered in /tmp/tpu_pids,
# and nothing starts inside the driver's end-of-round bench window.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/chain_r5.pid
cd /root/repo
P=bench_data/synthg_v1_n100000000_d128_r64_m32_shardvamana
LOG=/tmp/chain_r5.log
DEADLINE=${CHAIN_R5_DEADLINE:-$(date -d "2026-08-19 23:05:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chainR5] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }

say "v2 start; waiting for 100M build (watchdog $(cat /tmp/b100_wd.pid 2>/dev/null))"
BUILD_OK=0
while true; do
  if grep -q "^DONE:" /tmp/b100.log 2>/dev/null && [ -f "${P}_disk.bin" ]; then
    BUILD_OK=1; break
  fi
  WD=$(cat /tmp/b100_wd.pid 2>/dev/null || echo 0)
  if [ "$WD" = 0 ] || ! kill -0 "$WD" 2>/dev/null; then
    say "build watchdog gone without DONE"; break
  fi
  if [ "$(left)" -lt 1200 ]; then
    say "deadline too close; stopping the build to free the tunnel"
    kill "$(cat /tmp/b100.pid 2>/dev/null)" 2>/dev/null
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

# ---- 1. 100M base sweep (only if the bundle landed) ----
if [ "$BUILD_OK" = 1 ] && [ "$(left)" -gt 900 ]; then
  B=$(( $(left) - 500 )); [ "$B" -gt 5400 ] && B=5400
  # adaptive grid: the R=64 graph's recall knee is expected near L~100
  # (r3's R=32 graph needed 512; DiskANN-quality degree halves that); with
  # a tight window skip the bracketing points
  PROBE=""
  if [ "$(left)" -gt 3300 ]; then GRID="60 100 150 220 300"; PROBE="--probe-sampled-entry"
  elif [ "$(left)" -gt 2100 ]; then GRID="100 150 220"
  else GRID="100"; fi
  say "BASE100M eval (budget ${B}s, grid $GRID $PROBE)"
  python scripts/watchdog_run.py --log /tmp/base100m_r05.log --stall 900 \
    --max-restarts 1 --budget "$B" -- \
    python -u scripts/run_eval.py --prefix "$P" --variant base \
      --grid $GRID --beam 2 --extra 24 $PROBE \
      --note "r05 R=64 20-shard vamana; RAM-resident graph" \
      --out BASE100M_r05.json || say "BASE100M eval failed"
  commit_art BASE100M_r05.json \
    "100M R=64 base-variant evaluation (BASE100M_r05.json)"
fi

# ---- 2. bloom visited-mode A/B at the 1M headline point (short) ----
if [ "$(left)" -gt 800 ]; then
  say "bloom A/B"
  python scripts/watchdog_run.py --log /tmp/bloom_r05.log --stall 600 \
    --max-restarts 1 --budget 700 -- \
    python -u scripts/exp_bloom.py /root/repo/BLOOM_r05.json \
    || say "bloom A/B failed"
  commit_art BLOOM_r05.json \
    "Bloom visited-mode A/B at the 1M headline point (BLOOM_r05.json)"
fi

# ---- 3. tuned-10M inmemory on fused R=32 rows ----
if [ "$(left)" -gt 1600 ]; then
  say "SCALE10M fused eval"
  python scripts/watchdog_run.py --log /tmp/scale10m_fused.log --stall 900 \
    --max-restarts 1 --budget $(( $(left) - 300 > 1800 ? 1800 : $(left) - 300 )) -- \
    python -u scripts/run_eval.py \
      --prefix bench_data/synth_v2_n10000000_d128_r32_m32_vamana \
      --queries-from bench_data/synth_v2_n10000000_d128_r64_m64_vamana \
      --variant inmemory --grid 25 30 40 60 --refine \
      --note "r05 fused frontier rows at R=32 (_frontier_kernel_r32)" \
      --out SCALE10M_FUSED_r05.json || say "scale10m fused failed"
  commit_art SCALE10M_FUSED_r05.json \
    "Tuned-10M re-sweep on fused R=32 frontier rows (SCALE10M_FUSED_r05.json)"
fi

say "chain done"
rm -f /tmp/tpu_pids/chain_r5.pid
