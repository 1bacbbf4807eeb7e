#!/bin/bash
# Round-5 phase C: builder-captured full bench after phases A (evals) and
# B (DMA probe) release the exclusive tunnel. Produces BENCH_r05_builder.json
# — the same scoreboard the driver captures at round end, recorded by the
# builder in case the driver's window hits tunnel trouble (the r03/r04
# pattern). Leaves the TPU free afterwards.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/chain_r5c.pid
cd /root/repo
LOG=/tmp/chain_r5c.log
DEADLINE=${CHAIN_R5C_DEADLINE:-$(date -d "2026-08-20 02:40:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chainR5c] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }

say "start; waiting for chain_r5b"
for CH in chain_r5 chain_r5b; do
  while [ -f /tmp/tpu_pids/$CH.pid ] \
        && kill -0 "$(cat /tmp/tpu_pids/$CH.pid)" 2>/dev/null; do
    if [ "$(left)" -lt 300 ]; then say "deadline; exiting"; exit 0; fi
    sleep 60
  done
done
say "phases A+B done"

if [ "$(left)" -gt 2400 ]; then
  B=$(( $(left) - 300 ))
  say "full bench (budget ${B}s)"
  BENCH_TIME_BUDGET=$(( B - 300 )) timeout "$B" \
    python -u bench.py > /tmp/bench_r05_out.json 2>/tmp/bench_r05.log \
    || say "bench exited nonzero"
  if [ -s /tmp/bench_r05_out.json ]; then
    tail -1 /tmp/bench_r05_out.json > BENCH_r05_builder.json
    git add BENCH_r05_builder.json \
      && git commit -q -m "Builder-captured round-5 scoreboard (BENCH_r05_builder.json)" \
      && say "committed BENCH_r05_builder.json"
  else
    say "no bench output"
  fi
else
  say "no time for bench"
fi
say "done"
rm -f /tmp/tpu_pids/chain_r5c.pid
