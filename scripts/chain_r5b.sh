#!/bin/bash
# Round-5 phase B: opportunistic DMA-tiled kernel probe (verdict r04 #2).
# Runs AFTER chain_r5.sh finishes (watches its pidfile; the tunnel is
# EXCLUSIVE) and only if time remains before the driver's bench window.
set -u
mkdir -p /tmp/tpu_pids; echo $$ > /tmp/tpu_pids/chain_r5b.pid
cd /root/repo
LOG=/tmp/chain_r5b.log
DEADLINE=${CHAIN_R5_DEADLINE:-$(date -d "2026-08-19 23:05:00 UTC" +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "[chainR5b] $1 $(date -u +%H:%M:%S) left=$(left)s" >>"$LOG"; }

say "start; waiting for chain_r5"
while [ -f /tmp/tpu_pids/chain_r5.pid ] \
      && kill -0 "$(cat /tmp/tpu_pids/chain_r5.pid)" 2>/dev/null; do
  if [ "$(left)" -lt 120 ]; then say "deadline; exiting"; exit 0; fi
  sleep 60
done
say "chain_r5 done"

if [ "$(left)" -gt 900 ]; then
  say "DMA tiled probe"
  python scripts/watchdog_run.py --log /tmp/dma_tiled.log --stall 600 \
    --max-restarts 1 --budget $(( $(left) - 240 > 1500 ? 1500 : $(left) - 240 )) -- \
    python -u scripts/exp_dma_tiled.py /root/repo/DMA_TILED_r05.json \
    || say "probe failed"
  if [ -s DMA_TILED_r05.json ]; then
    git add DMA_TILED_r05.json \
      && git commit -q -m "DMA-tiled frontier kernel TPU probe (DMA_TILED_r05.json)" \
      && say "committed DMA_TILED_r05.json"
  fi
else
  say "no time for DMA probe"
fi
say "done"
rm -f /tmp/tpu_pids/chain_r5b.pid
