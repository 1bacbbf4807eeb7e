"""Stall-watchdog runner for long TPU jobs through the axon tunnel.

An in-flight device RPC can hang permanently (thread parked in a socket
read, 0% CPU, no further output) after tunnel churn. Checkpointed build
scripts (scripts/build_100m.py, scripts/build_10m_tuned.py) make restarts
cheap, so the right recovery is: watch the job's log mtime, and if it
freezes longer than --stall seconds, kill the process group and relaunch.

Usage:
    python scripts/watchdog_run.py --log /tmp/job.log --stall 420 \
        --max-restarts 8 --budget 21600 -- python -u scripts/build_100m.py

Exits 0 when the wrapped command exits 0; nonzero when the command fails
repeatedly, restarts are exhausted, or the wall budget is exceeded.
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def launch(cmd, log_path):
    log_f = open(log_path, "ab", buffering=0)
    log_f.write(f"\n[watchdog] launch: {' '.join(cmd)} @ {time.strftime('%H:%M:%S')}\n".encode())
    # own process group so a stalled job tree dies with one signal
    return subprocess.Popen(
        cmd, stdout=log_f, stderr=subprocess.STDOUT, start_new_session=True
    ), log_f


def kill_group(proc):
    try:
        os.killpg(proc.pid, signal.SIGTERM)
    except ProcessLookupError:
        return
    for _ in range(20):
        if proc.poll() is not None:
            return
        time.sleep(0.5)
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def main():
    # Register for external disarm (end-of-round cleanup kills recorded PIDs
    # only — never pattern matches) and make SIGTERM take the child's whole
    # process group down with us (the child runs in its own session, so a
    # plain kill of the watchdog would orphan a TPU-holding build).
    os.makedirs("/tmp/tpu_pids", exist_ok=True)
    with open(f"/tmp/tpu_pids/watchdog_{os.getpid()}.pid", "w") as f:
        f.write(str(os.getpid()))
    current = {"proc": None}

    def on_term(signum, frame):
        if current["proc"] is not None:
            kill_group(current["proc"])
        sys.exit(143)

    signal.signal(signal.SIGTERM, on_term)

    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--stall", type=float, default=420.0,
                    help="seconds of frozen log mtime before restart")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--budget", type=float, default=6 * 3600.0,
                    help="total wall seconds before giving up")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    t0 = time.time()
    restarts = 0
    while True:
        proc, log_f = launch(cmd, args.log)
        current["proc"] = proc
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            if time.time() - t0 > args.budget:
                log_f.write(b"[watchdog] wall budget exceeded; killing\n")
                kill_group(proc)
                print("[watchdog] BUDGET EXCEEDED", file=sys.stderr)
                sys.exit(3)
            frozen = time.time() - os.path.getmtime(args.log)
            if frozen > args.stall:
                log_f.write(
                    f"[watchdog] log frozen {frozen:.0f}s > {args.stall:.0f}s; restarting\n".encode()
                )
                kill_group(proc)
                rc = None
                break
            time.sleep(10)
        log_f.close()
        if rc == 0:
            print("[watchdog] command succeeded", file=sys.stderr)
            sys.exit(0)
        restarts += 1
        if restarts > args.max_restarts:
            print("[watchdog] restarts exhausted", file=sys.stderr)
            sys.exit(2)
        # brief pause lets the tunnel-side session state expire
        time.sleep(15)


if __name__ == "__main__":
    main()
