"""Hard disarm daemon: at the given UTC time, SIGTERM every PID recorded in
/tmp/tpu_pids/*.pid (the queue script and its watchdog runners register
themselves there), then SIGKILL stragglers after a grace period.

Exists so the driver's end-of-round bench window finds an uncontended TPU
(the device is EXCLUSIVE — a second concurrent client blocks forever, see
PROGRESS.md environment facts). Kills only recorded PIDs — never pattern
matches on command lines.

Usage: python scripts/disarm_at.py "2026-08-18 20:55:00"
"""

import glob
import os
import signal
import sys
import time
from datetime import datetime, timezone


def pids():
    out = []
    for f in glob.glob("/tmp/tpu_pids/*.pid"):
        try:
            out.append((f, int(open(f).read().strip())))
        except (ValueError, OSError):
            pass
    return out


def alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def main():
    when = datetime.strptime(sys.argv[1], "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=timezone.utc
    )
    delay = (when - datetime.now(timezone.utc)).total_seconds()
    print(f"[disarm] sleeping {delay:.0f}s until {when}", flush=True)
    if delay > 0:
        time.sleep(delay)
    targets = pids()
    print(f"[disarm] {datetime.now(timezone.utc)} terminating: {targets}",
          flush=True)
    for _f, p in targets:
        try:
            os.kill(p, signal.SIGTERM)
        except OSError:
            pass
    time.sleep(30)
    for f, p in targets:
        if alive(p):
            try:
                os.kill(p, signal.SIGKILL)
                print(f"[disarm] SIGKILL {p}", flush=True)
            except OSError:
                pass
        try:
            os.remove(f)
        except OSError:
            pass
    print("[disarm] done", flush=True)


if __name__ == "__main__":
    main()
