"""scripts/watchdog_run.py: stall detection, restart, and success paths.

The watchdog exists because an in-flight device RPC through the axon tunnel
can hang permanently (thread parked in a socket read, no output) — long
TPU builds are run under it with per-stage file checkpoints so a restart
costs minutes, not hours.
"""

import os
import subprocess
import sys
import textwrap

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "watchdog_run.py",
)


def _run(tmp_path, job_body, stall=2.0, max_restarts=2, budget=60.0):
    job = tmp_path / "job.py"
    job.write_text(textwrap.dedent(job_body))
    log = tmp_path / "job.log"
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--log", str(log), "--stall", str(stall),
         "--max-restarts", str(max_restarts), "--budget", str(budget),
         "--", sys.executable, "-u", str(job), str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    return proc, log.read_text() if log.exists() else ""


def test_clean_success(tmp_path):
    proc, log = _run(tmp_path, """
        import sys
        print("working")
        print("done")
    """)
    assert proc.returncode == 0
    assert "done" in log


def test_stall_then_restart_succeeds(tmp_path):
    # first attempt stalls silently; the restarted attempt sees the
    # checkpoint marker and finishes — exactly the checkpointed-build shape
    proc, log = _run(tmp_path, """
        import os, sys, time
        marker = os.path.join(sys.argv[1], "attempt1")
        if not os.path.exists(marker):
            open(marker, "w").close()
            print("attempt 1: stalling")
            time.sleep(3600)  # no further output -> log mtime freezes
        print("attempt 2: resumed from checkpoint")
    """)
    assert proc.returncode == 0
    assert "restarting" in log
    assert "attempt 2: resumed" in log


def test_persistent_failure_exhausts_restarts(tmp_path):
    proc, log = _run(tmp_path, """
        import sys
        print("failing")
        sys.exit(1)
    """, max_restarts=1)
    assert proc.returncode == 2
