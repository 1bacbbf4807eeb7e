"""Timestamped phase logging (reference: BANG_Base/utils/utils.h:58-68)."""

from __future__ import annotations

import sys
import time

_T0 = time.time()


def log_message(msg: str, file=None) -> None:
    """Print `msg` with wall-clock milliseconds since process start.

    The stream is resolved at CALL time (a `file=sys.stdout` default would
    bind the import-time stream object and bypass later redirection —
    pytest capture, nohup, etc.)."""
    out = sys.stdout if file is None else file
    print(f"[{(time.time() - _T0) * 1000.0:12.3f} ms] {msg}", file=out, flush=True)
