"""Timestamped phase logging (reference: BANG_Base/utils/utils.h:58-68)."""

from __future__ import annotations

import sys
import time

_T0 = time.time()


def log_message(msg: str, file=sys.stdout) -> None:
    """Print `msg` with wall-clock milliseconds since process start."""
    print(f"[{(time.time() - _T0) * 1000.0:12.3f} ms] {msg}", file=file, flush=True)
