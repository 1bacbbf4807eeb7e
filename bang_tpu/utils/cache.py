"""Persistent XLA compilation cache.

Compiles through the axon remote-compile tunnel cost 20-40 s each; the
persistent cache makes warm starts (benchmarks, repeated harness runs)
compile-free across processes.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "bench_data",
            "jax_cache",
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
