"""Microbenchmark: scattered PQ-code gather strategies at 10M scale.

The inmemory variant's nbr_codes layout (N*R*m bytes) cannot fit HBM at 10M
points; the scattered gather codes[cand_ids] becomes the per-iteration cost
that decides 10M-scale QPS. This measures the XLA gather under different
physical layouts, on the real chip, inside a fori_loop (per-dispatch tunnel
overhead ~27 ms would otherwise dominate).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

N = 10_000_000
M = 64
Q = 10_000
C = 64
ITERS = 20

rng = np.random.default_rng(0)
codes = rng.integers(0, 256, (N, M), dtype=np.uint8)
cand = rng.integers(0, N, (Q, C), dtype=np.int32)


def timed(name, fn, *args):
    # axon's block_until_ready doesn't block; force sync with a D2H fetch
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    per_iter = min(ts) / ITERS * 1000
    print(f"{name:40s} {per_iter:8.3f} ms/iter   (out={out:.3e})")
    return per_iter


def loop(body):
    """Run body ITERS times with a varying index base so XLA can't hoist."""

    @jax.jit
    def run(table, idx):
        def step(i, acc):
            ids = (idx + i) % table.shape[0]
            return acc + body(table, ids)

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    return run


# a) plain u8 [N, 64] row gather
codes_d = jnp.asarray(codes)
cand_d = jnp.asarray(cand)
timed("u8 [N,64] rows", loop(lambda t, i: t[i].astype(jnp.float32).sum()), codes_d, cand_d)

# b) u8 [N,128] padded rows (lane-aligned)
codes128 = jnp.pad(codes_d, ((0, 0), (0, 64)))
timed("u8 [N,128] padded rows", loop(lambda t, i: t[i].astype(jnp.float32).sum()), codes128, cand_d)

# c) i32 view [N,16]
codes_i32 = jnp.asarray(codes.view(np.int32))
timed("i32 [N,16] rows", loop(lambda t, i: t[i].sum().astype(jnp.float32)), codes_i32, cand_d)

# d) flat-id gather: one id per (q, c) into [N*M] u8? -> same bytes, elementwise ids
# gather of SCALARS, for scale reference at small take count
flat_ids = cand_d[:, :, None] * M + jnp.arange(M, dtype=jnp.int32)[None, None, :]


@jax.jit
def flat_gather(tflat, idx):
    def step(i, acc):
        ids = (idx + i * M) % tflat.shape[0]
        return acc + tflat[ids].astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))


# e) sorted ids (locality probe — NOT order-preserving, diagnostic only)
cand_sorted = jnp.sort(cand_d.reshape(-1)).reshape(Q, C)
timed("u8 [N,64] rows, sorted ids", loop(lambda t, i: t[i].astype(jnp.float32).sum()), codes_d, cand_sorted)

# f) aligned row gather at the same total bytes: gather Q rows of C*M bytes
aligned = jnp.asarray(rng.integers(0, 256, (1_000_000, C * M), dtype=np.uint8))
rows = jnp.asarray(rng.integers(0, 1_000_000, (Q,), dtype=np.int32))
timed(
    "aligned [1M, C*M=4096] row gather (nbr_codes analog)",
    loop(lambda t, i: t[i].astype(jnp.float32).sum()),
    aligned,
    rows,
)

# g) f32 vectors [N, 32] (=128B rows) — exactdistance-at-10M probe
vecs32 = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32))
timed("f32 [N,32] rows (128B)", loop(lambda t, i: t[i].sum()), vecs32, cand_d)
