"""End-to-end distance-path timing: packed-u8 (gather+bitcast) vs plain f32.

The raw-gather microbench showed u8 rows 3.3x faster than f32 rows, but the
bitcast decode may force a relayout that eats the win. Measure the FULL
distance computation both ways, scattered and aligned.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bang_tpu.ops.l2 import decode_row_gather, l2_distance_to_candidates

ITERS = 20
Q, C, D = 10_000, 64, 128
rng = np.random.default_rng(0)
qv = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))


def timed(name, fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:48s} {min(ts)/ITERS*1000:8.3f} ms/iter (out={float(np.ravel(out)[0]):.4e})", flush=True)


def loop(body):
    @jax.jit
    def run(tbl, idx):
        def step(i, acc):
            ids = (idx + i) % tbl.shape[0]
            return acc + body(tbl, ids).sum()

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    return run


for n in (1_000_000, 10_000_000):
    vec = rng.normal(size=(n, D)).astype(np.float32)
    cand = jnp.asarray(rng.integers(0, n, (Q, C), dtype=np.int32))

    vf = jnp.asarray(vec)
    timed(f"scattered f32 gather+l2 (N={n//10**6}M)",
          loop(lambda t, i: l2_distance_to_candidates(qv, t[i], None,
               precision=jax.lax.Precision.DEFAULT)), vf, cand)
    del vf

    vp = jnp.asarray(vec.view(np.uint8))
    timed(f"scattered packed-u8 gather+decode+l2 (N={n//10**6}M)",
          loop(lambda t, i: l2_distance_to_candidates(
              qv, decode_row_gather(t[i], D), None,
              precision=jax.lax.Precision.DEFAULT)), vp, cand)
    del vp, cand, vec

# aligned nbr_vecs analog: [1M, R=64, D] rows gathered per parent (10K rows)
n = 250_000
R = 64
vec = rng.normal(size=(n, R, D)).astype(np.float32)
parents = jnp.asarray(rng.integers(0, n, (Q,), dtype=np.int32))

va = jnp.asarray(vec)
timed("aligned f32 nbr_vecs gather+l2",
      loop(lambda t, i: l2_distance_to_candidates(qv, t[i], None,
           precision=jax.lax.Precision.DEFAULT)), va, parents)
del va

vap = jnp.asarray(vec.reshape(n, R, D * 4) if False else vec.view(np.uint8))
timed("aligned packed-u8 nbr_vecs gather+decode+l2",
      loop(lambda t, i: l2_distance_to_candidates(
          qv, decode_row_gather(t[i], D), None,
          precision=jax.lax.Precision.DEFAULT)), vap, parents)
