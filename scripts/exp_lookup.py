"""Microbenchmark: PQ lookup kernel variants at the 1M bench operating point.

Operating point: Q=10K queries, m=64 chunks, C=128 candidates (beam=2, R=64).
Current kernel (ops/pq_pallas.pq_lookup_packed) takes codes pre-transposed to
[Q, m, C] int32 via XLA swapaxes — that materializes ~327 MB i32 per iteration
in HBM. Variant v2 takes raw u8 codes [Q, C, m] and transposes/casts in VMEM.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bang_tpu.ops.pq_pallas import pack_tables, pq_lookup_packed

Q, M, C = 10_000, 64, 128
ITERS = 20

rng = np.random.default_rng(0)
tables = jnp.asarray(rng.normal(size=(Q, M, 256)).astype(np.float32) ** 2)
packed = jax.jit(pack_tables)(tables)
codes_u8 = jnp.asarray(rng.integers(0, 256, (Q, C, M), dtype=np.uint8))


def timed(name, fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    per_iter = min(ts) / ITERS * 1000
    print(f"{name:44s} {per_iter:8.3f} ms/iter  (out={float(np.ravel(out)[0]):.4e})")
    return per_iter


def loop(body):
    @jax.jit
    def run(packed, codes):
        def step(i, acc):
            c = (codes + i.astype(jnp.uint8))  # defeat hoisting
            return acc + body(packed, c).sum()

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    return run


# v1: current kernel (XLA transpose to [Q, m, C] i32 outside)
timed("v1 current pq_lookup_packed", loop(lambda p, c: pq_lookup_packed(p, c)), packed, codes_u8)


# v2: u8 codes [Q, C, m] straight into the kernel; cast+transpose in VMEM
def _kernel_v2(tiles_q, m, c, tables_ref, codes_ref, out_ref):
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    # codes [tiles_q, C, m] u8 -> i32 -> transpose to [tiles_q, m, C]
    ct = codes_ref[...].astype(jnp.int32)  # [tiles_q, C, m]
    ct = jnp.swapaxes(ct, 1, 2).reshape(mr, c)

    def gather_slice(idx):
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        return vals.reshape(tiles_q, m, 128).sum(axis=1)

    for s in range(c // 128):
        idx = ct[:, s * 128 : (s + 1) * 128]
        out_ref[:, s * 128 : (s + 1) * 128] = gather_slice(idx)


@functools.partial(jax.jit, static_argnames=("tile_q",))
def lookup_v2(packed_tables, codes, tile_q=32):
    q, m, _ = packed_tables.shape
    c = codes.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel_v2, tile_q, m, c),
        grid=(q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, c, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
    )(packed_tables, codes)


# correctness check vs v1 on a small slice
ref = pq_lookup_packed(packed[:64], codes_u8[:64])
got = lookup_v2(packed[:64], codes_u8[:64])
err = float(jnp.max(jnp.abs(jax.device_get(ref) - jax.device_get(got))))
print(f"v2 max abs err vs v1: {err:.3e}")

timed("v2 u8-in-kernel transpose", loop(lambda p, c: lookup_v2(p, c)), packed, codes_u8)
for tq in (16, 64, 128):
    timed(f"v2 tile_q={tq}", loop(lambda p, c, tq=tq: lookup_v2(p, c, tile_q=tq)), packed, codes_u8)

# aligned-row gather shape study (nbr_codes / nbr_vecs sizing)
for rows, rowbytes in ((10_000, 4096), (20_000, 4096), (20_000, 2048), (40_000, 1024), (10_000, 8192)):
    tbl = jnp.asarray(rng.integers(0, 256, (1_000_000, rowbytes), dtype=np.uint8))
    ids = jnp.asarray(rng.integers(0, 1_000_000, (rows,), dtype=np.int32))

    @jax.jit
    def g(t, idx):
        def step(i, acc):
            return acc + t[(idx + i) % t.shape[0]].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    timed(f"aligned gather {rows} rows x {rowbytes}B", g, tbl, ids)
    del tbl, ids
