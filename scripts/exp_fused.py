"""Fused adj+codes frontier row: ONE gather per parent, kernel emits ids+dists.

Layout per node (all byte-contiguous so the kernel needs only contiguous
static slices — Mosaic rejects strided slicing and most reshapes):
  [ id byte-plane 0 (R bytes) | plane 1 | plane 2 | plane 3 |
    chunk-major codes: chunk 0's R codes | chunk 1's R codes | ... ]
-> flat u8 [N, 4R + m*R]. Saves the separate adjacency gather's ~1.5 ms
fixed cost; id assembly (4 planes -> i32) and the code restructure happen in
VMEM via contiguous slices + the proven (x, 128) retile.
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

N, R, M, Q, BEAM = 1_000_000, 64, 64, 10_000, 2
C = BEAM * R
ROW = 4 * R + M * R
ITERS = 20

rng = np.random.default_rng(0)
adj_np = rng.integers(0, N, (N, R), dtype=np.int32)
codes_nrm = rng.integers(0, 256, (N, R, M), dtype=np.uint8)
id_planes = adj_np.view(np.uint8).reshape(N, R, 4).transpose(0, 2, 1).reshape(N, 4 * R)
codes_cm = np.ascontiguousarray(codes_nrm.transpose(0, 2, 1)).reshape(N, M * R)
fused_np = np.concatenate([id_planes, codes_cm], axis=1)
tables = jnp.asarray(rng.normal(size=(Q, M, 256)).astype(np.float32) ** 2)
packed = jax.jit(pack_tables)(tables)
parents = jnp.asarray(rng.integers(0, N, (Q, BEAM), dtype=np.int32))
fused = jnp.asarray(fused_np)
del fused_np, id_planes, codes_cm


def _kernel_fused(tiles_q, m, r, beam, tables_ref, rows_ref, ids_ref, out_ref):
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    reps = -(-128 // r)

    for b in range(beam):
        rows = rows_ref[:, b, :]  # [tiles_q, ROW] u8
        idb = rows[:, : 4 * r].astype(jnp.int32)
        p0 = idb[:, 0 * r : 1 * r]
        p1 = idb[:, 1 * r : 2 * r]
        p2 = idb[:, 2 * r : 3 * r]
        p3 = idb[:, 3 * r : 4 * r]
        ids_ref[:, b * r : (b + 1) * r] = p0 | (p1 << 8) | (p2 << 16) | (p3 << 24)

        cd = rows[:, 4 * r :].astype(jnp.int32)  # [tiles_q, m*r] chunk-major
        slices = []
        for j in range(m):
            s = cd[:, j * r : (j + 1) * r]  # contiguous chunk-j codes
            if r < 128:
                s = jnp.concatenate([s] * reps, axis=1)[:, :128]
            slices.append(s)
        idx = jnp.stack(slices, axis=1).reshape(mr, 128)
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)  # ONE dynamic_gather
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        sums = vals.reshape(tiles_q, m, 128).sum(axis=1)  # [tiles_q, 128]
        out_ref[:, b * r : (b + 1) * r] = sums[:, :r]


@functools.partial(jax.jit, static_argnames=("tile_q", "m", "r", "beam"))
def fused_lookup(packed_tables, rows, m, r, beam, tile_q=32):
    q = packed_tables.shape[0]
    c = beam * r
    return pl.pallas_call(
        functools.partial(_kernel_fused, tile_q, m, r, beam),
        grid=(q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, beam, 4 * r + m * r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q, c), jnp.int32),
            jax.ShapeDtypeStruct((q, c), jnp.float32),
        ),
    )(packed_tables, rows)


def timed(name, fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)/ITERS*1000:8.3f} ms/iter (out={float(np.ravel(out)[0]):.4e})", flush=True)


# correctness
p0h = rng.integers(0, N, (32, BEAM), dtype=np.int32)
p0 = jnp.asarray(p0h)
try:
    ids, dists = fused_lookup(packed[:32], fused[p0], M, R, BEAM)
    ids, dists = jax.device_get((ids, dists))
    want_ids = adj_np[p0h].reshape(32, C)
    ref = jax.device_get(
        pq_lookup_packed(packed[:32], jnp.asarray(codes_nrm[p0h].reshape(32, C, M)))
    )
    print("ids exact:", bool((ids == want_ids).all()),
          "dists maxerr:", float(np.max(np.abs(dists - ref))), flush=True)
except Exception as e:
    print(f"fused kernel FAILED — {str(e).splitlines()[0][:160]}", flush=True)
    raise SystemExit(1)


@jax.jit
def pipe(parents, fused, packed):
    def step(i, acc):
        p = (parents + i) % N
        ids, dists = fused_lookup(packed, fused[p], M, R, BEAM)
        return acc + dists.sum() + ids.sum().astype(jnp.float32)

    return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))


timed("FUSED: one gather + ids+dists kernel", pipe, parents, fused, packed)

for tq in (16, 64):
    @functools.partial(jax.jit, static_argnames=("tq",))
    def pipe_t(parents, fused, packed, tq):
        def step(i, acc):
            p = (parents + i) % N
            ids, dists = fused_lookup(packed, fused[p], M, R, BEAM, tile_q=tq)
            return acc + dists.sum() + ids.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    timed(f"FUSED tile_q={tq}", lambda a, b, c, tq=tq: pipe_t(a, b, c, tq),
          parents, fused, packed)
