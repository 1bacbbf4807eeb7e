"""Which flat-codes restructure does Mosaic support, and what does each cost?

V5: flat gather + XLA reshape to padded [Q, C, m] + current kernel
V6: in-kernel strided lane slices (ct[:, j::m])
V7: in-kernel lanes->sublanes retile (tile_q, 8192) -> (tile_q*64, 128)
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
ITERS = 20

rng = np.random.default_rng(0)
codes_nrm = rng.integers(0, 256, (N, R, M), dtype=np.uint8)
tables = jnp.asarray(rng.normal(size=(Q, M, 256)).astype(np.float32) ** 2)
packed = jax.jit(pack_tables)(tables)
parents = jnp.asarray(rng.integers(0, N, (Q, BEAM), dtype=np.int32))
codes_flat = jnp.asarray(codes_nrm.reshape(N, R * M))


def timed(name, fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {min(ts)/ITERS*1000:8.3f} ms/iter (out={float(np.ravel(out)[0]):.4e})", flush=True)


def loop(body):
    @jax.jit
    def run(*args):
        def step(i, acc):
            p = (args[0] + i) % N
            return acc + body(p, *args[1:]).sum()

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    return run


# reference output computed from HOST-gathered codes (no extra 4 GB on device)
_p0_host = rng.integers(0, N, (64, BEAM), dtype=np.int32)
_ref = jax.device_get(
    pq_lookup_packed(packed[:64], jnp.asarray(codes_nrm[_p0_host].reshape(64, C, M)))
)


def check(name, fn):
    p0 = jnp.asarray(_p0_host)
    try:
        got = fn(packed[:64], codes_flat[p0].reshape(64, -1))
        err = float(np.max(np.abs(_ref - jax.device_get(got))))
        print(f"{name}: max abs err vs v2 = {err:.3e}", flush=True)
        return err < 1e-3
    except Exception as e:
        print(f"{name}: FAILED — {str(e).splitlines()[0][:140]}", flush=True)
        return False


# ---- V5: XLA reshape into the current kernel
def v5(pk, flat):
    q = flat.shape[0]
    return pq_lookup_packed(pk, flat.reshape(q, C, M))


if check("V5 xla-reshape", lambda pk, f: pq_lookup_packed(pk, f.reshape(f.shape[0], C, M))):
    timed("V5: flat gather + XLA reshape + v2 kernel",
          loop(lambda p, cf, pk: v5(pk, cf[p].reshape(Q, C * M))),
          parents, codes_flat, packed)


# ---- V6: strided lane slices per chunk
def _kernel_v6(tiles_q, m, c, tables_ref, codes_ref, out_ref):
    ct = codes_ref[...].reshape(tiles_q, c * m).astype(jnp.int32)  # i8->i32 first
    acc = jnp.zeros((tiles_q, c), jnp.float32)
    for j in range(m):
        tab_j = tables_ref[:, j, :]  # [tiles_q, 128]
        idx = ct[:, j::m]  # [tiles_q, c] strided lanes
        word = jnp.take_along_axis(tab_j, idx >> 1, axis=1)
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        acc = acc + pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("tile_q",))
def v6(packed_tables, flat_codes, tile_q=64):
    q, m, _ = packed_tables.shape
    c = flat_codes.shape[1] // m
    return pl.pallas_call(
        functools.partial(_kernel_v6, tile_q, m, c),
        grid=(q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, c * m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
    )(packed_tables, flat_codes)


if check("V6 strided-slices", v6):
    timed("V6: flat gather + strided-slice kernel",
          loop(lambda p, cf, pk: v6(pk, cf[p].reshape(Q, C * M))),
          parents, codes_flat, packed)


# ---- V7: lanes->sublanes retile probe (chunk-major layout, beam folded)
def _kernel_v7(tiles_q, m, r, beam, tables_ref, codes_ref, out_ref):
    # codes stored chunk-major per node: [N, m*r]; block [tiles_q, beam, m*r]
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    for b in range(beam):
        ct = codes_ref[:, b, :].reshape(mr, r).astype(jnp.int32)
        if r < 128:
            reps = -(-128 // r)
            ct = jnp.concatenate([ct] * reps, axis=1)[:, :128]
        word = jnp.take_along_axis(tab, ct >> 1, axis=1)
        shift = (ct & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        out_ref[:, b * r : (b + 1) * r] = vals.reshape(tiles_q, m, 128).sum(1)[:, :r]


codes_cm_flat = jnp.asarray(np.swapaxes(codes_nrm, 1, 2).reshape(N, M * R))  # chunk-major


@functools.partial(jax.jit, static_argnames=("tile_q",))
def v7(packed_tables, flat_cm, tile_q=64):
    q, m, _ = packed_tables.shape
    beam = flat_cm.shape[1]
    r = flat_cm.shape[2] // m
    return pl.pallas_call(
        functools.partial(_kernel_v7, tile_q, m, r, beam),
        grid=(q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, beam, m * r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, beam * r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, beam * r), jnp.float32),
    )(packed_tables, flat_cm)


def check7():
    p0 = jnp.asarray(_p0_host)
    try:
        got = v7(packed[:64], codes_cm_flat[p0].reshape(64, BEAM, M * R))
        err = float(np.max(np.abs(_ref - jax.device_get(got))))
        print(f"V7 retile: max abs err vs v2 = {err:.3e}", flush=True)
        return err < 1e-3
    except Exception as e:
        print(f"V7 retile: FAILED — {str(e).splitlines()[0][:140]}", flush=True)
        return False


if check7():
    timed("V7: chunk-major flat gather + retile kernel",
          loop(lambda p, cf, pk: v7(pk, cf[p])), parents, codes_cm_flat, packed)
