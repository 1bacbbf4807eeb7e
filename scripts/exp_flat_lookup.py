"""Flat nbr_codes layout + in-kernel restructure vs current padded layout.

Hypotheses from exp_iter_profile:
  (a) [N, R, m] u8 with m=64 minor pads to 128 lanes -> 2x gather traffic;
      a flat [N, R*m] layout (minor 4096) avoids it.
  (b) gathers carry a ~1.5 ms fixed cost -> fusing adj+codes into one row
      could save another ~1.5 ms.
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


# A: current pipeline (padded [N, R, m] gather + v2 kernel)
codes_dev = jnp.asarray(codes_nrm)
timed("A: padded gather + v2 kernel",
      loop(lambda p, nc, pk: pq_lookup_packed(pk, nc[p].reshape(Q, C, M))),
      parents, codes_dev, packed)
del codes_dev

# B: flat [N, R*m] gather + flat kernel (reshape in VMEM)
codes_flat = jnp.asarray(codes_nrm.reshape(N, R * M))


def _kernel_flat(tiles_q, m, c, tables_ref, codes_ref, out_ref):
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    ct = codes_ref[...].reshape(tiles_q, c, m).astype(jnp.int32)
    ct = jnp.swapaxes(ct, 1, 2).reshape(mr, c)

    def gather_slice(idx):
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        return vals.reshape(tiles_q, m, 128).sum(axis=1)

    for s in range(c // 128):
        out_ref[:, s * 128 : (s + 1) * 128] = gather_slice(ct[:, s * 128 : (s + 1) * 128])


@functools.partial(jax.jit, static_argnames=("tile_q", "m"))
def lookup_flat(packed_tables, flat_codes, m, tile_q=64):
    q = packed_tables.shape[0]
    c = flat_codes.shape[1] // m
    return pl.pallas_call(
        functools.partial(_kernel_flat, tile_q, m, c),
        grid=(q // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, c * m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
    )(packed_tables, flat_codes)


# correctness vs v2
p0 = jnp.asarray(rng.integers(0, N, (64, BEAM), dtype=np.int32))
ref = pq_lookup_packed(packed[:64], jnp.asarray(codes_nrm)[p0].reshape(64, C, M))
got = lookup_flat(packed[:64], codes_flat[p0].reshape(64, C * M), M)
err = float(jnp.max(jnp.abs(jax.device_get(ref) - jax.device_get(got))))
print(f"flat kernel max abs err vs v2: {err:.3e}", flush=True)

timed("B: flat gather + flat kernel",
      loop(lambda p, cf, pk: lookup_flat(pk, cf[p].reshape(Q, C * M), M)),
      parents, codes_flat, packed)

# B2: flat gather cost alone
timed("B2: flat gather only",
      loop(lambda p, cf: cf[p].astype(jnp.float32)), parents, codes_flat)

# C: fixed-cost probe — tiny gathers
small = jnp.asarray(rng.integers(0, N, (1000,), dtype=np.int32))
timed("C: 1000-row x 4096B gather",
      loop(lambda p, cf: cf[p % N].astype(jnp.float32)), small, codes_flat)
timed("C2: 20000-row x 4096B gather",
      loop(lambda p, cf: cf[jnp.tile(p, 20)].astype(jnp.float32)),
      jnp.asarray(rng.integers(0, N, (1000,), dtype=np.int32)), codes_flat)
