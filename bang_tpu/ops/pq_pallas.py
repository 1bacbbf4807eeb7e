"""Pallas TPU kernel for the PQ lookup-accumulate — the hot op of traversal.

Re-design of the reference's `compute_neighborDist_par` PQ kernel
(BANG_Base/bang_search.cu:1201-1241: 8 threads/neighbor + cub WarpReduce).
XLA lowers the per-query table gather (`take_along_axis` over a [Q, m*256]
operand) to ~12 ns/element scalar loads on TPU — measured ~126 ms per
iteration at Q=10K, R=32, m=32, which made the PQ path 20x slower than exact
distance. This kernel brings it to ~1.4 ms by turning the lookup into Mosaic's
native lane-dimension `dynamic_gather`:

  * tables are packed once per batch: f32 -> bf16, two adjacent centers packed
    into one int32 lane, so each (query, chunk) row of 256 centers spans
    exactly 128 lanes — a single vreg along the gather dimension (Mosaic
    supports only one);
  * the whole [TQ, m] tile gathers in ONE `dynamic_gather` op (rows =
    (query, chunk) pairs, lanes = candidates tiled to 128);
  * the selected bf16 half-word is unpacked with shift/mask/bitcast on the
    VPU and reduced over chunks.

Accuracy: bf16 table entries (~0.4% relative) only steer the traversal;
final results are exact-re-ranked (Inmemory/Base) so recall is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Queries per grid program. 64 empirically best on v5e for the u8-codes
# kernel (2.69 ms at 64 vs 2.76 at 32 / 2.89 at 16; Q=10K, m=64, C=128).
DEFAULT_TILE_Q = 64


def pack_tables(tables: jnp.ndarray) -> jnp.ndarray:
    """[Q, m, 256] f32 distance tables -> [Q, m, 128] int32 bf16-pairs."""
    tb = tables.astype(jnp.bfloat16).view(jnp.uint16).astype(jnp.uint32)
    return (tb[..., 0::2] | (tb[..., 1::2] << 16)).astype(jnp.int32)


def _lookup_kernel(tiles_q: int, m: int, r: int, tables_ref, codes_ref, out_ref):
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    # codes arrive untransposed [tiles_q, R, m] u8 — cast + transpose here in
    # VMEM. Shipping u8 (vs the previous XLA pre-transpose to [Q, m, R] i32)
    # cuts the kernel's HBM code traffic 4x and removes a 2x materialization
    # pass; measured 4.0 -> 2.7 ms/iter at Q=10K, m=64, C=128 on v5e.
    ct = jnp.swapaxes(codes_ref[...].astype(jnp.int32), 1, 2).reshape(mr, r)

    def gather_slice(idx):
        # idx: [mr, 128] lane indices into the packed 256-entry tables
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)  # ONE dynamic_gather
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        return vals.reshape(tiles_q, m, 128).sum(axis=1)  # [tiles_q, 128]

    if r <= 128:
        reps = -(-128 // r)
        idx = jnp.concatenate([ct] * reps, axis=1)[:, :128]
        out_ref[...] = gather_slice(idx)[:, :r]
    else:
        # wide candidate batches (beam expansion): 128-lane slices
        assert r % 128 == 0, "pad candidate count to a multiple of 128"
        for s in range(r // 128):
            idx = ct[:, s * 128 : (s + 1) * 128]
            out_ref[:, s * 128 : (s + 1) * 128] = gather_slice(idx)


@functools.partial(jax.jit, static_argnames=("tile_q", "interpret"))
def pq_lookup_packed(
    packed_tables: jnp.ndarray,
    codes: jnp.ndarray,
    tile_q: int = DEFAULT_TILE_Q,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[q, r] = sum_c unpack(packed_tables)[q, c, codes[q, r, c]].

    packed_tables: [Q, m, 128] int32 (from pack_tables); codes: [Q, R, m]
    uint8/int32 gathered per candidate. Returns [Q, R] f32 (bf16 accuracy).
    """
    q, m, _ = packed_tables.shape
    r = codes.shape[1]
    r_pad = r if r <= 128 else -(-r // 128) * 128
    codes = codes.astype(jnp.uint8)  # ship 1 byte/code into the kernel
    if r_pad != r:
        codes = jnp.pad(codes, ((0, 0), (0, r_pad - r), (0, 0)))

    q_pad = -(-q // tile_q) * tile_q
    if q_pad != q:
        packed_tables = jnp.pad(packed_tables, ((0, q_pad - q), (0, 0), (0, 0)))
        codes = jnp.pad(codes, ((0, q_pad - q), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, tile_q, m, r_pad),
        grid=(q_pad // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, r_pad, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, r_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, r_pad), jnp.float32),
        interpret=interpret,
    )(packed_tables, codes)
    return out[:q, :r]


def use_pallas_default() -> bool:
    """Pallas path on real TPU; XLA path elsewhere (CPU tests, interpreters)."""
    return jax.default_backend() == "tpu"
