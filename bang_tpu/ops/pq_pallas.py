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
    # Scoped-vmem budget: the kernel materializes ~6 temporaries of
    # [tile_q*m, 128] i32. tile_q*m = 4096 (the tuned m=64 point) fits v5e's
    # 16M scoped limit; m=120 at tile_q=64 allocates 22.3M and Mosaic OOMs
    # (observed on the gist960 bundle) — shrink the tile for wide-m tables.
    while tile_q > 8 and tile_q * m > 4096:
        tile_q //= 2
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


# ---------------------------------------------------------------------------
# Fused frontier kernel: ONE gather per parent yields neighbor ids + PQ dists.
# ---------------------------------------------------------------------------

def pack_frontier_rows(adj, codes):
    """Build the fused frontier table [N, 4R + m*R] u8 (host-side numpy).

    Per node, byte-contiguous so the kernel needs only contiguous static
    slices (Mosaic rejects strided slices and general reshapes):
      [ id byte-plane 0 (R bytes) | plane 1 | plane 2 | plane 3 |
        chunk-major codes: chunk 0's R codes | ... | chunk m-1's R codes ]

    adj: [N, R] int32 (self-padded); codes: [N, m] u8. The row fuses what
    the traversal previously fetched with TWO gathers (adjacency row +
    neighbor-aligned codes); each gather op costs ~1.5 ms fixed on v5e, so
    fusing saves ~2.3 ms/iteration at Q=10K, beam=2, R=m=64.

    R must be a multiple of 64, or exactly 32: Mosaic miscompiles 32-wide
    byte-plane lane slices at offset 64 (observed: plane 2 dropped for lanes
    16..31 — ids came back masked to 16 bits at R=32, silently halving recall
    on any graph with >65536 nodes; re-confirmed on v5e 2026-08-19,
    DMA_AB_r05.json check_pq_r32.gathered_ids_exact=false). R in {64, 128}
    lowers correctly (validated bit-exact at N=1M, which exercises plane 2);
    R=32 routes through _frontier_kernel_r32, which decodes the identical
    row layout without ever slicing lanes below 128-alignment.
    """
    import numpy as np

    n, r = adj.shape
    if r % 64 and r != 32:
        raise ValueError(
            f"fused frontier rows require R % 64 == 0 or R == 32 (got R={r});"
            " use the nbr_codes layout instead — see the Mosaic slicing note"
            " above (R=32 decodes through the slice-free _frontier_kernel_r32)"
        )
    m = codes.shape[1]
    id_planes = (
        np.ascontiguousarray(adj, dtype=np.int32)
        .view(np.uint8).reshape(n, r, 4).transpose(0, 2, 1).reshape(n, 4 * r)
    )
    nbr_codes = codes[adj]  # [N, R, m]
    codes_cm = np.ascontiguousarray(nbr_codes.transpose(0, 2, 1)).reshape(n, m * r)
    return np.concatenate([id_planes, codes_cm], axis=1)


def _frontier_kernel(tiles_q, m, r, beam, tables_ref, rows_ref, ids_ref, out_ref):
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    reps = -(-128 // r)

    for b in range(beam):
        rows = rows_ref[:, b, :]  # [tiles_q, 4r + m*r] u8
        idb = rows[:, : 4 * r].astype(jnp.int32)
        p0 = idb[:, 0 * r : 1 * r]
        p1 = idb[:, 1 * r : 2 * r]
        p2 = idb[:, 2 * r : 3 * r]
        p3 = idb[:, 3 * r : 4 * r]
        ids_ref[:, b * r : (b + 1) * r] = p0 | (p1 << 8) | (p2 << 16) | (p3 << 24)

        cd = rows[:, 4 * r :].astype(jnp.int32)  # chunk-major codes
        slices = []
        for j in range(m):
            s = cd[:, j * r : (j + 1) * r]
            if r < 128:
                s = jnp.concatenate([s] * reps, axis=1)[:, :128]
            slices.append(s)
        idx = jnp.stack(slices, axis=1).reshape(mr, 128)
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)  # ONE dynamic_gather
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        sums = vals.reshape(tiles_q, m, 128).sum(axis=1)
        out_ref[:, b * r : (b + 1) * r] = sums[:, :r]


def _frontier_kernel_r32(tiles_q, m, beam, tables_ref, rows_ref, ids_ref, out_ref):
    """r=32 fused-frontier decode with NO sub-128 lane slicing at offset > 0.

    Mosaic miscompiles 32-wide u8 lane slices at offsets >= 64 (the byte-plane
    decode dropped plane 2 at R=32 — ids silently truncated to 16 bits;
    DMA_AB_r05.json). This variant touches lanes only through op classes the
    r%64 kernels already validate on hardware: 128-aligned 128-wide slices,
    constant-index dynamic_gather (lane rotation), iota masks, and offset-0
    slices no wider than the output block.

      ids:   all 4 byte-planes fill exactly one 128-lane tile; plane k is
             brought to lanes [0:32) by rotating 32k lanes (a gather with a
             constant index vector), then shift-or'd.
      dists: chunk j's 32 codes live in lane group j%4 of 128-lane group
             j//4. Each group is fed UNSLICED as the gather index for its 4
             consecutive chunk tables; the 3 wrong-chunk lane groups are
             masked off after the gather, so the per-chunk sums land in lane
             group j%4 and a final 3-rotation reduce folds the 4 groups.
    """
    r = 32
    mr = tiles_q * m
    tab = tables_ref[...].reshape(mr, 128)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (tiles_q, 128), 1)

    def rot(x, s):
        # lane rotation via constant-index gather: out[:, l] = x[:, (l+s)%128]
        return jnp.take_along_axis(x, (lane_q + s) % 128, axis=1)

    def rot_f32(x, s):
        return pltpu.bitcast(rot(pltpu.bitcast(x, jnp.int32), s), jnp.float32)

    group = lane_q // r  # which 32-lane group each lane belongs to
    ids_acc = jnp.zeros((tiles_q, 128), jnp.int32)
    dist_acc = jnp.zeros((tiles_q, 128), jnp.float32)
    for b in range(beam):
        rows = rows_ref[:, b, :]  # [tiles_q, 128 + m*32] u8
        idb = rows[:, :128].astype(jnp.int32)  # all 4 id byte-planes
        ids128 = (
            idb | (rot(idb, 32) << 8) | (rot(idb, 64) << 16)
            | (rot(idb, 96) << 24)
        )  # lanes [0:32) hold the r ids; the rest are rotated mixtures

        cd = rows[:, 128:].astype(jnp.int32)  # chunk-major codes, m*32 lanes
        idx = jnp.stack(
            [cd[:, (j // 4) * 128 : (j // 4) * 128 + 128] for j in range(m)],
            axis=1,
        ).reshape(mr, 128)
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)  # ONE dynamic_gather
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        vals = vals.reshape(tiles_q, m, 128)
        lane_m = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1) // r
        cmod = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0) % 4
        vals = jnp.where((lane_m == cmod)[None], vals, 0.0)
        s128 = vals.sum(axis=1)  # lane group g holds sums of chunks ≡ g mod 4
        dists128 = (
            s128 + rot_f32(s128, 32) + rot_f32(s128, 64) + rot_f32(s128, 96)
        )  # lanes [0:32) hold the full per-neighbor sums
        # place beam b's 32 lanes at [b*r, (b+1)*r) and accumulate
        ids_acc = ids_acc + jnp.where(group == b, rot(ids128, -b * r), 0)
        dist_acc = dist_acc + jnp.where(group == b, rot_f32(dists128, -b * r), 0.0)
    c = beam * r
    ids_ref[...] = ids_acc[:, :c]
    out_ref[...] = dist_acc[:, :c]


@functools.partial(
    jax.jit, static_argnames=("m", "r", "beam", "tile_q", "interpret")
)
def frontier_lookup(packed_tables, rows, m, r, beam, tile_q=16, interpret=False):
    """(ids [Q, beam*r] i32, dists [Q, beam*r] f32) from fused frontier rows.

    packed_tables: [Q, m, 128] int32 (pack_tables); rows: [Q, beam, 4r+m*r]
    u8 — the gathered fused rows of each query's `beam` parents.
    """
    q = packed_tables.shape[0]
    c = beam * r
    if r == 32:
        if m % 4:
            raise ValueError(f"r=32 frontier decode needs m % 4 == 0, got m={m}")
        if c > 128:
            raise ValueError(
                f"r=32 frontier decode supports beam <= 4, got beam={beam}"
            )
        kernel = functools.partial(_frontier_kernel_r32, tile_q, m, beam)
    else:
        kernel = functools.partial(_frontier_kernel, tile_q, m, r, beam)
    q_pad = -(-q // tile_q) * tile_q
    if q_pad != q:
        packed_tables = jnp.pad(packed_tables, ((0, q_pad - q), (0, 0), (0, 0)))
        rows = jnp.pad(rows, ((0, q_pad - q), (0, 0), (0, 0)))
    ids, dists = pl.pallas_call(
        kernel,
        grid=(q_pad // tile_q,),
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
            jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, c), jnp.float32),
        ),
        interpret=interpret,
    )(packed_tables, rows)
    return ids[:q], dists[:q]


def _dma_sublanes(row_w: int) -> int:
    """Sublane count for a DMA-tiled row: ceil(row_w/128) rounded UP to a
    multiple of 8. Measured constraint of this TPU backend (bisect series,
    round 5): dynamic single-row DMAs crash the compile helper unless the
    copied block's sublane extent is a multiple of 8 (s=8, 16 compile and run
    bit-exact; s=1 — a flat [row_w] row — and s=9/34/68 abort the backend).
    The pad is dead HBM traffic: +17.6% at r=64/m=64 (34 -> 40 sublanes),
    which still leaves the in-kernel DMA ~2.5x below the 3x row traffic of
    the gather-then-decode path it replaces."""
    s_raw = -(-row_w // 128)
    return -(-s_raw // 8) * 8


def pack_frontier_rows_tiled(adj, codes):
    """pack_frontier_rows, zero-padded + reshaped to [N, s, 128] u8 with
    s % 8 == 0 — the layout the in-kernel-DMA frontier requires (see
    _dma_sublanes). Flat-view compatible: row i's first 4R + m*R bytes are
    exactly pack_frontier_rows' row i."""
    import numpy as np

    flat = pack_frontier_rows(adj, codes)
    n, row_w = flat.shape
    s = _dma_sublanes(row_w)
    out = np.zeros((n, s * 128), np.uint8)
    out[:, :row_w] = flat
    return out.reshape(n, s, 128)


def _lane_rot(x, shift):
    """out[:, l] = x[:, (l + shift) % 128] — constant-index dynamic_gather
    (the op class hardware-validated by _frontier_kernel_r32)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.take_along_axis(x, (lane + shift) % 128, axis=x.ndim - 1)


def _frontier_dma_kernel(
    tile_q, m, beam, s, parents_ref, tables_ref, rows_hbm, ids_ref, out_ref,
    scratch, sem,
):
    """r=64 decode over DMA-tiled rows [*, s, 128] (see _dma_sublanes).

    Row byte map at r=64: sublanes 0-1 = the 4 id byte-planes (plane p at
    sublane p//2, lanes (p%2)*64..); sublanes 2.. = chunk-major codes, TWO
    64-byte chunks per sublane. All lane ops are classes validated on
    hardware elsewhere: 64-wide slices at offsets {0, 64} (the flat r=64
    kernel), constant-index lane rotation + iota select (_frontier_kernel_r32),
    and the single dynamic_gather table lookup."""
    r = 64
    i = pl.program_id(0)
    base = i * tile_q * beam

    def row_dma(qi, b):
        pid = parents_ref[base + qi * beam + b]
        return pltpu.make_async_copy(
            rows_hbm.at[pid], scratch.at[qi, b], sem.at[qi, b]
        )

    # issue every parent-row DMA up front (the DMA engines run them
    # concurrently; issue cost is ~sub-microsecond each), then wait
    for qi in range(tile_q):
        for b in range(beam):
            row_dma(qi, b).start()
    for qi in range(tile_q):
        for b in range(beam):
            row_dma(qi, b).wait()

    mr = tile_q * m
    tab = tables_ref[...].reshape(mr, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, 128), 1)
    for b in range(beam):
        sub0 = scratch[:, b, 0, :].astype(jnp.int32)  # planes 0 | 1
        sub1 = scratch[:, b, 1, :].astype(jnp.int32)  # planes 2 | 3
        ids_ref[:, b * r : (b + 1) * r] = (
            sub0[:, :64]
            | (sub0[:, 64:] << 8)
            | (sub1[:, :64] << 16)
            | (sub1[:, 64:] << 24)
        )
        # chunk pair per sublane: chunk 2t at lanes [0,64), 2t+1 at [64,128).
        # Build each chunk's 128-wide gather index by pairing the sublane row
        # with its 64-lane rotation (both halves then hold that chunk's 64
        # codes, neighbor n at lanes n and n+64 — the same replication the
        # flat kernel builds with concatenate).
        chunks = []
        for t in range(m // 2):
            row128 = scratch[:, b, 2 + t, :].astype(jnp.int32)
            rot64 = _lane_rot(row128, 64)
            chunks.append(jnp.where(lane < 64, row128, rot64))  # chunk 2t
            chunks.append(jnp.where(lane < 64, rot64, row128))  # chunk 2t+1
        idx = jnp.stack(chunks, axis=1).reshape(mr, 128)
        word = jnp.take_along_axis(tab, idx >> 1, axis=1)  # ONE dynamic_gather
        shift = (idx & 1) << 4
        half = (word >> shift) & jnp.int32(0xFFFF)
        vals = pltpu.bitcast((half << 16).astype(jnp.int32), jnp.float32)
        sums = vals.reshape(tile_q, m, 128).sum(axis=1)
        out_ref[:, b * r : (b + 1) * r] = sums[:, :r]


@functools.partial(
    jax.jit, static_argnames=("m", "r", "beam", "tile_q", "interpret")
)
def frontier_lookup_dma(
    packed_tables, rows, parents, m, r, beam, tile_q=16, interpret=False
):
    """frontier_lookup with the parent-row gather INSIDE the kernel.

    The two-op path (XLA gather `fused_rows[parents]` then the decode
    kernel) writes the gathered [Q, beam, 4r+m*r] u8 intermediate to HBM
    and reads it straight back — 3x the frontier's fundamental traffic.
    Here the fused-row table stays in HBM (memory_space=ANY); the kernel
    reads each query's parent ids from scalar-prefetch SMEM and DMAs just
    those rows HBM -> VMEM scratch, so the rows cross HBM exactly once
    (plus the s%8 sublane pad, see _dma_sublanes). Covers the same
    reference behavior as frontier_lookup (BANG_Base/bang_search.cu:
    1201-1241's gather+lookup fused).

    packed_tables: [Q, m, 128] int32 (pack_tables); rows: [N, s, 128] u8
    (pack_frontier_rows_tiled, UNGATHERED); parents: [Q, beam] int32.
    Returns (ids [Q, beam*r] i32, dists [Q, beam*r] f32). r=64 only (the
    headline degree): the tiled decode maps planes/chunks onto whole
    sublanes, which needs 4r = 2 sublanes and r = half a lane row.
    """
    q = packed_tables.shape[0]
    if r != 64:
        raise ValueError(f"frontier_lookup_dma supports r=64 only, got r={r}")
    if m % 2:
        raise ValueError(f"tiled DMA decode needs m % 2 == 0, got m={m}")
    row_w = 4 * r + m * r
    s = _dma_sublanes(row_w)
    if rows.ndim != 3 or rows.shape[1:] != (s, 128):
        raise ValueError(
            f"rows must be DMA-tiled [N, {s}, 128] (pack_frontier_rows_tiled)"
            f" for r={r}, m={m}; got {rows.shape} — flat rows crash this "
            "backend's dynamic-row DMA (sublane extent must be 8-aligned)"
        )
    c = beam * r
    q_pad = -(-q // tile_q) * tile_q
    if q_pad != q:
        packed_tables = jnp.pad(packed_tables, ((0, q_pad - q), (0, 0), (0, 0)))
        parents = jnp.pad(parents, ((0, q_pad - q), (0, 0)))
    parents_flat = parents.astype(jnp.int32).reshape(q_pad * beam)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_pad // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, m, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((tile_q, c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, beam, s, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((tile_q, beam)),
        ],
    )
    ids, dists = pl.pallas_call(
        functools.partial(_frontier_dma_kernel, tile_q, m, beam, s),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, c), jnp.float32),
        ),
        interpret=interpret,
    )(parents_flat, packed_tables, rows)
    return ids[:q], dists[:q]


def pack_exact_frontier_rows_tiled(adj, vectors, norms):
    """ops/l2.pack_exact_frontier_rows, zero-padded + reshaped to
    [N, s, 128] u8 with s % 8 == 0 (see _dma_sublanes) — the layout
    exact_frontier_dma requires."""
    import numpy as np

    from bang_tpu.ops.l2 import pack_exact_frontier_rows

    flat = np.asarray(pack_exact_frontier_rows(adj, vectors, norms))
    n, row_w = flat.shape
    s = _dma_sublanes(row_w)
    out = np.zeros((n, s * 128), np.uint8)
    out[:, :row_w] = flat
    return out.reshape(n, s, 128)


def _exact_frontier_dma_kernel(
    tile_q, r, d, beam, s, parents_ref, q_ref, rows_hbm, ids_ref, out_ref,
    scratch, sem,
):
    """r=64, d%128==0 decode over DMA-tiled exact rows [*, s, 128].

    Row byte map at r=64: sublanes 0-1 = id byte-planes, sublanes 2-3 =
    f32 norm byte-planes, sublanes 4.. = u8 neighbor vectors (neighbor n at
    sublanes 4 + n*d/128 ..), so every access is whole-sublane or a 64-wide
    lane slice at offsets {0, 64} (hardware-validated op classes)."""
    i = pl.program_id(0)
    base = i * tile_q * beam
    dsub = d // 128

    def row_dma(qi, b):
        pid = parents_ref[base + qi * beam + b]
        return pltpu.make_async_copy(
            rows_hbm.at[pid], scratch.at[qi, b], sem.at[qi, b]
        )

    for qi in range(tile_q):
        for b in range(beam):
            row_dma(qi, b).start()
    for qi in range(tile_q):
        for b in range(beam):
            row_dma(qi, b).wait()

    qv = q_ref[...]  # [tile_q, d] f32
    q_norm = (qv * qv).sum(axis=-1, keepdims=True)  # [tile_q, 1]
    qv4 = qv.reshape(tile_q, 1, dsub, 128)
    for b in range(beam):
        sub0 = scratch[:, b, 0, :].astype(jnp.int32)  # id planes 0 | 1
        sub1 = scratch[:, b, 1, :].astype(jnp.int32)  # id planes 2 | 3
        ids_ref[:, b * r : (b + 1) * r] = (
            sub0[:, :64]
            | (sub0[:, 64:] << 8)
            | (sub1[:, :64] << 16)
            | (sub1[:, 64:] << 24)
        )
        nb0 = scratch[:, b, 2, :].astype(jnp.int32)  # norm planes 0 | 1
        nb1 = scratch[:, b, 3, :].astype(jnp.int32)  # norm planes 2 | 3
        norms = pltpu.bitcast(
            nb0[:, :64]
            | (nb0[:, 64:] << 8)
            | (nb1[:, :64] << 16)
            | (nb1[:, 64:] << 24),
            jnp.float32,
        )  # [tile_q, r]
        # Mosaic has no direct u8 -> f32 cast; widen through i32 (exact)
        vecs = (
            scratch[:, b, 4 : 4 + r * dsub, :]
            .reshape(tile_q, r, dsub, 128)
            .astype(jnp.int32)
            .astype(jnp.float32)
        )
        # exact f32 multiply-add on the VPU (u8 vectors are exact in f32;
        # matches l2_distance_to_candidates at Precision.HIGHEST)
        cross = (qv4 * vecs).sum(axis=(-1, -2))  # [tile_q, r]
        out_ref[:, b * r : (b + 1) * r] = jnp.maximum(
            norms - 2.0 * cross + q_norm, 0.0
        )


@functools.partial(
    jax.jit, static_argnames=("r", "d", "beam", "tile_q", "interpret")
)
def exact_frontier_dma(
    queries_f32, rows, parents, r, d, beam, tile_q=16, interpret=False
):
    """Exact-distance frontier with the parent-row gather INSIDE the kernel.

    The XLA path gathers fused exact rows ([N, 8R+R*D] u8,
    ops/l2.pack_exact_frontier_rows) into a materialized [Q, P, row] HBM
    intermediate, then decodes + einsums — the rows cross HBM three times.
    Here parent ids arrive via scalar prefetch, each row is DMA'd HBM->VMEM
    once, and ids/norms decode + the squared-L2 (exact f32 VPU multiply-add)
    happen in VMEM. Covers BANG_Exactdistance's traversal distance fetch
    (parANN.cu:1139-1179).

    queries_f32: [Q, D] f32; rows: [N, s, 128] u8
    (pack_exact_frontier_rows_tiled, UNGATHERED); parents: [Q, beam] i32.
    Returns (ids [Q, beam*r] i32, dists f32). r=64 and d % 128 == 0 only:
    the tiled decode maps id/norm planes and vectors onto whole sublanes.
    """
    q = queries_f32.shape[0]
    if r != 64:
        raise ValueError(f"exact_frontier_dma supports r=64 only, got r={r}")
    if d % 128:
        raise ValueError(
            f"exact_frontier_dma needs d % 128 == 0 (whole-sublane vectors), "
            f"got d={d}"
        )
    row_w = 8 * r + r * d
    s = _dma_sublanes(row_w)
    if rows.ndim != 3 or rows.shape[1:] != (s, 128):
        raise ValueError(
            f"rows must be DMA-tiled [N, {s}, 128] "
            f"(pack_exact_frontier_rows_tiled) for r={r}, d={d}; got "
            f"{rows.shape} — flat rows crash this backend's dynamic-row DMA"
        )
    c = beam * r
    q_pad = -(-q // tile_q) * tile_q
    if q_pad != q:
        queries_f32 = jnp.pad(queries_f32, ((0, q_pad - q), (0, 0)))
        parents = jnp.pad(parents, ((0, q_pad - q), (0, 0)))
    parents_flat = parents.astype(jnp.int32).reshape(q_pad * beam)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q_pad // tile_q,),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ],
        out_specs=(
            pl.BlockSpec((tile_q, c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, c), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, beam, s, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((tile_q, beam)),
        ],
    )
    ids, dists = pl.pallas_call(
        functools.partial(_exact_frontier_dma_kernel, tile_q, r, d, beam, s),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, c), jnp.int32),
            jax.ShapeDtypeStruct((q_pad, c), jnp.float32),
        ),
        interpret=interpret,
    )(parents_flat, queries_f32.astype(jnp.float32), rows)
    return ids[:q], dists[:q]


def frontier_decode_xla(tables, rows, m, r, beam):
    """Pure-XLA fused-frontier decode (CPU tests / non-TPU backends).

    Same contract as frontier_lookup but takes UNPACKED tables [Q, m, 256].
    """
    from bang_tpu.ops.pq import pq_lookup

    q = rows.shape[0]
    idb = rows[:, :, : 4 * r].astype(jnp.int32).reshape(q, beam, 4, r)
    ids = (
        idb[:, :, 0] | (idb[:, :, 1] << 8) | (idb[:, :, 2] << 16)
        | (idb[:, :, 3] << 24)
    ).reshape(q, beam * r)
    cd = rows[:, :, 4 * r :].reshape(q, beam, m, r)
    codes = jnp.swapaxes(cd, 2, 3).reshape(q, beam * r, m)  # [Q, C, m]
    return ids, pq_lookup(tables, codes)
