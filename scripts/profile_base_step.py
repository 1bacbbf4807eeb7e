"""Decompose the Base device step's cost per component at a given operating
point (round-3 verdict #4: the step was ~10x the reference's implied
per-iteration cost at the L=512 ceiling — find out where it goes).

Times each component of models/base._base_step in isolation with the
chained-slope method (N executions inside ONE fori_loop program; the slope
cancels dispatch/RPC constants, which dwarf sub-ms ops through a dev
tunnel): the PQ code gather+lookup, the exact-dedup mask, the worklist
merge-sort, parent selection, and the parent exact-distance. Each chain body
threads a RUNTIME-dependent (but value-neutral) jnp.roll of its input so XLA
cannot hoist or fold the repeated op.

Writes STEP_PROFILE_r04.json: per-op ms at each L on the grid, plus the
fraction of the summed step each op accounts for — the evidence for whether
the L=512 sort dominates (in which case the R=64 graph's L~100 operating
point dissolves the gap) or the gather does.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def slope_ms(run, n_lo=1, n_hi=33):
    """(t(n_hi) - t(n_lo)) / (n_hi - n_lo), synced via device_get (axon's
    block_until_ready is a no-op; see PROGRESS.md measured facts)."""
    jax.device_get(run(n_lo))  # compile both chain lengths outside timing
    jax.device_get(run(n_hi))

    def timed(n):
        t0 = time.perf_counter()
        jax.device_get(run(n))
        return time.perf_counter() - t0

    t1 = min(timed(n_lo) for _ in range(3))
    tn = min(timed(n_hi) for _ in range(3))
    return max(0.0, (tn - t1) / (n_hi - n_lo) * 1000.0)


def rolled(x, dep):
    """Shift x by a runtime-dependent (always tiny) amount so the chain body
    really re-executes: dep is a traced array; the shift is its sum mod 2."""
    return jnp.roll(x, dep.astype(jnp.int32).sum() % 2, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=1250,
                    help="sub-batch size (10K queries / 8 pipeline batches)")
    ap.add_argument("--beam", type=int, default=2)
    ap.add_argument("--r", type=int, default=64)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--n", type=int, default=10_000_000,
                    help="code-table rows resident in HBM for the gather")
    ap.add_argument("--extra", type=int, default=24)
    ap.add_argument("--l-grid", type=int, nargs="+",
                    default=(64, 128, 256, 512))
    ap.add_argument("--out", default="/root/repo/STEP_PROFILE_r04.json")
    args = ap.parse_args()

    from bang_tpu.ops.merge import init_worklist, merge_worklist, \
        merge_worklist_ranked, select_parents_beam
    from bang_tpu.ops.pq import pq_distance_tables, pq_lookup, \
        prepare_pq_codebook
    from bang_tpu.ops.pq_pallas import pack_tables, pq_lookup_packed

    on_tpu = jax.default_backend() == "tpu"
    from bang_tpu.ops.visited import exact_new_mask

    rng = np.random.default_rng(0)
    q, beam, r, m, d, n = args.q, args.beam, args.r, args.m, args.d, args.n
    c = beam * r

    queries = jnp.asarray(rng.normal(size=(q, d)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 256, size=(n, m), dtype=np.uint8))
    pivots = rng.normal(size=(256, d)).astype(np.float32)
    offs = np.linspace(0, d, m + 1).astype(np.int64)
    cb = prepare_pq_codebook(pivots, np.zeros(d, np.float32), offs)
    tables = pq_distance_tables(cb, queries)
    # the Mosaic kernel only lowers on TPU; the CPU path (smoke tests) uses
    # the XLA lookup — the measured TABLE is always produced on TPU
    packed = pack_tables(tables) if on_tpu else tables
    lookup = pq_lookup_packed if on_tpu else pq_lookup
    base_cand = jnp.asarray(rng.integers(0, n, size=(q, c), dtype=np.int32))
    parent_fp = jnp.asarray(rng.normal(size=(q, beam, d)).astype(np.float32))
    jax.device_get(codes[0, 0])  # force residency before timing

    @functools.partial(jax.jit, static_argnums=0)
    def run_lookup(nn, packed, codes, cand0):
        def body(i, carry):
            dd, cand = carry
            d2 = lookup(packed, codes[cand])
            return (d2, rolled(cand0, d2))
        dd, _ = jax.lax.fori_loop(
            0, nn, body, (jnp.zeros((q, c), jnp.float32), cand0))
        return dd.sum()

    # fused frontier rows (the inmemory hot path): ONE gather per parent
    # yields ids + PQ distances (ops/pq_pallas.frontier_lookup)
    run_frontier = None
    if r % 64 == 0:
        from bang_tpu.ops.pq_pallas import (
            frontier_decode_xla, frontier_lookup, pack_frontier_rows,
        )

        # smaller node count for the packed table (n x r x (4+m) bytes would
        # be 10x the code matrix); gather cost is row-count bound, not
        # table-size bound, so n/10 nodes keep the measurement representative
        adj_small = rng.integers(0, n // 10, size=(n // 10, r), dtype=np.int32)
        codes_small = rng.integers(0, 256, size=(n // 10, m), dtype=np.uint8)
        frows = jnp.asarray(pack_frontier_rows(adj_small, codes_small))
        parents0 = jnp.asarray(
            rng.integers(0, n // 10, size=(q, beam), dtype=np.int32))
        jax.device_get(frows[0, 0])
        tbl = pq_distance_tables(cb, queries)
        ftab = pack_tables(tbl) if on_tpu else tbl

        @functools.partial(jax.jit, static_argnums=0)
        def _run_frontier_jit(nn, ftab, frows, p0):
            def body(i, carry):
                dd, p = carry
                rows = frows[p]
                if on_tpu:
                    ids, d2 = frontier_lookup(ftab, rows, m, r, beam)
                else:
                    ids, d2 = frontier_decode_xla(ftab, rows, m, r, beam)
                return (d2, rolled(p0, d2))
            dd, _ = jax.lax.fori_loop(
                0, nn, body, (jnp.zeros((q, c), jnp.float32), p0))
            return dd.sum()

        def run_frontier(nn):
            return _run_frontier_jit(nn, ftab, frows, parents0)

    def profile_at(l):
        mi = (l + args.extra)
        w = mi * beam
        wl_d0, wl_i0, wl_v0 = init_worklist(q, l)
        # worklists are sorted by invariant (merge_worklist_ranked relies on it)
        wl_d0 = jnp.sort(
            jnp.asarray(rng.normal(size=(q, l)).astype(np.float32) ** 2), axis=1)
        wl_i0 = jnp.asarray(rng.integers(0, n, size=(q, l), dtype=np.int32))
        visited = jnp.asarray(rng.integers(0, n, size=(q, w), dtype=np.int32))
        dists0 = jnp.asarray(rng.normal(size=(q, c)).astype(np.float32) ** 2)

        @functools.partial(jax.jit, static_argnums=0)
        def run_mask(nn, cand0, wl_ids, vis):
            def body(i, carry):
                _, cand = carry
                mask = exact_new_mask(cand, wl_ids, vis)
                return (mask, rolled(cand0, mask))
            mk, _ = jax.lax.fori_loop(
                0, nn, body, (jnp.zeros((q, c), jnp.bool_), cand0))
            return mk.sum()

        @functools.partial(jax.jit, static_argnums=0)
        def run_merge(nn, wl, dist, cand):
            def body(i, wl):
                return merge_worklist(*wl, dist, cand, impl="sort")
            wl = jax.lax.fori_loop(0, nn, body, wl)
            return wl[0].sum()

        @functools.partial(jax.jit, static_argnums=0)
        def run_merge_ranked(nn, wl, dist, cand):
            def body(i, wl):
                return merge_worklist_ranked(*wl, dist, cand)
            wl = jax.lax.fori_loop(0, nn, body, wl)
            return wl[0].sum()

        @functools.partial(jax.jit, static_argnums=0)
        def run_select(nn, wl_d, wl_i, wl_v):
            def body(i, carry):
                s, wl_v = carry
                p, v, a, wl_v2 = select_parents_beam(wl_d, wl_i, wl_v, beam)
                return (s + p.sum(), wl_v2)
            s, _ = jax.lax.fori_loop(0, nn, body, (jnp.int32(0), wl_v))
            return s

        @functools.partial(jax.jit, static_argnums=0)
        def run_parent_l2(nn, fp0, qs):
            def body(i, carry):
                _, fp = carry
                pd = ((fp - qs[:, None, :]) ** 2).sum(-1)
                return (pd, rolled(fp0, pd))
            pd, _ = jax.lax.fori_loop(
                0, nn, body, (jnp.zeros((q, beam), jnp.float32), fp0))
            return pd.sum()

        row = {
            "lookup_gather_ms": slope_ms(
                lambda nn: run_lookup(nn, packed, codes, base_cand)),
            "frontier_fused_ms": (
                slope_ms(run_frontier) if run_frontier is not None else None),
            "dedup_mask_ms": slope_ms(
                lambda nn: run_mask(nn, base_cand, wl_i0, visited)),
            "merge_sort_ms": slope_ms(
                lambda nn: run_merge(nn, (wl_d0, wl_i0, wl_v0), dists0,
                                     base_cand)),
            "merge_ranked_ms": slope_ms(
                lambda nn: run_merge_ranked(nn, (wl_d0, wl_i0, wl_v0), dists0,
                                            base_cand)),
            "select_parents_ms": slope_ms(
                lambda nn: run_select(nn, wl_d0, wl_i0, wl_v0),
                n_hi=min(33, max(3, l // 2))),
            "parent_l2_ms": slope_ms(
                lambda nn: run_parent_l2(nn, parent_fp, queries)),
        }
        # sum over the scattered-path components (frontier_fused and
        # merge_ranked are ALTERNATIVES to lookup_gather / merge_sort)
        row["sum_ms"] = round(
            sum(v for k2, v in row.items()
                if v is not None
                and k2 not in ("frontier_fused_ms", "merge_ranked_ms")), 4)
        for k2 in list(row):
            if k2 != "sum_ms" and row[k2] is not None:
                row[k2] = round(row[k2], 4)
        return row

    out = {
        "shapes": {"q": q, "beam": beam, "r": r, "m": m, "d": d, "n": n},
        "method": "chained-slope (fori_loop), min of 3, device_get sync",
        "per_L": {},
    }
    for l in args.l_grid:
        out["per_L"][str(l)] = profile_at(l)
        print(f"[profile] L={l}: {out['per_L'][str(l)]}", flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("[profile] written " + args.out, flush=True)


if __name__ == "__main__":
    main()
