"""Native Vamana graph construction (batched, accelerator-friendly).

The reference relies on the external DiskANN `build_disk_index` for offline
graph construction (README.md:42-58) — the graph build itself is not part of
the reference codebase. This module supplies a self-contained equivalent so
the framework covers the whole pipeline: a batched Vamana builder in the
DiskANN style (greedy-search candidate collection + alpha robust prune +
reverse-edge insertion), with the candidate searches executed by this
framework's own batched exact-distance traversal and the prune loop running
as a jit program.

Algorithm (standard Vamana):
  1. start from a random R-regular graph;
  2. for each point p (in batches): greedy-search p from the medoid over the
     current graph, collect the visited set V;
  3. adj[p] = RobustPrune(p, V ∪ adj[p], alpha, R) — greedily keep the
     nearest candidate c, discard every candidate c' with
     alpha * d(c, c') <= d(p, c');
  4. for each kept edge (p -> c): add the reverse edge c -> p, re-pruning
     c's list when it overflows R;
  5. run two passes (alpha = 1.0, then alpha_final).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np




@functools.partial(jax.jit, static_argnames=("r", "alpha"))
def _robust_prune_batch(p_vecs, cand_vecs, cand_dists, cand_valid, r, alpha):
    """Batched alpha-RNG robust prune.

    p_vecs: [B, D]; cand_vecs: [B, C, D]; cand_dists: [B, C] squared L2 to p;
    cand_valid: [B, C]. Returns (sel_idx [B, r] int32 positions into the
    candidate axis, sel_valid [B, r] bool).
    """
    b, c, _ = cand_vecs.shape
    alive = cand_valid
    big = jnp.inf

    def body(i, carry):
        alive, sel_idx, sel_valid = carry
        d = jnp.where(alive, cand_dists, big)
        pick = jnp.argmin(d, axis=1)  # [B]
        valid = jnp.take_along_axis(alive, pick[:, None], axis=1)[:, 0]
        sel_idx = sel_idx.at[:, i].set(jnp.where(valid, pick, -1))
        sel_valid = sel_valid.at[:, i].set(valid)
        # occlusion rule: drop candidates closer to the pick than (scaled) to p
        pick_vec = jnp.take_along_axis(cand_vecs, pick[:, None, None], axis=1)[:, 0]
        d_cc = ((cand_vecs - pick_vec[:, None, :]) ** 2).sum(-1)  # [B, C]
        occluded = alpha * d_cc <= cand_dists
        alive = alive & ~occluded & (
            jax.lax.broadcasted_iota(jnp.int32, (b, c), 1) != pick[:, None]
        )
        return alive, sel_idx, sel_valid

    sel_idx = jnp.full((b, r), -1, jnp.int32)
    sel_valid = jnp.zeros((b, r), jnp.bool_)
    _, sel_idx, sel_valid = jax.lax.fori_loop(
        0, r, body, (alive, sel_idx, sel_valid)
    )
    return sel_idx, sel_valid


@functools.partial(jax.jit, static_argnames=("r", "alpha"))
def _prune_rows_device(vec_dev, p_ids, safe, valid, r, alpha):
    """Device side of _prune_to_ids: gather vectors, distances, prune."""
    p_vecs = vec_dev[p_ids]
    cand_vecs = vec_dev[safe]
    cand_dists = ((cand_vecs - p_vecs[:, None, :]) ** 2).sum(-1)
    cand_dists = jnp.where(valid, cand_dists, jnp.inf)
    return _robust_prune_batch(p_vecs, cand_vecs, cand_dists, valid, r, alpha)


def _prune_to_ids(vec_dev, vectors, p_ids, cand_ids, r, alpha):
    """Run robust prune for a batch of points; returns [B, r] int32 neighbor
    ids padded with the point's own id (the search-time convention).

    Candidate vectors are gathered on device from `vec_dev`; only ids cross
    the host<->device link."""
    # dedup + drop self (host-side id bookkeeping)
    cand_ids = np.where(cand_ids == p_ids[:, None], -1, cand_ids)
    sorted_c = np.sort(cand_ids, axis=1)
    dup = np.concatenate(
        [np.zeros((len(cand_ids), 1), bool), sorted_c[:, 1:] == sorted_c[:, :-1]], axis=1
    )
    order = np.argsort(cand_ids, axis=1, kind="stable")
    undup = np.ones_like(dup)
    np.put_along_axis(undup, order, ~dup, axis=1)
    valid = (cand_ids >= 0) & undup

    safe = np.maximum(cand_ids, 0)
    sel_idx, sel_valid = _prune_rows_device(
        vec_dev,
        jnp.asarray(p_ids.astype(np.int32)),
        jnp.asarray(safe.astype(np.int32)),
        jnp.asarray(valid),
        r,
        alpha,
    )
    sel_idx = np.asarray(sel_idx)
    sel_valid = np.asarray(sel_valid)
    out = np.where(
        sel_valid, np.take_along_axis(safe, np.maximum(sel_idx, 0), axis=1), p_ids[:, None]
    ).astype(np.int32)
    return out


def build_vamana_graph(
    vectors: np.ndarray,
    r: int = 32,
    l_build: int = 48,
    alpha: float = 1.44,  # on SQUARED distances; == DiskANN's 1.2 on plain
    batch: int = 1024,
    seed: int = 0,
    n_passes: int = 2,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Build a Vamana graph. Returns (adj [N, r] self-padded, degrees, medoid).

    Candidate collection uses this framework's own batched exact search over
    the evolving graph — the build is itself a TPU workload.
    """
    from bang_tpu.formats.synthetic import medoid_of
    from bang_tpu.utils.config import SearchParams

    n = vectors.shape[0]
    rng = np.random.default_rng(seed)
    # start at half degree: the slack absorbs reverse-edge appends so that
    # only overflowing nodes need a device re-prune (DiskANN's scheme)
    r0 = max(1, r // 2)
    adj = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None], (n, r)).copy()
    adj[:, :r0] = rng.integers(0, n, size=(n, r0), dtype=np.int32)
    self_hit = adj[:, :r0] == np.arange(n, dtype=np.int32)[:, None]
    adj[:, :r0][self_hit] = (adj[:, :r0][self_hit] + 1) % n
    degrees = np.full(n, r0, np.int32)
    medoid = medoid_of(vectors)

    from bang_tpu.models.traversal import run_traversal, make_exact_distance_fn

    vec_dev = jnp.asarray(vectors.astype(np.float32))
    v64 = vectors.astype(np.float64)
    norms_dev = jnp.asarray((v64 * v64).sum(-1).astype(np.float32))
    # device-resident adjacency, updated in place (donated scatter) — the
    # host keeps a mirror for the reverse-edge bookkeeping; only the changed
    # rows cross the host<->device link each batch.
    adj_dev = jnp.asarray(adj)

    @jax.jit
    def _scatter_rows(adj_dev, rows, values):
        return adj_dev.at[rows].set(values)

    def update_rows(rows, values):
        nonlocal adj_dev
        adj[rows] = values
        adj_dev = _scatter_rows(adj_dev, jnp.asarray(rows.astype(np.int32)), jnp.asarray(values))

    alphas = [1.0] * (n_passes - 1) + [alpha]
    params = SearchParams(
        L=l_build, k=1, extra_iters=16, traversal_precision="default"
    )
    import sys
    import time as _time

    t_start = _time.time()
    order = np.arange(n)
    for pass_i, a in enumerate(alphas):
        rng.shuffle(order)
        for s in range(0, n, batch):
            if (s // batch) % 50 == 0:
                print(
                    f"[vamana] pass {pass_i} batch {s // batch}/{-(-n // batch)} "
                    f"t={_time.time() - t_start:.0f}s",
                    file=sys.stderr, flush=True,
                )
            p_ids = order[s : s + batch]
            if len(p_ids) < batch:  # keep one compiled shape
                p_ids = np.concatenate([p_ids, order[: batch - len(p_ids)]])
            # visited set of a greedy search over the evolving graph =
            # Vamana's candidate pool
            q = jnp.asarray(vectors[p_ids].astype(np.float32))
            dist_fn = make_exact_distance_fn(q, vec_dev, norms_dev)
            final = run_traversal(
                adj_dev, dist_fn, medoid, len(p_ids), params.L,
                params.max_iters, use_bloom=False,
            )
            visited = np.asarray(final.visited_ids)
            cand = np.concatenate([visited, adj[p_ids]], axis=1)
            new_rows = _prune_to_ids(vec_dev, vectors, p_ids, cand, r, a)
            degrees[p_ids] = (new_rows != p_ids[:, None]).sum(1)
            update_rows(p_ids, new_rows)

            # reverse edges: append into degree slack; prune only overflows
            _add_reverse_edges(
                vec_dev, vectors, adj, degrees, p_ids, r, a, update_rows
            )
    return adj, degrees, medoid


def _add_reverse_edges(vec_dev, vectors, adj, degrees, p_ids, r, alpha, update_rows):
    """Insert p into each selected neighbor's list. Targets with free slots
    get a plain append (host scatter + device row update); only overflowing
    targets pay a device re-prune (DiskANN's slack scheme)."""
    src = np.repeat(p_ids.astype(np.int32), r)
    dst = adj[p_ids].reshape(-1)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if len(dst) == 0:
        return
    # drop (src -> dst) pairs where dst already lists src (duplicate edges
    # would permanently waste degree slots)
    fresh = ~(adj[dst] == src[:, None]).any(1)
    src, dst = src[fresh], dst[fresh]
    if len(dst) == 0:
        return
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    t_ids, starts, counts = np.unique(dst_s, return_index=True, return_counts=True)
    t_ids = t_ids.astype(np.int64)

    free = r - degrees[t_ids]
    fits = counts <= free

    # fast path: vectorized ragged append into the self-padded tail
    if fits.any():
        f_idx = np.flatnonzero(fits)
        cnt = counts[f_idx]
        row = np.repeat(f_idx, cnt)
        col = np.concatenate([np.arange(c) for c in cnt]) if len(cnt) else np.empty(0, int)
        flat_src = np.concatenate(
            [src_s[starts[i] : starts[i] + counts[i]] for i in f_idx]
        ) if len(f_idx) else np.empty(0, np.int32)
        t_rows = t_ids[row]
        adj[t_rows, degrees[t_rows] + col] = flat_src
        degrees[t_ids[f_idx]] += cnt
        up = t_ids[f_idx]
        update_rows(_bucket_pad_ids(up), adj[_bucket_pad_ids(up)])

    # slow path: overflowing targets get candidate pool = current + incoming
    if (~fits).any():
        o_idx = np.flatnonzero(~fits)
        max_in = 2 * r
        inc = np.full((len(o_idx), max_in), -1, np.int32)
        for j, i in enumerate(o_idx):
            c = min(int(counts[i]), max_in)
            inc[j, :c] = src_s[starts[i] : starts[i] + c]
        o_ids = t_ids[o_idx]
        cand = np.concatenate([adj[o_ids], inc], axis=1)
        cap = _bucket(len(o_ids))
        if cap != len(o_ids):
            pad = cap - len(o_ids)
            o_ids = np.concatenate([o_ids, np.repeat(o_ids[-1:], pad)])
            cand = np.concatenate([cand, np.repeat(cand[-1:], pad, axis=0)])
        new_rows = _prune_to_ids(vec_dev, vectors, o_ids, cand, r, alpha)
        degrees[o_ids] = (new_rows != o_ids[:, None]).sum(1)
        update_rows(o_ids, new_rows)


def _bucket(n: int) -> int:
    return max(256, 1 << int(np.ceil(np.log2(max(n, 1)))))


def _bucket_pad_ids(ids: np.ndarray) -> np.ndarray:
    cap = _bucket(len(ids))
    if cap == len(ids):
        return ids
    return np.concatenate([ids, np.repeat(ids[-1:], cap - len(ids))])
