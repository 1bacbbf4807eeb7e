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

from bang_tpu.constants import INVALID_ID


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


def _prune_to_ids(vectors, p_ids, cand_ids, r, alpha):
    """Run robust prune for a batch of points; returns [B, r] int32 neighbor
    ids padded with the point's own id (the search-time convention)."""
    p_vecs = jnp.asarray(vectors[p_ids].astype(np.float32))
    valid = cand_ids >= 0
    # dedup + drop self
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
    cand_vecs = jnp.asarray(vectors[safe].astype(np.float32))
    cand_dists = ((cand_vecs - p_vecs[:, None, :]) ** 2).sum(-1)
    cand_dists = jnp.where(jnp.asarray(valid), cand_dists, jnp.inf)
    sel_idx, sel_valid = _robust_prune_batch(
        p_vecs, cand_vecs, cand_dists, jnp.asarray(valid), r, alpha
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
    alpha: float = 1.2,
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
    adj = rng.integers(0, n, size=(n, r), dtype=np.int32)
    self_hit = adj == np.arange(n, dtype=np.int32)[:, None]
    adj[self_hit] = (adj[self_hit] + 1) % n
    degrees = np.full(n, r, np.int32)
    medoid = medoid_of(vectors)

    from bang_tpu.models.traversal import run_traversal, make_exact_distance_fn

    vec_dev = jnp.asarray(vectors.astype(np.float32))
    v64 = vectors.astype(np.float64)
    norms_dev = jnp.asarray((v64 * v64).sum(-1).astype(np.float32))

    alphas = [1.0] * (n_passes - 1) + [alpha]
    params = SearchParams(
        L=l_build, k=1, extra_iters=16, traversal_precision="default"
    )
    order = np.arange(n)
    for a in alphas:
        rng.shuffle(order)
        for s in range(0, n, batch):
            p_ids = order[s : s + batch]
            # visited set of a greedy search over the evolving graph =
            # Vamana's candidate pool
            q = jnp.asarray(vectors[p_ids].astype(np.float32))
            dist_fn = make_exact_distance_fn(q, vec_dev, norms_dev)
            final = run_traversal(
                jnp.asarray(adj), dist_fn, medoid, len(p_ids), params.L,
                params.max_iters, use_bloom=False,
            )
            visited = np.asarray(final.visited_ids)
            cand = np.concatenate([visited, adj[p_ids]], axis=1)
            adj[p_ids] = _prune_to_ids(vectors, p_ids, cand, r, a)

            # reverse edges with overflow re-prune
            _add_reverse_edges(vectors, adj, p_ids, r, a)
    return adj, degrees, medoid


def _add_reverse_edges(vectors, adj, p_ids, r, alpha):
    """Insert p into each selected neighbor's list; re-prune overflowing
    lists. In-place on adj."""
    targets = {}
    for p in p_ids:
        for c in adj[p]:
            c = int(c)
            if c != p:
                targets.setdefault(c, []).append(int(p))
    if not targets:
        return
    t_ids = np.fromiter(targets.keys(), dtype=np.int64)
    # candidate pool per target: current list + incoming reverse edges
    max_in = max(len(v) for v in targets.values())
    cand = np.full((len(t_ids), r + max_in), -1, np.int32)
    cand[:, :r] = adj[t_ids]
    for j, t in enumerate(t_ids):
        inc = targets[int(t)]
        cand[j, r : r + len(inc)] = inc
    adj[t_ids] = _prune_to_ids(vectors, t_ids.astype(np.int64), cand, r, alpha)
