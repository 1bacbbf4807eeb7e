"""Worklist (best-L set) maintenance: sorted merge and parent selection.

Re-design of the reference's three cooperative kernels —
`compute_BestLSets_par_sort_msort` (per-query parallel merge sort of the R+1
candidates, BANG_Base/bang_search.cu:1533-1585), `compute_BestLSets_par_merge`
(shared-memory merge into the length-L worklist, :1605-1715), and
`compute_parent1/2` (next-parent selection, :1384-1521) — as two fixed-shape
XLA ops:

  * merge_worklist: a single stable `lax.sort` of concat(worklist, candidates)
    by distance with (id, visited) carried as co-sorted operands, sliced to L.
    One sort subsumes both the candidate msort and the worklist merge.
  * select_parents_beam: the next `beam` parents are the first unvisited
    worklist entries (top-k over the unvisited mask of the distance-sorted
    list); they are marked visited in place, and a query stays active while
    any unvisited entry remains — the reference's `d_nextIter` global flag is
    `active.any()`. beam=1 reproduces the reference's single-parent schedule.

Empty slots carry id INVALID_ID, distance +inf, visited=True, so they sort to
the tail and are never selected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bang_tpu.constants import INVALID_ID


def init_worklist(q: int, l: int):
    """Empty worklist state: (+inf distances, INVALID_ID, visited=True)."""
    return (
        jnp.full((q, l), jnp.inf, dtype=jnp.float32),
        jnp.full((q, l), INVALID_ID, dtype=jnp.int32),
        jnp.ones((q, l), dtype=jnp.bool_),
    )


def merge_worklist(
    wl_dist: jnp.ndarray,
    wl_ids: jnp.ndarray,
    wl_vis: jnp.ndarray,
    cand_dist: jnp.ndarray,
    cand_ids: jnp.ndarray,
):
    """Merge candidates into the sorted worklist, keeping the best L.

    cand_dist must already be +inf for filtered-out lanes. Returns the new
    (wl_dist, wl_ids, wl_vis), each [Q, L].
    """
    l = wl_dist.shape[1]
    keys = jnp.concatenate([wl_dist, cand_dist], axis=1)
    ids = jnp.concatenate([wl_ids, cand_ids], axis=1)
    vis = jnp.concatenate([wl_vis, jnp.zeros_like(cand_ids, dtype=jnp.bool_)], axis=1)
    sk, si, sv = jax.lax.sort((keys, ids, vis), dimension=1, num_keys=1, is_stable=True)
    sk, si, sv = sk[:, :l], si[:, :l], sv[:, :l]
    # Slots holding INVALID_ID must stay non-selectable.
    sv = sv | (si == INVALID_ID)
    return sk, si, sv


def select_parents_beam(
    wl_dist: jnp.ndarray, wl_ids: jnp.ndarray, wl_vis: jnp.ndarray, beam: int
):
    """Pick the first `beam` unvisited worklist entries per query and mark
    them visited.

    Multi-parent expansion — the reference expands one parent per iteration
    and notes wider expansion as future work (bang_search.cu:776-778); on TPU
    a wider beam amortizes the per-iteration sort/filter cost and divides the
    sequential iteration count. beam=1 reproduces the reference schedule.

    Returns (parents [Q, beam] i32 — 0-filled where invalid; valid [Q, beam]
    bool; active [Q] bool; updated wl_vis).
    """
    q, l = wl_vis.shape
    unvis = ~wl_vis
    pos = jax.lax.broadcasted_iota(jnp.int32, (q, l), 1)
    # keys: earlier unvisited slots first; visited slots sink below -(l+1)
    key = jnp.where(unvis, -pos, jnp.int32(-(l + 2)))
    topk, topi = jax.lax.top_k(key, beam)
    valid = topk > jnp.int32(-(l + 2))
    parents = jnp.take_along_axis(wl_ids, topi, axis=1)
    parents = jnp.where(valid, parents, 0)
    rows = jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32)[:, None], (q, beam))
    mark_idx = jnp.where(valid, topi, l)  # out-of-bounds lanes dropped
    wl_vis = wl_vis.at[rows, mark_idx].set(True, mode="drop")
    active = valid[:, 0]
    return parents, valid, active, wl_vis
