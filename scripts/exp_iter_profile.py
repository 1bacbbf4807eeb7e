"""Per-op profile of the inmemory traversal iteration at the 1M bench
operating point (Q=10K, L=12, beam=2, R=64, m=64, nbr_codes aligned layout).

Times each stage of make_step's body with realistic inputs, inside fori_loops
(the tunnel adds ~30 ms per dispatch). Identifies where the 12 ms/iter goes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bang_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from bang_tpu.models.index import device_index_from_files
from bang_tpu.ops.merge import merge_worklist, select_parents_beam
from bang_tpu.ops.pq import pq_distance_tables
from bang_tpu.ops.pq_pallas import pack_tables, pq_lookup_packed
from bang_tpu.ops.visited import exact_new_mask, first_occurrence_mask_blocks

PREFIX = "/root/repo/bench_data/synth_v2_n1000000_d128_r64_m64_vamana"
Q, L, BEAM, MI = 10_000, 12, 2, 24  # max_iters = L + extra(12) = 24
ITERS = 20

index = device_index_from_files(PREFIX, variant="inmemory")
rng = np.random.default_rng(0)
queries = jnp.asarray(rng.normal(120, 30, (Q, 128)).astype(np.float32))
tables = pq_distance_tables(index.codebook, queries)
packed = jax.jit(pack_tables)(tables)

parents = jnp.asarray(rng.integers(0, index.n, (Q, BEAM), dtype=np.int32))
wl_ids = jnp.asarray(rng.integers(0, index.n, (Q, L), dtype=np.int32))
wl_dist = jnp.sort(jnp.asarray(rng.normal(2000, 300, (Q, L)).astype(np.float32)), axis=1)
wl_vis = jnp.asarray(rng.random((Q, L)) < 0.5)
visited = jnp.asarray(rng.integers(0, index.n, (Q, MI * BEAM), dtype=np.int32))
adj = index.adj
nbr_codes = index.nbr_codes
C = BEAM * adj.shape[1]


def timed(name, fn, *args):
    out = jax.device_get(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)/ITERS*1000:8.3f} ms/iter", flush=True)


def loop(body, n_args):
    @jax.jit
    def run(*args):
        def step(i, acc):
            p = (args[0] + i) % index.n  # perturb parents per step
            return acc + body(p, *args[1:]).sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.float32))

    return run


# 1. adjacency gather
timed("adj gather [Q,beam]->[Q,C]", loop(lambda p, a: a[p].reshape(Q, C), 2), parents, adj)

# 2. nbr_codes aligned gather
timed("nbr_codes gather [Q,beam,R,m]",
      loop(lambda p, nc: nc[p].astype(jnp.float32), 2), parents, nbr_codes)

# 3. code gather + pallas lookup
timed("nbr_codes gather + lookup",
      loop(lambda p, nc, pk: pq_lookup_packed(pk, nc[p].reshape(Q, C, 64)), 3),
      parents, nbr_codes, packed)

# 4. dedup: exact_new_mask + first-occurrence
def dedup(p, a, wl, vis):
    cand = a[p].reshape(Q, C)
    new = exact_new_mask(cand, wl, vis)
    return new & first_occurrence_mask_blocks(cand, BEAM)

timed("adj gather + dedup masks", loop(dedup, 4), parents, adj, wl_ids, visited)

# 5. merge + select
def merge_sel(p, a, wd, wi, wv):
    cand = a[p].reshape(Q, C)
    dist = (cand % 997).astype(jnp.float32)
    nwd, nwi, nwv = merge_worklist(wd, wi, wv, dist, cand)
    parents2, valid, active, nwv = select_parents_beam(nwd, nwi, nwv, BEAM)
    return parents2 + nwi.sum(1, keepdims=True)

timed("adj gather + merge + select", loop(merge_sel, 5), parents, adj, wl_dist, wl_ids, wl_vis)

# 6. everything EXCEPT lookup (gather+dedup+merge+select)
def no_lookup(p, a, wl, vis, wd, wv):
    cand = a[p].reshape(Q, C)
    new = exact_new_mask(cand, wl, vis) & first_occurrence_mask_blocks(cand, BEAM)
    dist = jnp.where(new, (cand % 997).astype(jnp.float32), jnp.inf)
    nwd, nwi, nwv = merge_worklist(wd, wl, wv, dist, cand)
    p2, valid, active, nwv = select_parents_beam(nwd, nwi, nwv, BEAM)
    return p2

timed("full iter minus PQ", loop(no_lookup, 6), parents, adj, wl_ids, visited, wl_dist, wl_vis)

# 7. full iteration
def full(p, a, nc, pk, wl, vis, wd, wv):
    cand = a[p].reshape(Q, C)
    new = exact_new_mask(cand, wl, vis) & first_occurrence_mask_blocks(cand, BEAM)
    raw = pq_lookup_packed(pk, nc[p].reshape(Q, C, 64))
    dist = jnp.where(new, raw, jnp.inf)
    nwd, nwi, nwv = merge_worklist(wd, wl, wv, dist, cand)
    p2, valid, active, nwv = select_parents_beam(nwd, nwi, nwv, BEAM)
    return p2

timed("FULL iteration", loop(full, 8), parents, adj, nbr_codes, packed,
      wl_ids, visited, wl_dist, wl_vis)
