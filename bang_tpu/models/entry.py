"""Sampled entry-point selection — start each query near its target.

The reference enters every search at the dataset medoid
(bang_search.cu:466-506, parANN.cu:988-999): correct, but each query then
pays the full medoid->neighborhood walk, and traversal iterations ARE the
workload's unit of cost (each is an adjacency gather + distance pass +
merge). This module picks a per-query entry point by exact distance over a
small strided sample of the dataset: one [Q, S] MXU matmul (~1 GFLOP at
Q=10K, S=1024, D=128 — microseconds on a v5e) against a saving of several
full traversal iterations. A TPU-native extension: the sample distances ride
the MXU for free, which a one-block-per-query CUDA kernel has no cheap
analog for.

Opt-in via SearchParams(entry_mode="sampled"); "medoid" preserves exact
reference behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def sampled_entry_ids(
    queries_f32: jnp.ndarray,
    vectors: jnp.ndarray,
    vector_norms: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Per-query entry ids: nearest of a strided S-point sample. [Q] int32.

    The stride makes the sample deterministic and uniform over insertion
    order (ids carry no spatial meaning, so this is as good as random) —
    no RNG state, nothing stored in the index.
    """
    n = vectors.shape[0]
    s = int(min(n_samples, n))
    stride = max(1, n // s)
    sample_ids = (jnp.arange(s, dtype=jnp.int32) * stride) % n
    sv = vectors[sample_ids].astype(jnp.float32)  # [S, D] tiny gather
    sn = vector_norms[sample_ids].astype(jnp.float32)
    # rank-only squared L2: |v|^2 - 2 q.v (the |q|^2 term is constant per row)
    d = sn[None, :] - 2.0 * (queries_f32 @ sv.T)
    return sample_ids[jnp.argmin(d, axis=1)]
