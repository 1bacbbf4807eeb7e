"""Accelerated builders must match the numpy reference implementations."""

import numpy as np

from bang_tpu.formats import synthetic
from bang_tpu.formats.accel import (
    build_knn_graph_jax,
    compute_groundtruth_jax,
    encode_pq_jax,
)


def test_groundtruth_matches_numpy():
    data = synthetic.make_clustered_data(3000, 24, n_clusters=8, seed=0)
    q = data[:50].astype(np.float32) + 0.01
    ids_np, d_np = synthetic.compute_groundtruth(data, q, 5)
    ids_j, d_j = compute_groundtruth_jax(data, q, 5, block=32)
    np.testing.assert_allclose(d_j, d_np, rtol=1e-4, atol=1e-3)
    # ids may differ on exact ties; distances define correctness
    same = (ids_j == ids_np).mean()
    assert same > 0.99


def test_knn_graph_no_self_edges():
    data = synthetic.make_clustered_data(1000, 16, n_clusters=4, seed=1)
    adj, degrees = build_knn_graph_jax(data, 12, n_random=2, seed=1, block=128)
    assert adj.shape == (1000, 12)
    assert (adj != np.arange(1000)[:, None]).all()
    assert (degrees == 12).all()
    # kNN part should match numpy's neighbor sets closely
    adj_np, _ = synthetic.build_knn_graph(data, 12, n_random=2, seed=1)
    overlap = np.mean(
        [len(set(adj[i, :10]) & set(adj_np[i, :10])) / 10 for i in range(200)]
    )
    assert overlap > 0.9, overlap


def test_encode_pq_matches_numpy():
    data = synthetic.make_clustered_data(2000, 20, n_clusters=8, seed=2)
    pq = synthetic.train_pq(data, m=5, seed=2)
    codes_np = synthetic.encode_pq(data, pq)
    codes_j = encode_pq_jax(data, pq, block=512)
    agree = (codes_np == codes_j).mean()
    assert agree > 0.995, agree
