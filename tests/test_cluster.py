"""Distributed k-means (stages/cluster.py): exact parity with a
single-process reference implementing the same semantics, cluster recovery
on separated blobs, early stop, and empty-cell handling."""

import numpy as np
import pyarrow as pa

from janet_ray.stages.cluster import distributed_kmeans, kmeans_assign
from janet_ray.stages.similarity import _normalize


def _reference_kmeans(X, k, iters, tol):
    """Same semantics, one process: farthest-point init over the (whole)
    sample, cosine assignment, float64 mean, renormalize, empty cells keep
    their old centroid."""
    from janet_ray.stages.cluster import _farthest_point_init

    X = _normalize(X).astype(np.float64)
    C = _farthest_point_init(X, k)
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        C_new = C.copy()
        for c in range(k):
            m = X[a == c]
            if len(m):
                v = m.mean(axis=0)
                C_new[c] = v / max(np.linalg.norm(v), 1e-12)
        shift = float(np.max(np.linalg.norm(C_new - C, axis=1)))
        C = C_new
        if shift < tol:
            break
    return C


def _blob_items(n_per=60, d=8, seed=7):
    rng = np.random.RandomState(seed)
    centers = np.eye(3, d) * 10.0
    items = []
    for c in range(3):
        pts = centers[c] + rng.randn(n_per, d) * 0.1
        for i, p in enumerate(pts):
            items.append({"vec_id": c * n_per + i,
                          "embedding": p.astype(np.float32).tolist(),
                          "label": c})
    return items


def test_parity_with_reference(ray_session):
    import ray

    items = _blob_items()
    X = np.asarray([r["embedding"] for r in items], dtype=np.float32)
    ds = ray.data.from_items(items)
    C_dist = distributed_kmeans(ds, n_clusters=3, iters=6,
                                sample_size=len(items))
    C_ref = _reference_kmeans(X, 3, 6, 1e-4)
    assert np.allclose(C_dist, C_ref, atol=1e-9)
    # forced per-iteration distributed loop (local_row_limit=0) must agree
    # with both the fast path and the reference
    C_loop = distributed_kmeans(ds, n_clusters=3, iters=6,
                                sample_size=len(items), local_row_limit=0)
    assert np.allclose(C_loop, C_ref, atol=1e-9)
    assert np.allclose(C_loop, C_dist, atol=1e-9)


def test_blob_recovery_and_assignment(ray_session):
    import ray

    items = _blob_items()
    ds = ray.data.from_items(items)
    C = distributed_kmeans(ds, n_clusters=3, iters=8,
                           sample_size=len(items))
    out = kmeans_assign(ds, C).to_pandas()
    assert set(out.columns) == {"vec_id", "cell"}
    # each true blob maps to exactly one cell, and cells are distinct
    truth = {r["vec_id"]: r["label"] for r in items}
    groups = out.groupby(out["vec_id"].map(truth))["cell"].nunique()
    assert (groups == 1).all()
    assert out["cell"].nunique() == 3


def test_early_stop_converged(ray_session):
    import ray

    items = _blob_items(n_per=20)
    ds = ray.data.from_items(items)
    # huge iteration budget: must early-stop, not run 100 corpus passes
    import time

    t0 = time.time()
    C = distributed_kmeans(ds, n_clusters=3, iters=100,
                           sample_size=len(items))
    assert time.time() - t0 < 60
    assert C.shape == (3, 8)


def test_k_larger_than_corpus(ray_session):
    import ray

    items = _blob_items(n_per=2)  # 6 vectors, ask for 6 clusters max
    ds = ray.data.from_items(items)
    C = distributed_kmeans(ds, n_clusters=10, iters=2,
                           sample_size=100)
    assert len(C) == 6  # clamped to sample size
