"""Distributed PCA (stages/pca.py): single-process numpy parity, planted
low-rank recovery, whitening, and repartition robustness."""
import numpy as np
import pyarrow as pa
import pytest

from janet_ray.stages import pca


def _mk(n=240, d=12, rank=3, seed=5):
    """Data with variance concentrated in a planted rank-`rank` subspace."""
    rng = np.random.RandomState(seed)
    basis, _ = np.linalg.qr(rng.randn(d, rank))
    X = rng.randn(n, rank) * np.array([8.0, 4.0, 2.0])[:rank] @ basis.T
    X += rng.randn(n, d) * 0.05 + rng.randn(d) * 2.0   # noise + offset
    return X


def _ref_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def _ds(X, blocks=6):
    import ray.data

    t = pa.table({"vec_id": list(range(len(X))),
                  "embedding": [row.tolist() for row in X]})
    return ray.data.from_arrow(t).repartition(blocks)


def test_fit_matches_single_process_numpy(ray_session):
    X = _mk()
    m = pca.fit_pca(_ds(X), k=4)
    mean, comps, evals = _ref_pca(X, 4)
    assert m["n"] == len(X)
    np.testing.assert_allclose(m["mean"], mean, atol=1e-8)
    np.testing.assert_allclose(m["explained_var"], evals, atol=1e-8)
    np.testing.assert_allclose(m["components"], comps, atol=1e-7)
    # eigenvalue order pinned descending
    assert all(np.diff(m["explained_var"]) <= 1e-12)


def test_planted_subspace_recovered(ray_session):
    X = _mk()
    m = pca.fit_pca(_ds(X), k=3)
    # top-3 components explain nearly all variance of the rank-3 plant
    total = np.trace(np.cov(X.T, bias=True))
    assert m["explained_var"].sum() / total > 0.99


def test_transform_and_whiten(ray_session):
    X = _mk()
    ds = _ds(X)
    m = pca.fit_pca(ds, k=3)
    rows = pca.pca_transform(ds, m, whiten=True).take_all()
    P = np.asarray([r["pca"] for r in sorted(rows, key=lambda r: r["vec_id"])])
    assert P.shape == (len(X), 3)
    # whitened projections have ~unit variance per component
    np.testing.assert_allclose(P.var(axis=0), 1.0, atol=1e-2)
    # un-whitened equals the direct numpy projection
    rows = pca.pca_transform(ds, m).take_all()
    P = np.asarray([r["pca"] for r in sorted(rows, key=lambda r: r["vec_id"])])
    np.testing.assert_allclose(P, (X - m["mean"]) @ m["components"].T,
                               atol=1e-7)


def test_repartition_invariance(ray_session):
    X = _mk(n=120, d=8)
    m1 = pca.fit_pca(_ds(X, blocks=2), k=4)
    m2 = pca.fit_pca(_ds(X, blocks=11), k=4)
    np.testing.assert_allclose(m1["components"], m2["components"], atol=1e-9)
    np.testing.assert_allclose(m1["explained_var"], m2["explained_var"],
                               atol=1e-9)


def test_empty_dataset_raises(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    with pytest.raises(ValueError):
        pca.fit_pca(ds, k=2)
