"""Distributed PCA over an embedding column — the standard dimensionality
reduction / whitening step before clustering, ANN indexing, or SemDeDup at
corpus scale (classic Pearson 1901 PCA; the one-pass moment form).

Shape: the model FIT is ONE streaming corpus pass with ZERO shuffles — the
sufficient statistics (n, Σx, ΣxxT) ride Ray's aggregation tree as a single
packed float64 ndarray accumulator (the bloom.py / sketch.py AggregateFn
pattern; merge = elementwise add, so the driver receives one (1+d+d²)
vector, never per-batch pieces). The eigendecomposition runs on the driver
over the d×d covariance (d = embedding dim, tiny by contract — the corpus
length never appears in driver state). The TRANSFORM is a stateless
``map_batches`` matmul against the broadcast component matrix.

Determinism: eigenvectors have a sign ambiguity and eigh's output order is
value-dependent — both are pinned (eigenvalues sorted descending; each
component's largest-|coordinate| entry is made positive, first index on
ties) so repeated fits of the same data broadcast identical models.
Float sums across the aggregation tree are merge-order-dependent at the
1e-15 level, so the operator is rows-only by declaration; single-process
numpy parity is pytest-pinned at 1e-8.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


def fit_pca(ds, *, vec_col: str = "embedding", k: int = 8) -> dict:
    """One-pass PCA fit: {mean (d,), components (k, d), explained_var (k,),
    n}. Components are unit rows, eigenvalue-descending, sign-pinned."""
    from ray.data.aggregate import AggregateFn

    def accumulate(acc, block):
        tbl = (block if isinstance(block, pa.Table)
               else pa.Table.from_pandas(block))
        M = _as_matrix(tbl[vec_col])
        if M.size == 0:
            return acc
        d = M.shape[1]
        if acc is None:
            acc = np.zeros(1 + d + d * d, dtype=np.float64)
        acc[0] += len(M)
        acc[1:1 + d] += M.sum(axis=0)
        acc[1 + d:] += (M.T @ M).ravel()
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    agg = AggregateFn(init=lambda _: None, merge=merge, name="pca_moments",
                      accumulate_block=accumulate, finalize=lambda a: a)
    out = ds.aggregate(agg)
    acc = out["pca_moments"] if isinstance(out, dict) else out
    if acc is None:
        raise ValueError("fit_pca: empty dataset")
    d = int(round((-1 + np.sqrt(1 + 4 * (len(acc) - 1))) / 2))
    n = acc[0]
    mean = acc[1:1 + d] / n
    cov = acc[1 + d:].reshape(d, d) / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0            # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)   # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()     # (k, d)
    evals = np.maximum(evals[order], 0.0)
    # sign pin: largest-|coordinate| entry positive (first index on ties)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {"mean": mean, "components": comps, "explained_var": evals,
            "n": int(n)}


def pca_transform(ds, model: dict, *, id_col: str = "vec_id",
                  vec_col: str = "embedding", whiten: bool = False,
                  out_col: str = "pca", eps: float = 1e-9):
    """(id, out_col: list<double>) — stateless projection map; the model
    ships once (ray.put) and deserializes once per worker."""
    from janet_ray.functions.broadcast import get_broadcast

    scale = (1.0 / np.sqrt(model["explained_var"] + eps)
             if whiten else np.ones(len(model["components"])))
    mref = ray.put((model["mean"], model["components"].copy(), scale))

    def f(batch: pa.Table) -> pa.Table:
        mean, W, sc = get_broadcast(mref)
        M = _as_matrix(batch[vec_col])
        if M.size == 0:
            proj = np.empty((0, len(W)), dtype=np.float64)
        else:
            proj = (M - mean) @ W.T * sc
        return pa.table({
            id_col: batch[id_col],
            out_col: pa.array([row.tolist() for row in proj],
                              pa.list_(pa.float64())),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
