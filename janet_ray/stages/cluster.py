"""Distributed k-means over an embedding column — the corpus-clustering
primitive behind cluster-curation pipelines (SemDeDup-style embedding dedup,
cluster-balanced sampling, IVF index builds that need centroids trained on
the FULL corpus rather than a driver sample).

Each Lloyd iteration is ONE streaming pass over the corpus plus a tiny
shuffle, and the driver only ever holds k×d floats:

  1. centroids are `ray.put` once per iteration (zero-copy numpy in plasma);
  2. every batch assigns its vectors (one matmul), then pre-reduces to AT
     MOST k rows of (cell, partial vector sum, count) via ``np.add.at`` —
     the combiner: the shuffle moves O(batches × k) tiny rows, never a row
     per vector;
  3. a ``groupby(cell)`` sums the partials (k groups), the driver folds the
     k rows into new centroids (empty cells keep their old centroid), and
    early-stops when the max centroid shift drops below ``tol``.

Cosine geometry throughout (vectors and centroids L2-normalized, assignment
by max dot product) — the same metric as stages/similarity.py, so the
trained centroids drop straight into ``ivf_assign`` / ``ivf_topk``.

Initialization is deterministic farthest-point seeding over a streamed
``ds.limit(sample_size)`` sample (the r1-reviewed pattern that never
materializes the corpus). Partial sums are float64 regardless of the input
width so per-batch accumulation order cannot leak into the result at test
scale.

Not SQL-expressible (iterative refinement); pinned by a same-semantics
single-process reference in tests plus a cluster-recovery property.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from janet_ray.stages.similarity import _as_matrix, _normalize


def _farthest_point_init(sample: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-point seeding (greedy k-center, the k-means++
    idea without the randomness): start from the sample's first vector, then
    repeatedly take the point farthest (min cosine similarity) from every
    centroid chosen so far. Random choice can seed two centroids inside one
    true cluster and permanently collapse another — this cannot."""
    C = sample[:1].copy()
    best = sample @ C[0]  # max similarity to any chosen centroid, per point
    for _ in range(1, k):
        nxt = int(np.argmin(best))
        C = np.vstack([C, sample[nxt]])
        best = np.maximum(best, sample @ sample[nxt])
    return C


def _fold_centroids(rows, C_old: np.ndarray) -> np.ndarray:
    C = C_old.copy()
    for r in rows:
        n = r["n"]
        if n > 0:
            v = np.asarray(r["vsum"], dtype=np.float64) / n
            C[r["cell"]] = v / max(np.linalg.norm(v), 1e-12)
    return C


def distributed_kmeans(ds, *, vec_col: str = "embedding",
                       n_clusters: int = 8, iters: int = 10,
                       tol: float = 1e-4,
                       sample_size: int = 4096,
                       local_row_limit: int = 1_000_000) -> np.ndarray:
    """Train L2-normalized centroids on the full corpus; returns (k, d)."""
    sample = _sample_matrix(ds, vec_col, sample_size)
    C = _farthest_point_init(sample.astype(np.float64),
                             min(n_clusters, len(sample)))
    k = len(C)

    # scale-adaptive (the BPE/PageRank precedent): when the corpus fits one
    # worker (~500 MB of float64 at 1M × 64-d), run ALL Lloyd iterations in a
    # single Ray task with the SAME kernels — per-iteration groupby shuffles
    # and ray.put round-trips are pure fixed overhead at that size. The same
    # init, same assignment/sum kernels, same _fold_centroids update and the
    # same tol early-stop keep the two paths numerically aligned (pinned by
    # the forced-dispatch parity test).
    if local_row_limit and ds.count() <= local_row_limit:
        @ray.remote
        def _local(refs, C0):
            tbls = [t for t in ray.get(refs) if t.num_rows]
            if not tbls:
                return C0
            import pyarrow as _pa

            whole = _pa.concat_tables(tbls, promote_options="default")
            M = _normalize(_as_matrix(whole[vec_col])).astype(np.float64)
            Cl = C0
            kl = len(Cl)
            for _ in range(iters):
                a = np.argmax(M @ Cl.T, axis=1)
                sums = np.zeros((kl, Cl.shape[1]), dtype=np.float64)
                np.add.at(sums, a, M)
                counts = np.bincount(a, minlength=kl).astype(np.int64)
                nz = np.nonzero(counts)[0]
                rows = [{"cell": int(c), "vsum": sums[c], "n": int(counts[c])}
                        for c in nz]
                C_new = _fold_centroids(rows, Cl)
                shift = (float(np.max(np.linalg.norm(C_new - Cl, axis=1)))
                         if kl else 0.0)
                Cl = C_new
                if shift < tol:
                    break
            return Cl

        vecs = ds.map_batches(
            lambda b: pa.table({vec_col: b[vec_col]}),
            batch_format="pyarrow", zero_copy_batch=True)
        return ray.get(_local.remote(list(vecs.to_arrow_refs()), C))

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # empty upstream block → zero partials
                return pa.table({"cell": pa.array([], pa.int32()),
                                 "vsum": pa.array([], pa.list_(pa.float64())),
                                 "n": pa.array([], pa.int64())})
            cen = ray.get(ref)
            M = _normalize(_as_matrix(batch[vec_col])).astype(np.float64)
            a = np.argmax(M @ cen.T, axis=1)
            sums = np.zeros((k, cen.shape[1]), dtype=np.float64)
            np.add.at(sums, a, M)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            nz = np.nonzero(counts)[0]
            return pa.table({
                "cell": pa.array(nz.astype(np.int32)),
                "vsum": pa.array(list(sums[nz]),
                                 pa.list_(pa.float64())),
                "n": pa.array(counts[nz]),
            })

        def reduce_cell(group: pa.Table) -> pa.Table:
            vs = np.asarray(group["vsum"].to_pylist(), dtype=np.float64)
            return pa.table({
                "cell": group["cell"][:1],
                "vsum": pa.array([vs.sum(axis=0)], pa.list_(pa.float64())),
                "n": pa.array([int(np.sum(group["n"].to_numpy()))],
                              pa.int64()),
            })

        rows = (ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("cell").map_groups(reduce_cell,
                                            batch_format="pyarrow")
                .take_all())  # bounded: at most k rows
        C_new = _fold_centroids(rows, C)
        shift = float(np.max(np.linalg.norm(C_new - C, axis=1))) if k else 0.0
        C = C_new
        if shift < tol:
            break
    return C


def _sample_matrix(ds, vec_col: str, sample_size: int) -> np.ndarray:
    rows = ds.limit(sample_size).take_all()
    return _normalize(np.asarray([r[vec_col] for r in rows],
                                 dtype=np.float32))


def kmeans_assign(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """(id_col, cell) for every vector — the trained-centroid projection of
    stages/similarity.ivf_assign, payload dropped after assignment."""
    from janet_ray.stages.similarity import ivf_assign

    return ivf_assign(ds, centroids.astype(np.float32), id_col=id_col,
                      vec_col=vec_col).select_columns([id_col, "cell"])
