"""SemDeDup — semantic deduplication in embedding space (Abbas et al. 2023,
arXiv:2303.09540): cluster the corpus embeddings with k-means, find
within-cluster pairs whose cosine similarity exceeds a threshold, and keep
exactly one member of every semantic-duplicate group — the member with the
LOWEST cosine similarity to its cluster centroid (the paper's rule: keeping
the "outlier" capture of a duplicated concept preserves diversity that the
most-typical capture would collapse).

Composition of existing engine pieces, nothing new moves:

  * pair discovery = ``dedup.embedding_neardup_pairs`` (scale-adaptive:
    exact broadcast matmul on small corpora, IVF cell-partitioned tiled
    matmul above ``broadcast_max_rows`` — approximate exactly where the
    paper's clustering is);
  * centroids = ``similarity.kmeans_centroids`` on a streamed sample
    (deterministic fixed seed — the same coarse quantizer the IVF path
    partitions by, so the keep rule and the pair search share geometry);
  * grouping = driver union-find over the pair list (pairs are a small
    aggregate-like result — the dup_clusters scale judgement); centroid
    similarities are computed ONLY for docs that appear in some pair (one
    filtered corpus map, the cluster_keep_best pattern);
  * the cut = one broadcast drop-set filter; the corpus never shuffles.

Tie rule: equal centroid-similarity resolves to the smaller id (floats tie
for real on exact-duplicate vectors). Rows-only by declaration — k-means
and the keep score are float-iterative; parity vs a brute-force reference
is pytest-pinned (tests/test_semdedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

DEFAULT_THRESHOLD = 0.95


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def semdedup_keep_ids(ds, *, threshold: float = DEFAULT_THRESHOLD,
                      n_cells: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      sample_size: int = 4096) -> "ray.data.Dataset":
    """(id, csim, dup_group) for every SURVIVOR: semantic-dup groups lose all
    but their lowest-centroid-similarity member; singletons pass through
    with their group id = own id. ``csim`` is cosine to the nearest
    k-means centroid (float64); ``dup_group`` is the union-find min-id rep."""
    from janet_ray.functions.broadcast import get_broadcast
    from janet_ray.stages.dedup import embedding_neardup_pairs
    from janet_ray.stages.similarity import kmeans_centroids

    sample_tbl = ds.select_columns([vec_col]).limit(sample_size).take_all()
    sample = np.asarray([r[vec_col] for r in sample_tbl], dtype=np.float64)
    cents = _normalize(kmeans_centroids(sample, n_cells))
    cref = ray.put(cents)

    pairs = embedding_neardup_pairs(ds, threshold=threshold, id_col=id_col,
                                    vec_col=vec_col)
    edge_rows = pairs.take_all()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for e in edge_rows:
        a, b = find(int(e["id_a"])), find(int(e["id_b"]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    members: dict[int, list[int]] = {}
    for x in list(parent):
        members.setdefault(find(x), []).append(x)
    for r in members:
        members[r].append(r)   # the root competes too

    dup_ids = np.sort(np.fromiter(set(parent) | set(members), dtype=np.int64,
                                  count=len(parent) + len(members)))
    dref = ray.put(dup_ids)

    def project_csim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, get_broadcast(dref))
        sub = batch.filter(pa.array(mask))
        if len(sub) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "csim": pa.array([], pa.float64())})
        M = _normalize(np.asarray(sub[vec_col].to_pylist(), dtype=np.float64))
        C = get_broadcast(cref)
        csim = (M @ C.T).max(axis=1)
        return pa.table({"id": pc.cast(sub[id_col], pa.int64()),
                         "csim": pa.array(csim, pa.float64())})

    got = ds.map_batches(project_csim, batch_format="pyarrow",
                         zero_copy_batch=True).take_all()   # ∝ dup docs
    csim_of = {int(r["id"]): float(r["csim"]) for r in got}

    drop: list[int] = []
    rep_of: dict[int, int] = {}
    for rep, mem in members.items():
        # the paper's rule: keep the LOWEST similarity-to-centroid member
        win = min(mem, key=lambda i: (csim_of.get(i, 0.0), i))
        drop.extend(m for m in mem if m != win)
        rep_of[win] = rep
    drop_ref = ray.put(np.sort(np.asarray(drop, dtype=np.int64)))
    rep_ref = ray.put(rep_of)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = batch.filter(pa.array(~np.isin(ids, get_broadcast(drop_ref))))
        kids = kept[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(kids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "csim": pa.array([], pa.float64()),
                             "dup_group": pa.array([], pa.int64())})
        M = _normalize(np.asarray(kept[vec_col].to_pylist(),
                                  dtype=np.float64))
        C = get_broadcast(cref)
        csim = (M @ C.T).max(axis=1)
        reps = get_broadcast(rep_ref)
        grp = np.asarray([reps.get(int(i), int(i)) for i in kids], np.int64)
        return pa.table({id_col: pa.array(kids, pa.int64()),
                         "csim": pa.array(csim, pa.float64()),
                         "dup_group": pa.array(grp, pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
