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
  * grouping is SCALE-ADAPTIVE (VERDICT r04 #2): below ``max_pairs`` the
    pair list is collected and union-found on the driver (the dup_clusters
    small path — pairs are a small aggregate-like result at normal dup
    rates); above it the SAME decision runs fully distributed —
    ``dedup.dup_clusters_distributed`` label-propagation components, one
    narrow (id, rep, csim) int/float join, and a coarse-partition
    per-cluster argmin (the ``cluster_keep_best_distributed`` shape with
    csim-to-centroid as the score). Only narrow rows ever shuffle; the
    embedding column moves zero times past the stateless csim map.
  * the small-path cut = one broadcast drop-set filter; the corpus never
    shuffles on either path.

Tie rule: equal centroid-similarity resolves to the smaller id (floats tie
for real on exact-duplicate vectors). Rows-only by declaration — k-means
and the keep score are float-iterative; parity vs a brute-force reference
AND driver-vs-distributed path parity are pytest-pinned
(tests/test_semdedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

DEFAULT_THRESHOLD = 0.95
# above this many dup pairs the driver union-find path auto-dispatches to
# the distributed LP-components + per-cluster argmin path (≈ tens of MB of
# edge rows — far below driver heap limits, far above any sane sandbox run)
DEFAULT_MAX_PAIRS = 2_000_000


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _fit_centroids(ds, *, vec_col: str, n_cells: int, sample_size: int):
    from janet_ray.stages.similarity import kmeans_centroids

    sample_tbl = ds.select_columns([vec_col]).limit(sample_size).take_all()
    sample = np.asarray([r[vec_col] for r in sample_tbl], dtype=np.float64)
    return _normalize(kmeans_centroids(sample, n_cells))


def _csim_to_centroid(sub: pa.Table, cents: np.ndarray,
                      vec_col: str) -> np.ndarray:
    """max-over-centroids cosine for every row — the ONE kernel both the
    driver and distributed paths use, so csim is bit-identical across them."""
    M = _normalize(np.asarray(sub[vec_col].to_pylist(), dtype=np.float64))
    return (M @ cents.T).max(axis=1)


def semdedup_keep_ids(ds, *, threshold: float = DEFAULT_THRESHOLD,
                      n_cells: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      sample_size: int = 4096,
                      max_pairs: int = DEFAULT_MAX_PAIRS) -> "ray.data.Dataset":
    """(id, csim, dup_group) for every SURVIVOR: semantic-dup groups lose all
    but their lowest-centroid-similarity member; singletons pass through
    with their group id = own id. ``csim`` is cosine to the nearest
    k-means centroid (float64); ``dup_group`` is the component min-id rep.

    Scale-adaptive: the pair list is materialized (it is consumed twice —
    once to count, once to group), and above ``max_pairs`` edges the whole
    keep/drop decision dispatches to ``semdedup_keep_ids_distributed``
    instead of collecting pairs on the driver."""
    from janet_ray.functions.broadcast import get_broadcast
    from janet_ray.stages.dedup import embedding_neardup_pairs

    cents = _fit_centroids(ds, vec_col=vec_col, n_cells=n_cells,
                           sample_size=sample_size)
    pairs = embedding_neardup_pairs(ds, threshold=threshold, id_col=id_col,
                                    vec_col=vec_col).materialize()
    if pairs.count() > max_pairs:
        return _keep_from_pairs_distributed(ds, pairs, cents,
                                            id_col=id_col, vec_col=vec_col)
    cref = ray.put(cents)
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
        csim = _csim_to_centroid(sub, get_broadcast(cref), vec_col)
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
        csim = _csim_to_centroid(kept, get_broadcast(cref), vec_col)
        reps = get_broadcast(rep_ref)
        grp = np.asarray([reps.get(int(i), int(i)) for i in kids], np.int64)
        return pa.table({id_col: pa.array(kids, pa.int64()),
                         "csim": pa.array(csim, pa.float64()),
                         "dup_group": pa.array(grp, pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def semdedup_keep_ids_distributed(ds, *,
                                  threshold: float = DEFAULT_THRESHOLD,
                                  n_cells: int = 16, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  sample_size: int = 4096,
                                  num_partitions: int = 8) -> "ray.data.Dataset":
    """Forced distributed path — identical output contract to
    ``semdedup_keep_ids`` (parity-pinned); never collects the pair list."""
    from janet_ray.stages.dedup import embedding_neardup_pairs

    cents = _fit_centroids(ds, vec_col=vec_col, n_cells=n_cells,
                           sample_size=sample_size)
    pairs = embedding_neardup_pairs(ds, threshold=threshold, id_col=id_col,
                                    vec_col=vec_col)
    return _keep_from_pairs_distributed(ds, pairs, cents, id_col=id_col,
                                        vec_col=vec_col,
                                        num_partitions=num_partitions)


def _keep_from_pairs_distributed(ds, pairs, cents: np.ndarray, *,
                                 id_col: str, vec_col: str,
                                 num_partitions: int = 8) -> "ray.data.Dataset":
    """LP components over the pair graph + distributed per-cluster argmin:
    every doc gets (id, cluster_rep) from ``dup_clusters_distributed``
    (singletons → self), csim is a stateless corpus map, the two join on id
    (narrow int/float rows only — embeddings never shuffle), and each
    cluster's winner is the (csim asc, id asc) run head inside coarse
    rep-hash partitions — the ``cluster_keep_best_distributed`` shape with
    csim as the score and argmin instead of argmax."""
    from janet_ray.functions.broadcast import get_broadcast
    from janet_ray.stages.dedup import _N_SHUFFLE_PARTS, dup_clusters_distributed
    from janet_ray.stages.joins import drop_empty_blocks

    cref = ray.put(cents)
    clusters = drop_empty_blocks(
        dup_clusters_distributed(ds, pairs, id_col=id_col,
                                 num_partitions=num_partitions))

    def csim_map(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"sid": pa.array([], pa.int64()),
                             "csim": pa.array([], pa.float64())})
        csim = _csim_to_centroid(batch, get_broadcast(cref), vec_col)
        return pa.table({"sid": pc.cast(batch[id_col], pa.int64()),
                         "csim": pa.array(csim, pa.float64())})

    csims = drop_empty_blocks(ds.map_batches(csim_map, batch_format="pyarrow",
                                             zero_copy_batch=True))
    j = clusters.join(csims, "inner", num_partitions, on=(id_col,),
                      right_on=("sid",))

    def part_map(t: pa.Table) -> pa.Table:
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        part = (np.abs(rep) % _N_SHUFFLE_PARTS).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def pick(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(group, sort_keys=[
            ("cluster_rep", "ascending"), ("csim", "ascending"),
            (id_col, "ascending")]))
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        head = np.ones(len(rep), dtype=bool)
        head[1:] = rep[1:] != rep[:-1]
        kept = t.filter(pa.array(head))
        return pa.table({id_col: pc.cast(kept[id_col], pa.int64()),
                         "csim": pc.cast(kept["csim"], pa.float64()),
                         "dup_group": pc.cast(kept["cluster_rep"],
                                              pa.int64())})

    return (j.map_batches(part_map, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("part").map_groups(pick, batch_format="pyarrow"))
