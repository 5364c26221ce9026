"""Product-quantization ANN (Jégou, Douze & Schmid, TPAMI 2011) — the memory
scale path for similarity search past IVF (SURVEY.md §2.11).

Why this exists at 100 TB: a 10^12-vector corpus of 256-dim float32 embeddings
is ~1 PB of raw vectors — it cannot be rescanned per query wave, and even the
IVF cells' member vectors dominate object-store spill. PQ compresses each
vector to ``m`` uint8 codes (m=8 → 32× smaller than 256-dim float32, 128× vs
float64): the CODES table becomes the resident search structure, and search is
table lookups (ADC) instead of matmuls against raw floats. The raw embedding
column is read ONCE at encode time and never again.

Pieces (all composition-friendly with the existing IVF machinery in
``similarity.py``):

- ``pq_train(sample, m, n_codes)`` — driver-side per-subspace Lloyd fit on a
  bounded sample (same contract as ``similarity.kmeans_centroids``: the
  codebook is the broadcast small side, (m, 256, d/m) floats ≈ KBs).
- ``pq_encode(ds, codebooks)`` — one streaming ``map_batches`` pass: per
  subspace a vectorized argmin over ‖x_j − C_j‖², emitting
  ``(id, code: list<uint8>)``. Deterministic (ties → lowest code), so codes
  are rerun/resume-stable and shared between the flat-ADC and IVF paths.
- ``pq_topk(codes_ds, codebooks, queries, k)`` — asymmetric distance (ADC):
  per query a (m, n_codes) lookup table of exact ‖q_j − C_j[c]‖², batch
  distance = Σ_j LUT[j, code_j] via fancy indexing; per-batch partial top-k
  (only q×k rows reach the shuffle) → ``groupby(query_id)`` reduce, the
  brute_force_topk pattern.
- ``ivfpq_topk(ds, queries, centroids, codebooks, nprobe)`` — IVF cell
  assignment as the routing key + PQ codes as the scan payload: non-probed
  rows are dropped BEFORE any distance work. Codes are computed on raw
  vectors (not residuals), trading a little quantization error for
  cell-independent codes — one persisted codes table serves any
  centroid set / nprobe, and re-clustering never forces a re-encode.

Cosine note: corpus and query vectors are L2-normalized first, so ADC's
squared-L2 ranking is exactly the cosine ranking (‖a−b‖² = 2 − 2·cos on the
unit sphere). Approximate by design (recall < 1); parity vs an exact numpy
ADC reference plus recall-vs-brute-force floors are pinned in
tests/test_pq.py. Reference anchor: this generalizes the reference's
Meilisearch "relevant docs fast" role (apps/search/src/useSearch.ts:205) the
same way ivf_topk does — retrieval quality knobs live server-side there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pa_pq

import ray
import ray.data

from janet_ray.functions.broadcast import get_broadcast
from janet_ray.stages.similarity import _as_matrix, _normalize, ivf_assign


def pq_train(sample: np.ndarray, *, m: int = 4, n_codes: int = 256,
             iters: int = 10, seed: int = 0xA9) -> np.ndarray:
    """→ codebooks (m, n_codes, d/m) float64. Per-subspace Lloyd's k-means on
    a driver-side bounded sample (normalized). ``d % m == 0`` required — at
    production dims pick m ∈ {8, 16, 32}; raising beats silently padding."""
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n_codes > 256:
        raise ValueError("n_codes must fit uint8 (<= 256)")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        X = sample[:, j * dsub:(j + 1) * dsub]
        idx = rng.choice(n, size=min(n_codes, n), replace=False)
        C = X[idx].copy()
        for _ in range(iters):
            # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² constant per row for argmin
            d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = X[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j, :len(C)] = C
        if len(C) < n_codes:
            # duplicate the first centroid into unused slots (argmin still
            # deterministic: ties resolve to the lowest code)
            books[j, len(C):] = C[0]
    return books


def _encode_matrix(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized → (n, m) uint8 codes, vectorized per subspace."""
    m, n_codes, dsub = books.shape
    codes = np.empty((len(M), m), dtype=np.uint8)
    for j in range(m):
        X = M[:, j * dsub:(j + 1) * dsub]
        C = books[j]
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(ds: "ray.data.Dataset", codebooks: np.ndarray, *,
              id_col: str = "vec_id", vec_col: str = "embedding",
              keep_cols: tuple[str, ...] = ()) -> "ray.data.Dataset":
    """→ Dataset(id, code: list<uint8> [, keep_cols…]) — the compressed search
    structure. One streaming pass; the raw vector column is dropped here and
    never shipped again."""
    ref = ray.put(np.ascontiguousarray(codebooks))

    def encode(batch: pa.Table) -> pa.Table:
        books = get_broadcast(ref)
        M = _normalize(_as_matrix(batch[vec_col]))
        codes = _encode_matrix(M, books)
        cols = {id_col: batch[id_col],
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), codes.shape[1])}
        for c in keep_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def _luts(Q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(q, d) normalized queries → (q, m, n_codes) exact ‖q_j − C_j[c]‖²."""
    m, n_codes, dsub = books.shape
    q = len(Q)
    lut = np.empty((q, m, n_codes), dtype=np.float64)
    for j in range(m):
        Xq = Q[:, j * dsub:(j + 1) * dsub]           # (q, dsub)
        C = books[j]                                  # (n_codes, dsub)
        lut[:, j, :] = ((Xq * Xq).sum(axis=1, keepdims=True)
                        - 2.0 * (Xq @ C.T) + (C * C).sum(axis=1))
    return lut


def _codes_matrix(col, m: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            return np.empty((0, m), dtype=np.uint8)
        arr = pa.concat_arrays(arr.chunks)
    if isinstance(arr, pa.FixedSizeListArray):
        # flatten() (not .values) respects a nonzero slice offset
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), m).astype(np.uint8, copy=False)
    return np.asarray(arr.to_pylist(), dtype=np.uint8)


def _adc_partial_fn(ref, *, k: int, id_col: str, exclude_self: bool):
    def partial(batch: pa.Table) -> pa.Table:
        q_ids, luts, cell_queries = get_broadcast(ref)
        out_q, out_n, out_d = [], [], []
        if batch.num_rows:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            m = luts.shape[1]
            codes = _codes_matrix(batch["code"], m)
            sub = np.arange(m)
            if cell_queries is None:
                groups = [(None, np.arange(len(ids)))]
            else:
                cells = np.asarray(batch["cell"].to_pylist(), dtype=np.int32)
                groups = [(int(c), np.nonzero(cells == c)[0])
                          for c in np.unique(cells)]
            for cell, rows in groups:
                probing = (range(len(q_ids)) if cell_queries is None
                           else cell_queries.get(cell, ()))
                if not len(rows):
                    continue
                rcodes = codes[rows]
                for qi in probing:
                    # ADC: Σ_j LUT[qi, j, code_j] — pure lookup, no floats move
                    dist = luts[qi, sub[:, None], rcodes.T].sum(axis=0)
                    mask = (ids[rows] != q_ids[qi]) if exclude_self \
                        else np.ones(len(rows), dtype=bool)
                    cand = np.nonzero(mask)[0]
                    if cand.size == 0:
                        continue
                    take = min(k, cand.size)
                    part = cand[np.argpartition(dist[cand], take - 1)[:take]]
                    order = part[np.lexsort((ids[rows][part], dist[part]))]
                    out_q.extend([int(q_ids[qi])] * len(order))
                    out_n.extend(ids[rows][order].tolist())
                    out_d.extend(dist[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "dist": pa.array(out_d, pa.float64()),
        })

    return partial


def _reduce_topk(k: int):
    def reduce_group(group: pa.Table) -> pa.Table:
        n = group["neighbor_id"].to_pylist()
        d = group["dist"].to_pylist()
        order = sorted(range(len(n)), key=lambda i: (d[i], n[i]))[:k]
        return pa.table({
            "query_id": group["query_id"].slice(0, 1).to_pylist() * len(order)
            if order else pa.array([], pa.int64()),
            "neighbor_id": pa.array([n[i] for i in order], pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), pa.int32()),
        })

    return reduce_group


def pq_topk(codes_ds: "ray.data.Dataset", codebooks: np.ndarray,
            queries: dict[int, np.ndarray], *, k: int = 10,
            id_col: str = "vec_id",
            exclude_self: bool = True) -> "ray.data.Dataset":
    """→ Dataset(query_id, neighbor_id, rank) — flat ADC scan over the codes
    table (the 32×-smaller resident structure). Deterministic: ascending
    (dist, neighbor_id)."""
    q_ids = np.asarray(sorted(queries), dtype=np.int64)
    Q = _normalize(np.stack([np.asarray(queries[int(q)], dtype=np.float64)
                             for q in q_ids]))
    ref = ray.put((q_ids, _luts(Q, np.asarray(codebooks)), None))
    partials = codes_ds.map_batches(
        _adc_partial_fn(ref, k=k, id_col=id_col, exclude_self=exclude_self),
        batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("query_id").map_groups(
        _reduce_topk(k), batch_format="pyarrow")


def ivfpq_topk(ds: "ray.data.Dataset", queries: dict[int, np.ndarray],
               centroids: np.ndarray, codebooks: np.ndarray, *,
               k: int = 10, nprobe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding",
               exclude_self: bool = True) -> "ray.data.Dataset":
    """IVF routing + PQ payload: assign → encode (cell kept) → ADC only on
    probed cells. With nprobe == n_cells this equals the flat pq_topk over
    the same codes (pinned in tests)."""
    C = _normalize(np.asarray(centroids))
    q_ids = np.asarray(sorted(queries), dtype=np.int64)
    Q = _normalize(np.stack([np.asarray(queries[int(q)], dtype=np.float64)
                             for q in q_ids]))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    cell_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe):
        for c in cells:
            cell_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((q_ids, _luts(Q, np.asarray(codebooks)), cell_queries))
    codes = pq_encode(ivf_assign(ds, centroids, id_col=id_col, vec_col=vec_col),
                      codebooks, id_col=id_col, vec_col=vec_col,
                      keep_cols=("cell",))
    partials = codes.map_batches(
        _adc_partial_fn(ref, k=k, id_col=id_col, exclude_self=exclude_self),
        batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("query_id").map_groups(
        _reduce_topk(k), batch_format="pyarrow")


# ------------------------------------------------------- persisted PQ index

def save_pq_index(codes_ds: "ray.data.Dataset", codebooks: np.ndarray,
                  index_dir: str, *, id_col: str = "vec_id",
                  num_shards: int = 16) -> dict:
    """Persist the PQ search structure — the build-once / search-many story
    for the ANN family, mirroring ``lshindex``'s discipline: codes sharded
    by the engine's content-addressed id hash into
    ``shards/shard=NNN.parquet``, codebooks as a tool-readable parquet, a
    ``meta.json`` manifest, all staged in ``<index_dir>.tmp`` and committed
    with ONE ``os.replace`` — the index is absent or complete, a killed
    save leaves only a tmp dir the next save clears. Shards are the unit of
    parallel read at search time (and of per-shard re-encode on refresh).
    Storage contract: ``index_dir`` must be on storage all workers share
    (same as checkpoint/lshindex output)."""
    import json
    import os
    import shutil

    from janet_ray.functions.partitioning import stable_hash_column

    if os.path.exists(index_dir):
        raise FileExistsError(
            f"save_pq_index: {index_dir} exists — indexes are immutable; "
            "save to a fresh path (or remove the old index first)")
    books = np.ascontiguousarray(np.asarray(codebooks, dtype=np.float64))
    m, n_codes, dsub = books.shape
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "shards"))
    pa_pq.write_table(pa.table({
        "subspace": pa.array(np.repeat(np.arange(m, dtype=np.int32),
                                       n_codes)),
        "code": pa.array(np.tile(np.arange(n_codes, dtype=np.int32), m)),
        "vals": pa.FixedSizeListArray.from_arrays(
            pa.array(books.reshape(-1), pa.float64()), dsub),
    }), os.path.join(tmp, "codebooks.parquet"))

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (stable_hash_column(batch, [id_col]) % num_shards)
        return batch.append_column("shard",
                                   pa.array(shard.astype(np.int32)))

    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "shard" not in group.column_names:
            return pa.table({"shard": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        sid = int(group["shard"][0].as_py())
        out = group.drop_columns(["shard"])
        pa_pq.write_table(out, os.path.join(tmp, "shards",
                                            f"shard={sid:05d}.parquet"))
        return pa.table({"shard": pa.array([sid], pa.int32()),
                         "n": pa.array([group.num_rows], pa.int64())})

    written = (codes_ds.map_batches(add_shard, batch_format="pyarrow",
                                    zero_copy_batch=True)
               .groupby("shard").map_groups(write_shard,
                                            batch_format="pyarrow")
               .take_all())  # bounded: one row per shard
    meta = {"m": int(m), "n_codes": int(n_codes), "dsub": int(dsub),
            "num_shards": int(num_shards), "id_col": id_col,
            "n_vectors": int(sum(r["n"] for r in written))}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    os.replace(tmp, index_dir)  # atomic: absent or complete
    return meta


def pq_index_meta(index_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def load_pq_codebooks(index_dir: str) -> np.ndarray:
    import os

    meta = pq_index_meta(index_dir)
    t = pa_pq.read_table(os.path.join(index_dir, "codebooks.parquet"))
    # rows are written in (subspace, code) row-major order; re-sort defensively
    order = np.lexsort((t["code"].to_numpy(zero_copy_only=False),
                        t["subspace"].to_numpy(zero_copy_only=False)))
    flat = t["vals"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(len(t), meta["dsub"])
    return np.ascontiguousarray(
        flat[order].reshape(meta["m"], meta["n_codes"], meta["dsub"]))


def read_pq_codes(index_dir: str) -> "ray.data.Dataset":
    import os

    return ray.data.read_parquet(os.path.join(index_dir, "shards"))


def pq_index_topk(index_dir: str, queries: dict[int, np.ndarray], *,
                  k: int = 10, exclude_self: bool = True) -> "ray.data.Dataset":
    """ADC top-k served from a PERSISTED index — raw vectors are never read;
    only the 32×-compressed shard files stream through the scan."""
    meta = pq_index_meta(index_dir)
    books = load_pq_codebooks(index_dir)
    return pq_topk(read_pq_codes(index_dir), books, queries, k=k,
                   id_col=meta["id_col"], exclude_self=exclude_self)
