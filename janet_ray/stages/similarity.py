"""Approximate-nearest-neighbor search over an embedding column (SURVEY.md §2.11).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and every ``map_batches`` task computes one numpy float64 matmul
against its batch, emitting a per-batch partial top-k (the combiner/pre-aggregate
pattern: only q×k candidate rows per batch ever reach the shuffle, never q×N).
A small ``groupby(query_id)`` then reduces partials to the global top-k.

Scale path: ``ivf_build`` / ``ivf_topk`` — k-means-style coarse quantizer (fixed
seed, few Lloyd iterations over a sample), assign each vector to its nearest
centroid (one shuffle key), and probe only the ``nprobe`` nearest cells per query.
At 10^12 vectors the cell id becomes the partition key so a query touches
``nprobe`` partitions instead of the full corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds: "ray.data.Dataset", queries: dict[int, np.ndarray], *,
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = True) -> "ray.data.Dataset":
    """→ Dataset(query_id, neighbor_id, rank) — exact cosine top-k per query.

    Deterministic order: descending similarity, ties broken by ascending
    neighbor id. ``queries`` maps query_id → raw vector."""
    q_ids = np.asarray(sorted(queries), dtype=np.int64)
    Q = _normalize(np.stack([np.asarray(queries[int(q)], dtype=np.float64)
                             for q in q_ids]))
    ref = ray.put((q_ids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        M = _normalize(_as_matrix(batch[vec_col]))
        sims = M @ qm.T  # (n, q)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            col = sims[:, qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            cand_idx = np.nonzero(mask)[0]
            if cand_idx.size == 0:
                continue
            take = min(k, cand_idx.size)
            # partial top-k inside the map task: argpartition then exact sort
            part = cand_idx[np.argpartition(-col[cand_idx], take - 1)[:take]]
            order = part[np.lexsort((ids[part], -col[part]))]
            out_q.extend([int(qids[qi])] * len(order))
            out_n.extend(ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_topk(group: pa.Table) -> pa.Table:
        n = group["neighbor_id"].to_pylist()
        s = group["sim"].to_pylist()
        order = sorted(range(len(n)), key=lambda i: (-s[i], n[i]))[:k]
        return pa.table({
            "query_id": group["query_id"].slice(0, 1).to_pylist() * len(order)
            if order else pa.array([], pa.int64()),
            "neighbor_id": pa.array([n[i] for i in order], pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), pa.int32()),
        })

    return partials.groupby("query_id").map_groups(reduce_topk, batch_format="pyarrow")


# ---------------------------------------------------------------- IVF variant

def kmeans_centroids(sample: np.ndarray, n_cells: int, *, iters: int = 5,
                     seed: int = 0xC3) -> np.ndarray:
    """Tiny fixed-seed Lloyd's k-means on a driver-side sample (centroid table is
    the broadcast small side; the corpus itself never leaves the workers)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    C = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ C.T, axis=1)
        for c in range(len(C)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_assign(ds: "ray.data.Dataset", centroids: np.ndarray, *,
               id_col: str = "vec_id", vec_col: str = "embedding") -> "ray.data.Dataset":
    """Append the nearest-centroid ``cell`` column (the partition key at scale)."""
    ref = ray.put(_normalize(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(ref)
        M = _normalize(_as_matrix(batch[vec_col]))
        cells = np.argmax(M @ C.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cells, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def ivf_topk(ds: "ray.data.Dataset", queries: dict[int, np.ndarray],
             centroids: np.ndarray, *, k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True) -> "ray.data.Dataset":
    """ANN top-k probing only the ``nprobe`` nearest IVF cells per query.
    Approximate: recall < 1 when a true neighbor lives outside the probed cells."""
    C = _normalize(centroids)
    q_ids = np.asarray(sorted(queries), dtype=np.int64)
    Q = _normalize(np.stack([np.asarray(queries[int(q)], dtype=np.float64)
                             for q in q_ids]))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    # per-cell query lists — tiny, shipped in the task closure
    cell_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe):
        for c in cells:
            cell_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((q_ids, Q, cell_queries))
    assigned = ivf_assign(ds, centroids, id_col=id_col, vec_col=vec_col)

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, cq = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        cells = np.asarray(batch["cell"].to_pylist(), dtype=np.int32)
        M = _normalize(_as_matrix(batch[vec_col]))
        out_q, out_n, out_s = [], [], []
        for cell in np.unique(cells):
            probing = cq.get(int(cell), [])
            if not probing:
                continue
            rows = np.nonzero(cells == cell)[0]
            sims = M[rows] @ qm[probing].T
            for j, qi in enumerate(probing):
                col = sims[:, j]
                mask = np.ones(len(rows), dtype=bool)
                if exclude_self:
                    mask &= ids[rows] != qids[qi]
                cand = np.nonzero(mask)[0]
                if cand.size == 0:
                    continue
                take = min(k, cand.size)
                part = cand[np.argpartition(-col[cand], take - 1)[:take]]
                order = part[np.lexsort((ids[rows][part], -col[part]))]
                out_q.extend([int(qids[qi])] * len(order))
                out_n.extend(ids[rows][order].tolist())
                out_s.extend(col[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = assigned.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_topk(group: pa.Table) -> pa.Table:
        n = group["neighbor_id"].to_pylist()
        s = group["sim"].to_pylist()
        order = sorted(range(len(n)), key=lambda i: (-s[i], n[i]))[:k]
        return pa.table({
            "query_id": group["query_id"].slice(0, 1).to_pylist() * len(order)
            if order else pa.array([], pa.int64()),
            "neighbor_id": pa.array([n[i] for i in order], pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), pa.int32()),
        })

    return partials.groupby("query_id").map_groups(reduce_topk, batch_format="pyarrow")
