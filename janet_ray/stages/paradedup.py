"""Paragraph-level exact dedup — the granularity CCNet actually dedups at
(Wenzek et al. 2020 §3.1: every paragraph is hashed and duplicated
paragraphs are dropped corpus-wide, keeping the first occurrence), distinct
from the document-level flavors in stages/dedup.py.

Pinned semantics (replayed exactly by the SQL twin):

  * paragraphs = ``text.split(sep)`` — exact split, empties kept (an empty
    paragraph is a paragraph; a doc's reconstruction must round-trip);
  * global first-occurrence rule: an occurrence (doc_id, idx) of a
    paragraph is KEPT iff it is the minimum (doc_id, idx) lexicographic
    pair among all occurrences of that exact paragraph text;
  * output text = kept paragraphs re-joined with ``sep`` in original
    order ('' when every paragraph was dropped) + ``n_dropped``.

Shape — the corpus text is shuffled at most ONCE (to rewrite it), and the
dedup decision shuffles only narrow rows:

  1. explode pass: per-batch (part=h64(md5(para)) % n_parts, h64, doc_id,
     idx) int rows — paragraph TEXT never enters the decision shuffle;
  2. one coarse groupby(part): all occurrences of a hash co-locate; a
     vectorized lexsort + run-detection kernel marks every occurrence
     keep/drop (first of each run keeps) and emits only the DROP rows
     (duplicates are the minority in a sane corpus — rows out ∝ dup rate);
  3. apply: scale-adaptive like the minhash verify — below
     ``broadcast_limit`` drop rows, the drop set ships once via ``ray.put``
     and a stateless corpus map rewrites text (corpus never shuffles);
     above it, corpus ∪ drop rows cogroup on a coarse doc_id hash (the
     engine's cogroup-via-union pattern) and the rewrite happens
     per-partition — the corpus moves once, which a rewritten-corpus
     product pays anyway.

Hash-collision note: the decision key is the top 63 bits of the md5
64-bit prefix (one bit is shifted off to stay int64-positive); a
collision would drop a non-duplicate paragraph. At 10^12 paragraphs the
expected collision count under 2^-63 is ~0.05 — the standard CCNet
trade; the oracle groups by the paragraph text itself, so a collision
would surface as a gate failure rather than hide."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_N_PARTS = 64
_BROADCAST_LIMIT = 5_000_000


def _h64(paras: list[str]) -> np.ndarray:
    return np.asarray(
        [int.from_bytes(hashlib.md5(p.encode("utf-8")).digest()[:8], "big",
                        signed=False) >> 1  # keep int64-positive
         for p in paras], dtype=np.int64)


def _explode(batch: pa.Table, *, id_col: str, text_col: str, sep: str,
             n_parts: int) -> pa.Table:
    ids_out, idx_out, paras = [], [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        for j, p in enumerate((t or "").split(sep)):
            ids_out.append(i)
            idx_out.append(j)
            paras.append(p)
    h = _h64(paras)
    return pa.table({
        "part": pa.array((h % n_parts).astype(np.int32)),
        "h": pa.array(h),
        "doc_id": pa.array(ids_out, batch[id_col].type),
        "idx": pa.array(np.asarray(idx_out, dtype=np.int64)),
    })


def _doc_part_kernel(col: pa.ChunkedArray, n_parts: int) -> pa.Array:
    """Coarse partition key for ANY id type (int ids take the fast modulo;
    strings/other take crc32 of str — the broadcast path is id-type-agnostic
    and this path must match, not crash, when the drop volume tips the
    dispatch). Shared with the C4 sentence-span dedup (stages/c4.py)."""
    import zlib

    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        return pa.array((vals.astype(np.int64) % n_parts).astype(np.int32))
    return pa.array(np.asarray(
        [zlib.crc32(str(v).encode()) % n_parts for v in col.to_pylist()],
        dtype=np.int32))


def _drop_rows(part: pa.Table) -> pa.Table:
    """(doc_id, idx) occurrences to DROP: everything but the first
    (doc_id, idx) of each hash run."""
    # empty block's doc_id typed from the part when present — int64 pinning
    # would mix schemas on string-id corpora (same fix as rewrite_part)
    id_type = (part["doc_id"].type if "doc_id" in part.column_names
               else pa.int64())
    empty = pa.table({"doc_id": pa.array([], id_type),
                      "idx": pa.array([], pa.int64())})
    if part.num_rows == 0 or "h" not in part.column_names:
        return empty
    h = part["h"].to_numpy(zero_copy_only=False)
    d = part["doc_id"].to_numpy(zero_copy_only=False)
    x = part["idx"].to_numpy(zero_copy_only=False)
    order = np.lexsort((x, d, h))
    h, d, x = h[order], d[order], x[order]
    first = np.zeros(len(h), dtype=bool)
    first[0] = True
    first[1:] = h[1:] != h[:-1]
    return pa.table({"doc_id": pa.array(d[~first]),
                     "idx": pa.array(x[~first])})


def paragraph_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = "\n", n_parts: int = _N_PARTS,
                    broadcast_limit: int = _BROADCAST_LIMIT):
    """(doc_id, text, n_dropped) with corpus-wide duplicate paragraphs
    removed under the global first-occurrence rule."""
    import ray

    drops = (ds.map_batches(
        lambda b: _explode(b, id_col=id_col, text_col=text_col, sep=sep,
                           n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part").map_groups(_drop_rows, batch_format="pyarrow")
        .materialize())

    n_drops = drops.count()
    if n_drops <= broadcast_limit:
        # small drop set → broadcast once, corpus never shuffles
        drop_tbl = pa.concat_tables(
            [b for b in drops.iter_batches(batch_size=None,
                                           batch_format="pyarrow")]
        ) if n_drops else pa.table({"doc_id": pa.array([], pa.int64()),
                                    "idx": pa.array([], pa.int64())})
        doc_a = drop_tbl["doc_id"].to_numpy(zero_copy_only=False)
        idx_a = drop_tbl["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idx_a, doc_a))
        ref = ray.put({"doc": doc_a[order], "idx": idx_a[order]})

        def rewrite(batch: pa.Table) -> pa.Table:
            dset = ray.get(ref)
            dd, dx = dset["doc"], dset["idx"]
            ids = batch[id_col].to_pylist()
            texts = batch[text_col].to_pylist()
            out_t, out_n = [], []
            for i, t in zip(ids, texts):
                lo = np.searchsorted(dd, i, "left")
                hi = np.searchsorted(dd, i, "right")
                bad = set(dx[lo:hi].tolist())
                if not bad:
                    out_t.append(t or "")
                    out_n.append(0)
                    continue
                paras = (t or "").split(sep)
                kept = [p for j, p in enumerate(paras) if j not in bad]
                out_t.append(sep.join(kept))
                out_n.append(len(paras) - len(kept))
            return pa.table({
                id_col: batch[id_col],
                text_col: pa.array(out_t, pa.string()),
                "n_dropped": pa.array(out_n, pa.int64()),
            })

        return ds.map_batches(rewrite, batch_format="pyarrow",
                              zero_copy_batch=True)

    # large drop set → cogroup-via-union on a coarse doc hash; the corpus
    # text moves through ONE shuffle (the rewrite pass a dedup product
    # pays anyway)
    def _doc_part(col: pa.ChunkedArray) -> pa.Array:
        return _doc_part_kernel(col, n_parts)

    def tag_corpus(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "part": _doc_part(batch[id_col]),
            "doc_id": batch[id_col],
            "idx": pa.array(np.full(n, -1, dtype=np.int64)),
            "text": batch[text_col],
        })

    def tag_drops(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "part": _doc_part(batch["doc_id"]),
            "doc_id": batch["doc_id"],
            "idx": batch["idx"],
            "text": pa.array([None] * n, pa.string()),
        })

    unioned = (ds.map_batches(tag_corpus, batch_format="pyarrow",
                              zero_copy_batch=True)
               .union(drops.map_batches(tag_drops, batch_format="pyarrow",
                                        zero_copy_batch=True)))

    def rewrite_part(part: pa.Table) -> pa.Table:
        # type the empty block's id column from the incoming part when it
        # carries one — pinning int64 here would emit mixed output schemas
        # on a string-id corpus whenever a key-range group is empty
        id_type = (part["doc_id"].type if "doc_id" in part.column_names
                   else pa.int64())
        empty = pa.table({id_col: pa.array([], id_type),
                          text_col: pa.array([], pa.string()),
                          "n_dropped": pa.array([], pa.int64())})
        if part.num_rows == 0 or "idx" not in part.column_names:
            return empty
        idx = part["idx"].to_numpy(zero_copy_only=False)
        docs = part.filter(pa.array(idx == -1))
        dr = part.filter(pa.array(idx != -1))
        bad: dict = {}
        for i, j in zip(dr["doc_id"].to_pylist(), dr["idx"].to_pylist()):
            bad.setdefault(i, set()).add(j)
        out_t, out_n = [], []
        ids = docs["doc_id"].to_pylist()
        for i, t in zip(ids, docs["text"].to_pylist()):
            b = bad.get(i)
            if not b:
                out_t.append(t or "")
                out_n.append(0)
                continue
            paras = (t or "").split(sep)
            kept = [p for j, p in enumerate(paras) if j not in b]
            out_t.append(sep.join(kept))
            out_n.append(len(paras) - len(kept))
        return pa.table({id_col: pa.array(ids, docs["doc_id"].type),
                         text_col: pa.array(out_t, pa.string()),
                         "n_dropped": pa.array(out_n, pa.int64())})

    return unioned.groupby("part").map_groups(rewrite_part,
                                              batch_format="pyarrow")


def paragraph_dedup_sql(*, source: str = "documents", sep_sql: str = "chr(10)",
                        id_col: str = "doc_id",
                        text_expr: str = "text") -> str:
    """DuckDB replay of the same rule; groups by the PARAGRAPH TEXT itself
    (hash-free — an engine md5 collision would fail the gate, not hide)."""
    return f"""
WITH paras AS (
  SELECT {id_col} AS doc_id, i - 1 AS idx, p[i] AS para
  FROM (
    SELECT {id_col}, string_split({text_expr}, {sep_sql}) AS p FROM {source}
  ) s, UNNEST(range(1, len(p) + 1)) AS t(i)
), marked AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
  FROM paras
)
SELECT doc_id,
       COALESCE(string_agg(para, {sep_sql} ORDER BY idx)
                FILTER (WHERE rn = 1), '') AS text,
       CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
FROM marked GROUP BY doc_id
"""
