"""Feature-hashing TF vectors (Weinberger et al., ICML 2009) — text → a
fixed-width hashed token-count vector, the deterministic text-native
embedding that makes the ANN/clustering family usable without a model:
bucket = md5_u32(token) % dims (the SAME tokenizer + hash arithmetic as the
quality classifier, `classifier.py` — one definition per side), vector =
per-bucket token counts. Exact integers end to end, so unlike learned
embeddings this vectorizer has a value-hash-STRICT SQL twin including the
list column.

Scale shape: stateless one-pass ``map_batches`` (a numpy ``bincount`` per
doc over the bucket ids), zero shuffles; dims is the memory knob (dense
int64 vector per doc — at 100 TB pick dims ≤ a few hundred and feed IVF/PQ,
which consume these vectors unchanged).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from janet_ray.stages.classifier import _TOKEN_RE


def _buckets(tokens: list[str], dims: int) -> np.ndarray:
    return np.asarray(
        [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dims
         for t in tokens], dtype=np.int64)


def hashed_tf_vectors(ds, *, dims: int = 16, id_col: str = "doc_id",
                      text_col: str = "text", out_col: str = "vec"):
    """→ Dataset(id, vec: fixed_size_list<int64>[dims]) — token-count
    vector per document (empty/token-less docs get the zero vector)."""
    if dims < 1:
        raise ValueError("dims must be >= 1")

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        out = np.zeros((len(texts), dims), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall((t or "").lower())
            if toks:
                out[i] = np.bincount(_buckets(toks, dims), minlength=dims)
        return pa.table({
            id_col: batch[id_col],
            out_col: pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1), pa.int64()), dims),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def hashed_tf_sql(*, dims: int = 16, source: str = "documents",
                  id_col: str = "doc_id", text_expr: str = "text",
                  out_col: str = "vec") -> str:
    """SQL twin: same tokenizer/hash/modulus; zero buckets materialized via
    a generate_series cross join so the list is dense like the engine's."""
    bucket = f"CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) % {dims}"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_expr}), '[a-z0-9]+')) AS tok
  FROM {source}),
cnt AS (
  SELECT doc_id, CAST({bucket} AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, b),
grid AS (
  SELECT d.{id_col} AS doc_id, CAST(g.b AS BIGINT) AS b
  FROM {source} d, UNNEST(generate_series(0, {dims - 1})) AS g(b)),
dense AS (
  SELECT grid.doc_id, grid.b, COALESCE(cnt.c, 0) AS c
  FROM grid LEFT JOIN cnt ON cnt.doc_id = grid.doc_id AND cnt.b = grid.b)
SELECT doc_id, list(c ORDER BY b) AS {out_col}
FROM dense GROUP BY doc_id
"""
