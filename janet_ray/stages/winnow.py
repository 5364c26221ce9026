"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) —
the rolling-hash fingerprinting a training-data pipeline uses for local
near-dup / plagiarism-style overlap detection (SURVEY §2.11 family; the
reference's planned "De-dupe files" roadmap item, done content-defined).

Per document: tokenize (the engine-wide ``[a-z0-9]+`` lowercase contract) →
k-gram shingles → hash each gram → sliding windows of ``w`` consecutive gram
hashes → keep each window's MINIMUM. The selected set is the document's
fingerprint set: any shared substring of at least ``k + w − 1`` tokens between
two documents is guaranteed to produce at least one shared fingerprint
(winnowing's coverage guarantee), at an expected density of 2/(w+1).

Implementation notes:
  * the gram hash is the engine's content-addressed md5-u32 (first 8 hex
    digits of md5), the SAME hash the split/sampling operators use, rendered
    identically in SQL — parity by construction, and a DuckDB oracle can
    replay the whole operator exactly (``winnow_sql``). A multiplicative
    Rabin-Karp rolling hash would save the per-gram md5 at the cost of SQL
    replayability; the selection SEMANTICS (window minima) are identical.
  * window minima are vectorized: ``sliding_window_view(hashes, w).min(1)``
    — no Python loop over windows; the per-gram hashing loop is O(tokens),
    the same shape as the LM bigram counter.
  * docs with ≥ k tokens but fewer than ``w`` grams fall back to a single
    window over all grams (min of all); docs with < k tokens emit nothing.
  * output is exploded DISTINCT (doc_id, fp) rows — the join-ready shape:
    candidate pairs are a self-join on fp (bucket groupby at scale, exactly
    the MinHash-band pattern in stages/dedup.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEFAULT_K = 4  # tokens per gram
DEFAULT_W = 4  # grams per window

_TOKEN_RE = None  # compiled lazily to keep import light


def _tokens(text: str) -> list[str]:
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    return _TOKEN_RE.findall(text.lower())


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def doc_fingerprints(text: str, *, k: int = DEFAULT_K, w: int = DEFAULT_W
                     ) -> list[int]:
    """Sorted distinct winnowing fingerprints of one document."""
    toks = _tokens(text or "")
    n = len(toks) - k + 1
    if n <= 0:
        return []
    hs = np.fromiter((_md5_u32(" ".join(toks[i:i + k])) for i in range(n)),
                     dtype=np.int64, count=n)
    if n >= w:
        mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
    else:
        mins = hs.min(keepdims=True)
    return np.unique(mins).tolist()


def winnow_fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        k: int = DEFAULT_K, w: int = DEFAULT_W):
    """Exploded DISTINCT (doc_id, fp) fingerprint rows for the corpus —
    embarrassingly parallel per-batch map, no shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        fps_out: list[int] = []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            for fp in doc_fingerprints(t or "", k=k, w=w):
                ids_out.append(did)
                fps_out.append(fp)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "fp": pa.array(fps_out, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def winnow_sql(*, k: int = DEFAULT_K, w: int = DEFAULT_W,
               source: str = "documents", text_expr: str = "text",
               id_col: str = "doc_id") -> str:
    """DuckDB rendering of the SAME semantics, generated from the same
    constants: k-grams by list slicing, md5-u32 gram hash, window minima by a
    ROWS frame, the same <w-grams fallback."""
    gram_expr = f"array_to_string(ts[i:i+{k - 1}], ' ')"
    hash_expr = (f"CAST(CAST(('0x' || substr(md5({gram_expr}), 1, 8)) "
                 "AS UBIGINT) AS BIGINT)")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS ts
  FROM {source}
), grams AS (
  SELECT doc_id, i, {hash_expr} AS h
  FROM toks, UNNEST(range(1, len(ts) - {k} + 2)) AS t(i)
  WHERE len(ts) >= {k}
), mins AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS fp
  FROM grams
), sel AS (
  SELECT doc_id, fp FROM mins WHERE i >= {w}
  UNION ALL
  SELECT doc_id, min(h) AS fp FROM grams
  GROUP BY doc_id HAVING count(*) < {w}
)
SELECT DISTINCT doc_id, fp FROM sel
"""
