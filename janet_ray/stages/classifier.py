"""Hashed-feature linear classifier inference — the fastText-style quality
classifier every modern corpus pipeline runs (GPT-3's WebText-vs-CommonCrawl
logistic filter, CCNet/RefinedWeb quality taggers): score = Σ over tokens of
W[h(token) mod B], thresholded into keep/drop.

Everything is pinned EXACT-INTEGER so the operator has a value-level SQL
twin (no float dot products — the score is an int64 sum of int weights):

  * tokens = the engine tokenizer (lowercase ``[a-z0-9]+``), duplicates
    count (bag-of-words);
  * feature bucket = the engine's content-addressed md5-u32 of the token,
    mod ``n_buckets`` — the SAME hash the split/sampling/winnow operators
    render in SQL;
  * the weight table is any int-valued vector of length ``n_buckets``; the
    default is a deterministic placeholder derived from the bucket index
    (Knuth multiplicative scatter into [-500, 500)) standing in for trained
    weights — a real deployment writes its trained, quantized weights into
    the same table;
  * label = 'keep' iff score > threshold (strict), else 'drop'.

Shape: stateless per-batch map — ZERO shuffles, the classic embarrassingly
parallel inference stage. The weight table is a plain numpy array shipped
once in the task closure (``n_buckets`` ints; for million-bucket models use
``ray.put`` + the broadcast-cache pattern from stages/dedup.py). The
per-token md5 is the same O(tokens) hashing loop as the winnow/LM stages.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

DEFAULT_N_BUCKETS = 64
DEFAULT_THRESHOLD = 0

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def default_weights(n_buckets: int = DEFAULT_N_BUCKETS) -> np.ndarray:
    """Deterministic placeholder weights: W[b] = (b·2654435761) mod 1000 − 500
    (exact-int; identical arithmetic in classifier_sql)."""
    b = np.arange(n_buckets, dtype=np.int64)
    return (b * 2654435761) % 1000 - 500


def _bucket(token: str, n_buckets: int) -> int:
    # the engine's content-addressed md5-u32 (single definition in winnow)
    from janet_ray.stages.winnow import _md5_u32

    return _md5_u32(token) % n_buckets


def score_text(text: str, weights: np.ndarray) -> int:
    """Exact int score of one document (reference kernel; also the test
    oracle)."""
    nb = len(weights)
    return int(sum(int(weights[_bucket(t, nb)])
                   for t in _TOKEN_RE.findall((text or "").lower())))


def classify(ds, *, weights: np.ndarray | None = None,
             threshold: int = DEFAULT_THRESHOLD,
             text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, score, label) per document — stateless inference map."""
    w = default_weights() if weights is None else np.asarray(weights,
                                                             dtype=np.int64)
    nb = len(w)

    def f(batch: pa.Table) -> pa.Table:
        scores = np.asarray(
            [score_text(t, w) for t in batch[text_col].to_pylist()],
            dtype=np.int64)
        return pa.table({
            id_col: batch[id_col],
            "score": pa.array(scores),
            "label": pa.array(np.where(scores > threshold, "keep", "drop")
                              .tolist(), pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def score_cte_sql(*, source: str = "documents", text_expr: str = "text",
                  id_col: str = "doc_id",
                  n_buckets: int = DEFAULT_N_BUCKETS) -> str:
    """The tokenize+score chain as a composable CTE fragment (``ctoks`` +
    ``cscored``) — single source of truth for oracles that EMBED the
    classifier score inside a larger query (cluster_keep_best). Token-less
    docs are absent from ``cscored``; consumers COALESCE to 0 to match
    ``score_text``'s empty-sum."""
    bucket = (f"CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) "
              f"% {n_buckets}")
    return f"""ctoks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_expr}), '[a-z0-9]+')) AS tok
  FROM {source}
), cscored AS (
  SELECT doc_id,
         CAST(sum(CAST(({bucket}) * 2654435761 % 1000 AS BIGINT) - 500)
              AS BIGINT) AS score
  FROM ctoks GROUP BY doc_id
)"""


def classifier_sql(*, source: str = "documents", text_expr: str = "text",
                   id_col: str = "doc_id",
                   n_buckets: int = DEFAULT_N_BUCKETS,
                   threshold: int = DEFAULT_THRESHOLD) -> str:
    """DuckDB replay: same tokenizer, same md5-u32 bucket, same weight
    arithmetic, same strict-greater threshold."""
    bucket = (f"CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) "
              f"% {n_buckets}")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_expr}), '[a-z0-9]+')) AS tok
  FROM {source}
), scored AS (
  SELECT doc_id,
         CAST(sum(CAST(({bucket}) * 2654435761 % 1000 AS BIGINT) - 500)
              AS BIGINT) AS score
  FROM toks GROUP BY doc_id
)
SELECT s.doc_id, COALESCE(sc.score, 0) AS score,
       CASE WHEN COALESCE(sc.score, 0) > {threshold}
            THEN 'keep' ELSE 'drop' END AS label
FROM (SELECT {id_col} AS doc_id FROM {source}) s
LEFT JOIN scored sc USING (doc_id)
"""
