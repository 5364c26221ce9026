"""Document chunking for embedding — split each document into fixed-size
token windows with overlap (stride < window), the preprocessing step every
embedding / RAG / long-context pipeline runs before encode: a 100-page doc
becomes N model-window pieces, each carrying its provenance (doc_id,
chunk_id, token offsets) so retrieved chunks map back to source spans.

Pinned semantics (both sides replay them exactly):

  * tokens are ``\\S+`` runs (the engine's token_count contract) and chunk
    text is the SPACE-join of the window's tokens — chunking is defined on
    the token stream, not raw bytes (original inter-token whitespace is not
    part of the contract; spans back into raw text are the highlights
    operator's job);
  * starts are ``k·stride`` for ``k = 0 .. n_chunks−1`` with
    ``n_chunks = 1 if n ≤ window else (n − window + stride − 1)//stride + 1``
    — the FIRST window that reaches the end is the last (no redundant
    suffix windows, no dropped tail tokens); an empty/whitespace-only doc
    emits zero chunks;
  * chunk ``k`` covers tokens ``[k·stride, min(k·stride + window, n))``.

Scale shape: a stateless one-pass ``map_batches`` flat emission — zero
shuffles, output rows ≈ corpus tokens / stride. Chunk ids are a pure
function of (doc_id, k): rerun/resume-stable, safe to use as the embed
stage's vector ids."""

from __future__ import annotations

import re

import pyarrow as pa

_TOKEN_RE = re.compile(r"\S+")


def chunk_plan(n_tokens: int, window: int, stride: int) -> int:
    """Number of chunks for a doc of ``n_tokens`` under the pinned rule."""
    if n_tokens <= 0:
        return 0
    if n_tokens <= window:
        return 1
    return (n_tokens - window + stride - 1) // stride + 1


def chunk_documents(ds, *, window: int, stride: int,
                    id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset(doc_id, chunk_id, start_tok, end_tok, n_chunk_tokens,
    chunk_text). ``0 < stride <= window`` required (stride > window would
    silently drop tokens — raise instead)."""
    if not (0 < stride <= window):
        raise ValueError(f"chunk_documents: need 0 < stride <= window, "
                         f"got stride={stride} window={window}")

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        o_id, o_k, o_s, o_e, o_n, o_t = [], [], [], [], [], []
        for i, t in zip(ids, texts):
            toks = _TOKEN_RE.findall(t or "")
            n = len(toks)
            for k in range(chunk_plan(n, window, stride)):
                s = k * stride
                e = min(s + window, n)
                o_id.append(i)
                o_k.append(k)
                o_s.append(s)
                o_e.append(e)
                o_n.append(e - s)
                o_t.append(" ".join(toks[s:e]))
        id_type = batch[id_col].type
        return pa.table({
            id_col: pa.array(o_id, id_type),
            "chunk_id": pa.array(o_k, pa.int64()),
            "start_tok": pa.array(o_s, pa.int64()),
            "end_tok": pa.array(o_e, pa.int64()),
            "n_chunk_tokens": pa.array(o_n, pa.int64()),
            "chunk_text": pa.array(o_t, pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def chunk_sql(*, window: int, stride: int, source: str = "documents",
              id_col: str = "doc_id", text_expr: str = "text") -> str:
    """SQL twin: same token split, same n_chunks arithmetic, list-slice
    window text (DuckDB list slicing is 1-based inclusive)."""
    n_chunks = (f"CASE WHEN n <= {window} THEN 1 "
                f"ELSE (n - {window} + {stride} - 1) // {stride} + 1 END")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, regexp_extract_all({text_expr}, '\\S+') AS ws,
         len(regexp_extract_all({text_expr}, '\\S+')) AS n
  FROM {source}),
plan AS (
  SELECT doc_id, ws, n, {n_chunks} AS n_chunks FROM toks WHERE n > 0),
ks AS (
  SELECT doc_id, ws, n, CAST(g.k AS BIGINT) AS chunk_id
  FROM plan, UNNEST(generate_series(0, n_chunks - 1)) AS g(k))
SELECT doc_id, chunk_id,
       CAST(chunk_id * {stride} AS BIGINT) AS start_tok,
       CAST(least(chunk_id * {stride} + {window}, n) AS BIGINT) AS end_tok,
       CAST(least(chunk_id * {stride} + {window}, n) - chunk_id * {stride}
            AS BIGINT) AS n_chunk_tokens,
       array_to_string(ws[chunk_id * {stride} + 1 :
                          least(chunk_id * {stride} + {window}, n)], ' ')
         AS chunk_text
FROM ks
"""
