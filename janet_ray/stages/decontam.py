"""Benchmark decontamination — flag (and let callers drop) training documents
that share any k-token n-gram with a benchmark/eval set, the standard
"13-gram overlap" contamination rule from the GPT-3 / PaLM data cards
(Brown et al. 2020 §C; the k is configurable because the right value is a
property of the corpus, not the operator).

Shape (the canonical broadcast-small-side pattern, zero shuffles on the
corpus side):

  1. the benchmark side is BY DEFINITION small (an eval suite: 10^3..10^5
     documents); its distinct gram-hash set is computed distributed
     (per-batch explode + local distinct) and collected to ONE sorted int64
     array — driver memory is bounded by the benchmark's distinct gram
     count, never by the corpus. That array is `ray.put` ONCE; `ray.get` of
     a numpy array from plasma is zero-copy, so corpus tasks share the one
     object-store copy with no per-batch deserialization.
  2. the corpus side is a stateless ``map_batches``: per document, distinct
     gram hashes → membership via ``np.searchsorted`` against the broadcast
     sorted array → ``n_hits`` (distinct shared grams) and ``contaminated``.
     No join, no shuffle, no second corpus pass.

Gram semantics are the engine-wide contract (winnow.py / lm_quality.py):
``[a-z0-9]+`` tokens over ``lower(text)``, k-token grams joined by a single
space, md5-u32 gram hash — rendered identically into the DuckDB oracle
(``decontam_sql``), so parity is by construction. Docs with < k tokens have
no grams and are clean by definition (n_hits = 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from janet_ray.stages.winnow import _md5_u32, _tokens

DEFAULT_K = 13  # the GPT-3 data-card overlap rule; tune to corpus gram length


def doc_gram_hashes(text: str, *, k: int = DEFAULT_K) -> np.ndarray:
    """Sorted DISTINCT md5-u32 hashes of the document's k-token grams."""
    toks = _tokens(text or "")
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    hs = np.fromiter((_md5_u32(" ".join(toks[i:i + k])) for i in range(n)),
                     dtype=np.int64, count=n)
    return np.unique(hs)


def benchmark_gram_set(bench, *, text_col: str = "text",
                       k: int = DEFAULT_K) -> np.ndarray:
    """One sorted distinct int64 array of the benchmark's gram hashes.

    Distributed explode with per-batch distinct (the combiner), then a
    driver-side distinct of the partials — bounded by the BENCHMARK's
    distinct gram count (the small side of the operator's contract), never
    by corpus size."""

    def explode(batch: pa.Table) -> pa.Table:
        parts = [doc_gram_hashes(t, k=k)
                 for t in batch[text_col].to_pylist()]
        hs = (np.unique(np.concatenate(parts)) if parts
              else np.empty(0, dtype=np.int64))
        return pa.table({"h": pa.array(hs, pa.int64())})

    rows = bench.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    if not rows:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.array([r["h"] for r in rows], dtype=np.int64))


def decontaminate(ds, bench, *, k: int = DEFAULT_K, text_col: str = "text",
                  id_col: str = "doc_id"):
    """(doc_id, n_hits, contaminated) for every corpus document, where
    ``n_hits`` counts the document's DISTINCT k-grams that also occur
    anywhere in ``bench``. Filter ``contaminated == False`` to drop."""
    import ray

    grams_ref = ray.put(benchmark_gram_set(bench, text_col=text_col, k=k))

    def mark(batch: pa.Table) -> pa.Table:
        bench_hs = ray.get(grams_ref)  # zero-copy numpy from plasma
        hits = np.empty(batch.num_rows, dtype=np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            hs = doc_gram_hashes(t, k=k)
            if hs.size and bench_hs.size:
                idx = np.searchsorted(bench_hs, hs)
                idx[idx == bench_hs.size] = 0
                hits[i] = int(np.count_nonzero(bench_hs[idx] == hs))
            else:
                hits[i] = 0
        return pa.table({
            "doc_id": batch[id_col],
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0, pa.bool_()),
        })

    return ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)


def decontam_sql(*, k: int = DEFAULT_K, corpus: str = "documents",
                 bench: str = "documents", corpus_pred: str = "TRUE",
                 bench_pred: str = "TRUE", text_expr: str = "text",
                 id_col: str = "doc_id") -> str:
    """DuckDB replay from the same constants: same tokenizer regex, same
    list-slice gram construction, same md5-u32 hash, distinct-gram hit count
    via a semi-join, missing docs (no grams) coalesced to clean."""
    gram_expr = f"array_to_string(ts[i:i+{k - 1}], ' ')"
    hash_expr = (f"CAST(CAST(('0x' || substr(md5({gram_expr}), 1, 8)) "
                 "AS UBIGINT) AS BIGINT)")
    return f"""
WITH ctoks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS ts
  FROM {corpus} WHERE {corpus_pred}
), cgrams AS (
  SELECT DISTINCT doc_id, {hash_expr} AS h
  FROM ctoks, UNNEST(range(1, len(ts) - {k} + 2)) AS t(i)
  WHERE len(ts) >= {k}
), btoks AS (
  SELECT regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS ts
  FROM {bench} WHERE {bench_pred}
), bgrams AS (
  SELECT DISTINCT {hash_expr} AS h
  FROM btoks, UNNEST(range(1, len(ts) - {k} + 2)) AS t(i)
  WHERE len(ts) >= {k}
), hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM cgrams JOIN bgrams USING (h) GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM ctoks c LEFT JOIN hits h USING (doc_id)
"""
