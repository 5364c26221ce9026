"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): select raw-corpus documents whose hashed-n-gram distribution looks
like a TARGET corpus. The standard pretraining-data-selection recipe:

  1. features = unigrams + adjacent bigrams, hashed into ``n_buckets``
     (the paper's hashed bag-of-n-grams; hash = the engine's
     content-addressed md5-u32, the same one the classifier/split/winnow
     SQL twins render);
  2. fit two multinomial feature models — target p̂ and raw q̂ — from
     bucket counts with add-alpha smoothing;
  3. per-document log importance weight  log w = Σ_f c_f(doc)·(log p̂_f −
     log q̂_f);
  4. resample: top-k by log w + Gumbel noise (sampling ∝ w without
     replacement, Gumbel-top-k trick). The Gumbel here is CONTENT-
     ADDRESSED — u = (md5_u64(doc_id:seed)+1)/(2⁶⁴+2), g = −ln(−ln u) —
     so selection is deterministic and reproducible across engines/runs.

Scale shape (what moves at 100 TB):
  * each model fit is ONE streaming pass folding a fixed ``n_buckets``
    int64 vector through Ray's aggregation tree (merge = elementwise add,
    the CMS pattern) — the token stream never shuffles and the driver
    holds O(n_buckets) state;
  * the λ = log p̂ − log q̂ vector (n_buckets float64, ~64 KB at the
    paper's 10k buckets) ships once in the scoring task's closure (use
    ray.put + functions/broadcast.py for million-bucket models);
  * scoring is a stateless per-batch map; selection is the engine's
    partial-top-k reduce (per-batch top-k partials → one tiny final
    fold), never a global sort.

Oracle evidence: bucket counts are EXACT integers with a value-level SQL
twin (``feature_counts_sql`` — same tokenizer, same md5-u32 bucket, same
unigram+bigram feature set); the float log arithmetic downstream of the
counts is rows-only by declaration, pinned by reference-parity pytest
(the lm_bigram_model / index_bm25_inputs evidence pattern).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_N_BUCKETS = 4096
DEFAULT_ALPHA = 1  # add-alpha smoothing, integer so the count story stays exact

_TOKEN_RE = re.compile(r"[a-z0-9]+")  # engine tokenizer contract


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _md5_u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def doc_features(text: str) -> list[str]:
    """Unigrams + adjacent bigrams ("a b") of one document — the reference
    feature extractor (also the test oracle)."""
    toks = _TOKEN_RE.findall((text or "").lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _batch_bucket_counts(block: pa.Table, text_col: str,
                         n_buckets: int) -> np.ndarray:
    """Exact bucket counts of one Arrow block (all docs' features)."""
    from collections import Counter

    acc = np.zeros(n_buckets, dtype=np.int64)
    cnt: Counter = Counter()
    for t in block[text_col].to_pylist():
        cnt.update(doc_features(t))
    if cnt:
        feats = list(cnt)
        buckets = np.fromiter((_md5_u32(f) % n_buckets for f in feats),
                              dtype=np.int64, count=len(feats))
        np.add.at(acc, buckets,
                  np.fromiter((cnt[f] for f in feats), dtype=np.int64,
                              count=len(feats)))
    return acc


def feature_counts(ds, *, text_col: str = "text",
                   n_buckets: int = DEFAULT_N_BUCKETS) -> np.ndarray:
    """Distributed hashed-feature counts: one streaming pass, a fixed
    (n_buckets,) int64 vector merged in the aggregation tree (elementwise
    add — linear, so partition/order invariant and exact)."""
    from ray.data.aggregate import AggregateFn

    def accumulate(acc, block):
        if acc is None:
            acc = np.zeros(n_buckets, dtype=np.int64)
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        return acc + _batch_bucket_counts(tbl, text_col, n_buckets)

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    agg = AggregateFn(init=lambda _: None, merge=merge, name="dsir",
                      accumulate_block=accumulate, finalize=lambda a: a)
    out = ds.aggregate(agg)
    acc = out["dsir"] if isinstance(out, dict) else out
    if acc is None:
        acc = np.zeros(n_buckets, dtype=np.int64)
    return acc


def log_ratio_weights(target_counts: np.ndarray, raw_counts: np.ndarray,
                      *, alpha: int = DEFAULT_ALPHA) -> np.ndarray:
    """λ = log p̂ − log q̂ with add-alpha smoothing (float64; the one
    deliberately-float step — everything upstream is exact integers)."""
    t = target_counts.astype(np.float64) + float(alpha)
    r = raw_counts.astype(np.float64) + float(alpha)
    return (np.log(t) - math.log(t.sum())) - (np.log(r) - math.log(r.sum()))


def _gumbel(doc_id, seed: int) -> float:
    u = (_md5_u64(f"{doc_id}:{seed}") + 1) / float(2**64 + 2)
    return -math.log(-math.log(u))


def score(ds, lam: np.ndarray, *, id_col: str = "doc_id",
          text_col: str = "text"):
    """(doc_id, logw) per document — stateless inference map; λ ships once
    in the closure (n_buckets doubles)."""
    nb = len(lam)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        out = np.empty(batch.num_rows, dtype=np.float64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            feats = doc_features(t)
            if feats:
                b = np.fromiter((_md5_u32(x) % nb for x in feats),
                                dtype=np.int64, count=len(feats))
                out[i] = lam[b].sum()
            else:
                out[i] = 0.0
        return pa.table({id_col: ids, "logw": pa.array(out, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def dsir_select(ds, lam: np.ndarray, k: int, *, seed: int = 0,
                gumbel: bool = True, id_col: str = "doc_id",
                text_col: str = "text"):
    """Top-k resample by log w (+ content-addressed Gumbel when
    ``gumbel``): per-batch partial top-k → single small final fold — the
    engine's top-k reduce, never a global sort. Returns (doc_id, logw,
    key) ordered by (key desc, doc_id)."""
    scored = score(ds, lam, id_col=id_col, text_col=text_col)

    def add_key(batch: pa.Table) -> pa.Table:
        if gumbel:
            g = np.fromiter((_gumbel(d, seed) for d in batch[id_col].to_pylist()),
                            dtype=np.float64, count=batch.num_rows)
        else:
            g = np.zeros(batch.num_rows, dtype=np.float64)
        key = batch["logw"].to_numpy(zero_copy_only=False) + g
        return batch.append_column("key", pa.array(key, pa.float64()))

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[("key", "descending"),
                                                (id_col, "ascending")])
        return batch.take(idx[:k])

    partials = (scored
                .map_batches(add_key, batch_format="pyarrow",
                             zero_copy_batch=True)
                .map_batches(local_topk, batch_format="pyarrow",
                             zero_copy_batch=True))
    return partials.repartition(1).map_batches(local_topk,
                                               batch_format="pyarrow",
                                               batch_size=None)


def feature_counts_sql(*, sides: list[tuple[str, str]],
                       text_expr: str = "text",
                       n_buckets: int = DEFAULT_N_BUCKETS) -> str:
    """DuckDB replay of the exact-integer bucket counts: same tokenizer,
    same unigram+bigram feature set (the PMI oracle's generate_series
    zip), same md5-u32 bucket. ``sides`` = [(label, source_sql), ...];
    emits (side, bucket, n) over all sides."""
    parts = []
    for label, source in sides:
        parts.append(f"""
SELECT '{label}' AS side, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT CAST(('0x' || substr(md5(f), 1, 8)) AS UBIGINT) % {n_buckets}
         AS bucket
  FROM (
    SELECT unnest(t) AS f
    FROM (SELECT regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS t
          FROM {source})
    UNION ALL
    SELECT t[i] || ' ' || t[i + 1] AS f
    FROM (SELECT regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS t
          FROM {source}),
         UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  )
)
GROUP BY bucket""")
    return " UNION ALL ".join(parts)
