"""Quantile bucketing — the CCNet head/middle/tail split (Wenzek et al.
2020 §4.3: rank documents by a quality signal, cut the corpus at global
quantiles, keep/weight the buckets differently when building the training
mix), generalized to any numeric column and any cut list.

Two passes over the corpus, both cheap and both streaming:

  1. EXACT global cutpoints via ``stats.distributed_quantiles`` — value-count
     partials inside ``map_batches`` (the combiner), one small groupby whose
     shuffle volume is bounded by the column's DISTINCT-value count (the
     operator's scale contract: quality signals are quantized scores, token
     counts, or percent bins — never unbounded floats; quantize upstream if
     they are). The cutpoint rank rule is DuckDB ``quantile_disc`` (1-based
     ⌈q·n⌉), so the oracle replays it natively.
  2. a stateless ``map_batches`` assignment: ``bucket = #{cutpoints c :
     value > c}`` via one ``np.searchsorted`` per batch. The cutpoint list is
     tiny (len(qs) floats) and rides the task closure — no shuffle, no join.

Bucket semantics are pinned: value ≤ cut[0] → bucket 0 (label[0], the
"head"), cut[i-1] < value ≤ cut[i] → bucket i, value > cut[-1] → bucket
len(cuts) (the "tail"). Ties sit in the LOWER bucket, matching the SQL
``CASE WHEN v > c_k … WHEN v > c_1 … ELSE 0`` chain the oracle generates
from the same constants (``quantile_buckets_sql``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from janet_ray.stages.stats import distributed_quantiles

DEFAULT_QS = (1.0 / 3.0, 2.0 / 3.0)
DEFAULT_LABELS = ("head", "middle", "tail")


def quantile_buckets(ds, *, col: str, id_col: str = "doc_id",
                     qs: tuple = DEFAULT_QS, labels: tuple = DEFAULT_LABELS):
    """(id_col, col, bucket, bucket_label) per row; bucket i means the value
    sits between global cutpoints i-1 and i (ties to the lower bucket)."""
    if len(labels) != len(qs) + 1:
        raise ValueError("need len(qs) + 1 labels")
    cutdf = distributed_quantiles(ds, col, list(qs))
    cuts = np.asarray(cutdf["value"].tolist(), dtype=np.float64)
    if not np.all(np.diff(cuts) >= 0):
        raise ValueError("quantile cutpoints must be non-decreasing")
    label_arr = pa.array(labels, pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        # count of cutpoints strictly below v == searchsorted side='left'
        b = np.searchsorted(cuts, v, side="left").astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            col: batch[col],
            "bucket": pa.array(b, pa.int64()),
            "bucket_label": label_arr.take(pa.array(b)),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def quantile_buckets_sql(*, col_expr: str, out_col: str,
                         source: str = "documents",
                         id_col: str = "doc_id", qs: tuple = DEFAULT_QS,
                         labels: tuple = DEFAULT_LABELS,
                         cast: str = "BIGINT") -> str:
    """DuckDB replay from the same constants: ``quantile_disc`` cutpoints
    (the exact rank rule of distributed_quantiles), ties to the lower bucket
    via a descending strict-greater CASE chain."""
    cut_cols = ", ".join(
        f"quantile_disc(v, {q!r}) AS c{i}" for i, q in enumerate(qs))
    branches = " ".join(
        f"WHEN v > c{i} THEN {i + 1}"
        for i in reversed(range(len(qs))))
    lbl = ", ".join(f"'{s}'" for s in labels)
    return f"""
WITH vals AS (
  SELECT {id_col}, CAST({col_expr} AS {cast}) AS v FROM {source}
), cuts AS (
  SELECT {cut_cols} FROM vals
)
SELECT {id_col},
       v AS {out_col},
       CAST(CASE {branches} ELSE 0 END AS BIGINT) AS bucket,
       list_value({lbl})[CASE {branches} ELSE 0 END + 1] AS bucket_label
FROM vals, cuts
"""
