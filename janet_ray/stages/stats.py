"""Distributed summary statistics (training-data pipelines, SURVEY §2.11).

``distributed_quantiles`` — EXACT discrete quantiles for bounded-cardinality
columns (quantities, lengths, scores binned upstream): per-batch value_counts
partials → one small groupby over (value, count) → cumulative ranks on the
driver (bounded by the column's distinct-value count, NOT the row count).
The rank rule matches DuckDB ``quantile_disc``: element of 1-based rank
⌈q·n⌉. For continuous unbounded columns quantize first — the shuffle carries
(value, count) rows, so cardinality is the scale contract and it is the
caller's to bound.

``distinct_count`` — exact COUNT(DISTINCT col): per-batch local unique (the
combiner — duplicate-heavy batches shrink before the exchange) → groupby(col)
→ group count. One hash shuffle of distinct values only.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def distributed_quantiles(ds, col: str, qs: list[float]) -> "object":
    """pandas DataFrame (q, value) of exact discrete quantiles of ds[col]."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.drop_null(batch[col]))  # SQL: nulls ignored
        return pa.table({
            "value": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("value").aggregate(Sum("n", alias_name="n_total"))
              .take_all())  # bounded: one row per DISTINCT value
    counts.sort(key=lambda r: r["value"])
    values = np.array([r["value"] for r in counts])
    cum = np.cumsum([r["n_total"] for r in counts])
    n = int(cum[-1]) if len(cum) else 0
    import pandas as pd

    rows = []
    for q in qs:
        rank = max(1, math.ceil(q * n))  # DuckDB quantile_disc: 1-based ⌈q·n⌉
        idx = int(np.searchsorted(cum, rank))
        rows.append({"q": q, "value": values[idx] if n else None})
    return pd.DataFrame(rows)


def distinct_count(ds, col: str) -> "object":
    """pandas DataFrame with the exact distinct count of ds[col]."""

    def local_unique(batch: pa.Table) -> pa.Table:
        # drop nulls: COUNT(DISTINCT col) in SQL never counts the null group
        return pa.table({col: pc.unique(pc.drop_null(batch[col]))})

    from ray.data.aggregate import Count

    n = (ds.map_batches(local_unique, batch_format="pyarrow", zero_copy_batch=True)
         .groupby(col).aggregate(Count(alias_name="c")).count())
    import pandas as pd

    return pd.DataFrame({"n_distinct": [int(n)]})
