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


def global_rank(ds, col: str, *, out_col: str = "rank",
                max_distinct: int = 5_000_000):
    """EXACT global min-rank of an integer column appended to every row —
    SQL ``rank() OVER (ORDER BY col)`` semantics (ties share the smallest
    rank; rank = 1 + count of strictly-smaller values). The per-row form of
    ``distributed_quantiles``' cutpoints: quality-percentile labels for
    curriculum schedules / score-calibrated mixing, computed without a
    global sort.

    Scale shape: per-batch value-count partials (the combiner) → ONE small
    groupby over (value, count) rows → driver cumsum bounded by the
    DISTINCT-value count (guarded by ``max_distinct`` — quantize a
    continuous column upstream; the bound is checked BEFORE any block is
    pulled) → the (values, ranks) arrays broadcast once as numpy (zero-copy
    per worker) → stateless searchsorted attach map. The corpus itself
    never shuffles; all columns pass through.

    Contract: ``col`` is integer-typed and non-null (a null has no place in
    a total order both sides replay — raise, don't guess)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    from janet_ray.functions.broadcast import get_broadcast

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if c.null_count:
            raise ValueError(f"global_rank: column {col!r} contains nulls")
        if not pa.types.is_integer(c.type):
            raise TypeError(f"global_rank: column {col!r} must be integer, "
                            f"got {c.type}")
        agg = (pa.table({"v": pc.cast(c, pa.int64())})
               .group_by("v").aggregate([("v", "count")]))
        return pa.table({"v": agg["v"],
                         "c": agg["v_count"].cast(pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("v").aggregate(Sum("c", alias_name="n"))
              .materialize())
    n_distinct = counts.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"global_rank: {n_distinct} distinct values exceed "
            f"max_distinct={max_distinct} — quantize the column upstream")
    blocks = [b for b in (_ray.get(r) for r in counts.to_arrow_refs())
              if "v" in b.column_names]
    if blocks:
        tbl = pa.concat_tables(blocks)
        vals = tbl["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        ranks = np.empty_like(cnts)
        ranks[0] = 1
        if len(cnts) > 1:
            np.cumsum(cnts[:-1], out=ranks[1:])
            ranks[1:] += 1
    else:
        vals = np.array([], dtype=np.int64)
        ranks = np.array([], dtype=np.int64)
    ref = _ray.put((vals, ranks))

    def attach(batch: pa.Table) -> pa.Table:
        v, r = get_broadcast(ref)
        c = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            if len(c):
                raise ValueError("global_rank: rows present in the attach "
                                 "pass but none were counted — upstream "
                                 "dataset is not deterministic across "
                                 "executions")
            return batch.append_column(out_col, pa.array([], pa.int64()))
        idx = np.clip(np.searchsorted(v, c), 0, len(v) - 1)
        if not np.array_equal(v[idx], c):
            # the attach pass re-executes upstream lineage; a value absent
            # from the counts pass means that lineage is non-deterministic —
            # fail loudly instead of emitting a neighboring value's rank
            raise ValueError("global_rank: value absent from the counts "
                             "pass — upstream dataset is not deterministic "
                             "across executions")
        return batch.append_column(out_col, pa.array(r[idx], pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)
