"""Column-level table profiling — row count, null count, min, max per
column in ONE streaming pass over the table (the data-quality report an
ingest run records next to its lineage manifests: schema drift, null
explosions, and out-of-range keys surface here before a 100 TB job spends
compute downstream; the reference-side analogue is the upload-validation
filter family, SURVEY §2.2 P18, lifted from per-request checks to a
corpus-wide report).

Scale shape: per-batch partials emit ONE long-format row per column per
batch — ``(col_name, n, n_nulls, min_i, min_s, max_i, max_s)`` — and a
single ``groupby(col_name)`` reduces them (the key space is the COLUMN
LIST, a few dozen rows; the shuffle moves #columns × #batches tiny rows,
never data). Min/max reduce in their NATIVE domain — integer-family
columns through the ``*_i`` int64 lane, strings through the ``*_s`` lane —
because rendering first would corrupt numeric order ('10' < '2'); the
rendered VARCHAR view is produced only in the final stateless map, with
rendering rules pinned to what ``CAST(x AS VARCHAR)`` produces in the SQL
twin (ints and strings only — float/timestamp rendering is
dialect-divergent, so those columns are profiled via their exact-int
derived lanes upstream or excluded by the caller)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _partials(cols: list[str]):
    def f(batch: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        for c in cols:
            col = batch[c]
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            if len(col) == col.null_count:
                mn = mx = None
            else:
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if pa.types.is_null(col.type):
                # an all-null BLOCK types the column null (e.g. per-row
                # from_items blocks) — contributes nulls only, no min/max
                min_i.append(None); max_i.append(None)
                min_s.append(None); max_s.append(None)
            elif pa.types.is_integer(col.type):
                min_i.append(mn); max_i.append(mx)
                min_s.append(None); max_s.append(None)
            elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                min_i.append(None); max_i.append(None)
                min_s.append(mn); max_s.append(mx)
            else:
                raise TypeError(
                    f"table_profile: column {c!r} has type {col.type} — "
                    "only integer and string columns have a pinned "
                    "VARCHAR rendering (module docstring)")
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "min_i": pa.array(min_i, pa.int64()),
            "max_i": pa.array(max_i, pa.int64()),
            "min_s": pa.array(min_s, pa.string()),
            "max_s": pa.array(max_s, pa.string()),
        })

    return f


def table_profile(ds, columns: list[str]):
    """Profile ``columns`` of ``ds`` → one row per column:
    ``(col_name, n_rows, n_nulls, min_val, max_val)`` with min/max rendered
    as VARCHAR under the pinned rules (int/string columns only)."""
    from ray.data.aggregate import Max, Min, Sum

    reduced = (ds.map_batches(_partials(columns), batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("col_name")
               .aggregate(Sum("n", alias_name="n_rows"),
                          Sum("n_nulls", alias_name="n_nulls_sum"),
                          Min("min_i", alias_name="min_i"),
                          Max("max_i", alias_name="max_i"),
                          Min("min_s", alias_name="min_s"),
                          Max("max_s", alias_name="max_s")))

    def render(batch: pa.Table) -> pa.Table:
        if "col_name" not in batch.column_names:
            return pa.table({"col_name": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_nulls": pa.array([], pa.int64()),
                             "min_val": pa.array([], pa.string()),
                             "max_val": pa.array([], pa.string())})
        # Ray's Min/Max over an all-null lane yields a NULL-typed column —
        # cast both lanes so coalesce sees (string, string)
        min_val = pc.coalesce(pc.cast(batch["min_i"], pa.string()),
                              pc.cast(batch["min_s"], pa.string()))
        max_val = pc.coalesce(pc.cast(batch["max_i"], pa.string()),
                              pc.cast(batch["max_s"], pa.string()))
        return pa.table({
            "col_name": batch["col_name"],
            "n_rows": pc.cast(batch["n_rows"], pa.int64()),
            "n_nulls": pc.cast(batch["n_nulls_sum"], pa.int64()),
            "min_val": min_val,
            "max_val": max_val,
        })

    return reduced.map_batches(render, batch_format="pyarrow",
                               zero_copy_batch=True)


def table_profile_sql(table: str, columns: list[str]) -> str:
    """SQL twin: one UNION ALL branch per column, CAST(... AS VARCHAR)
    rendering (matches the engine's pinned int/string rendering)."""
    parts = [
        f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
        f" CAST(min({c}) AS VARCHAR) AS min_val,"
        f" CAST(max({c}) AS VARCHAR) AS max_val FROM {table}"
        for c in columns
    ]
    return "\nUNION ALL\n".join(parts)
