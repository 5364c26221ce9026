"""Distributed range (interval) join — points-in-interval matching, the
non-equi join Ray Data's ``Dataset.join`` cannot express (SURVEY.md §2.6).

Semantics: emit one row per (interval, point) pair with
``start <= ts < end`` (half-open) and, when ``key_col`` is given, equal join
keys — the "events inside each session/maintenance/validity window" query
shape (Postgres range join / Spark interval join analogue).

Scale shape (the engine's standard two-sided bucket shuffle):

  1. **time-bin bucketing** — pick ``bin_width`` (same unit as the
     timestamps, int64 after cast). Each POINT lands in exactly one bin
     (ts // w); each INTERVAL is replicated to every bin it overlaps
     (start // w .. (end-1) // w). Because the point side is never
     replicated, a pair meets in exactly ONE bin — the point's — so the
     join is duplicate-free by construction, no distinct pass.
  2. **both sides are normalized to ONE unified schema** (the other side's
     payload columns null-filled) and unioned — the graph.py cogroup-union
     trick — so a single coarse hash shuffle on (bin [, key]) co-locates
     everything that can match.
  3. **per-partition vectorized probe** — both sides factorize (bin, key)
     into a composite group id; points sort by (group, ts); every interval
     finds its matches with ``searchsorted`` (group segment, then the
     [start, end) window inside it — two binary searches per interval)
     and pairs are emitted with the multi-range gather (repeat + arange);
     no per-PAIR Python work.

Partitioning assumption (documented per the custom-operator mandate):
``bin_width`` should be on the order of the TYPICAL interval length — the
interval side's replication factor is ceil(len / w) + 1, and
``max_bins_per_interval`` (default 4096) raises on pathological intervals
(a year-long interval with a 1-second bin) instead of silently exploding
the shuffle. Hot bins (all points in one hour) are bounded by the bin's own
point count, the same skew exposure as any time-keyed groupby.

The unified schema requires both sides' column types up front:
``Dataset.schema()`` is metadata-only for parquet sources and executes at
most one upstream block for derived datasets — a bounded, one-off cost.

SQL twin: a plain non-equi JOIN (`ON key AND ts >= start AND ts < end`) —
exact, value-hash strict (timestamp comparisons are int64 microseconds on
both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from janet_ray.functions.partitioning import N_PARTS_DEFAULT, stable_hash_column

_HELPERS = ("__bin", "__side", "__s", "__e", "__ts", "__key", "part")


def _to_i64(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return np.asarray(arr.to_pylist(), dtype=np.int64)


def _key_np(t: pa.Table, key_col: str | None, n: int):
    if key_col is None:
        return np.zeros(n, dtype=np.int64)
    col = t["__key"]
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.asarray(col.to_pylist(), dtype=object)


def _pa_schema(ds) -> pa.Schema:
    sch = ds.schema()
    return getattr(sch, "base_schema", sch)


def range_join(intervals, points, *, start_col: str, end_col: str,
               ts_col: str, key_col: str | None = None,
               bin_width: int, left_cols: list[str] | None = None,
               right_cols: list[str] | None = None,
               n_parts: int = N_PARTS_DEFAULT,
               max_bins_per_interval: int = 4096):
    """→ Dataset(left_cols + right_cols) of matching (interval, point) pairs.
    ``left_cols``/``right_cols`` default to every column of each side except
    the start/end/ts helpers; the two projections must be disjoint (rename
    upstream on collision). ``key_col`` may appear in either projection."""
    if bin_width < 1:
        raise ValueError("bin_width must be >= 1")
    lsch, rsch = _pa_schema(intervals), _pa_schema(points)
    lcols = list(left_cols) if left_cols is not None else \
        [c for c in lsch.names if c not in (start_col, end_col)]
    rcols = list(right_cols) if right_cols is not None else \
        [c for c in rsch.names if c != ts_col and c not in lcols]
    dup = set(lcols) & set(rcols)
    if dup:
        raise ValueError(f"left/right projections overlap: {sorted(dup)}")
    ltypes = {c: lsch.field(c).type for c in lcols}
    rtypes = {c: rsch.field(c).type for c in rcols}

    def _unified(n: int, own: dict[str, pa.Array], helpers: dict) -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = own.get(c, pa.nulls(n, ltypes[c]))
        for c in rcols:
            cols[c] = own.get(c, pa.nulls(n, rtypes[c]))
        zero = pa.array(np.zeros(n, dtype=np.int64), pa.int64())
        cols["__bin"] = helpers["__bin"]
        cols["__side"] = helpers["__side"]
        cols["__s"] = helpers.get("__s", zero)
        cols["__e"] = helpers.get("__e", zero)
        cols["__ts"] = helpers.get("__ts", zero)
        if key_col is not None:
            cols["__key"] = helpers["__key"]
        t = pa.table(cols)
        h = stable_hash_column(t, ["__bin"] + (["__key"] if key_col else []))
        return t.append_column("part", pa.array(
            (h % n_parts).astype(np.int32), pa.int32()))

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = _to_i64(batch[start_col])
        e = _to_i64(batch[end_col])
        idx = np.nonzero(e > s)[0]  # empty/inverted intervals match nothing
        s, e = s[idx], e[idx]
        first = s // bin_width
        counts = ((e - 1) // bin_width) - first + 1
        if counts.size and counts.max() > max_bins_per_interval:
            raise ValueError(
                f"interval spans {int(counts.max())} bins > "
                f"max_bins_per_interval={max_bins_per_interval}; raise "
                f"bin_width or split the interval upstream")
        rep_pos = np.repeat(np.arange(len(idx)), counts)
        off = np.arange(len(rep_pos)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        taken = batch.take(pa.array(idx[rep_pos], pa.int64()))
        n = len(rep_pos)
        helpers = {"__bin": pa.array(np.repeat(first, counts) + off, pa.int64()),
                   "__side": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
                   "__s": pa.array(s[rep_pos], pa.int64()),
                   "__e": pa.array(e[rep_pos], pa.int64())}
        if key_col is not None:
            helpers["__key"] = taken[key_col]
        return _unified(
            n, {c: taken[c] for c in lcols if c in batch.column_names},
            helpers)

    def tag_points(batch: pa.Table) -> pa.Table:
        ts = _to_i64(batch[ts_col])
        n = batch.num_rows
        helpers = {"__bin": pa.array(ts // bin_width, pa.int64()),
                   "__side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                   "__ts": pa.array(ts, pa.int64())}
        if key_col is not None:
            helpers["__key"] = batch[key_col]
        return _unified(
            n, {c: batch[c] for c in rcols if c in batch.column_names},
            helpers)

    both = intervals.map_batches(
        tag_intervals, batch_format="pyarrow", zero_copy_batch=True).union(
        points.map_batches(tag_points, batch_format="pyarrow",
                           zero_copy_batch=True))

    def _empty_out() -> pa.Table:
        cols = {c: pa.nulls(0, ltypes[c]) for c in lcols}
        cols.update({c: pa.nulls(0, rtypes[c]) for c in rcols})
        return pa.table(cols)

    def probe(part_t: pa.Table) -> pa.Table:
        side = part_t["__side"].to_numpy(zero_copy_only=False)
        lt = part_t.take(pa.array(np.nonzero(side == 0)[0], pa.int64()))
        rt = part_t.take(pa.array(np.nonzero(side == 1)[0], pa.int64()))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return _empty_out()
        lb = lt["__bin"].to_numpy(zero_copy_only=False)
        rb = rt["__bin"].to_numpy(zero_copy_only=False)
        lk = _key_np(lt, key_col, lt.num_rows)
        rk = _key_np(rt, key_col, rt.num_rows)
        # joint factorization → composite (key, bin) group ids on both sides
        _, kcodes = np.unique(np.concatenate([lk, rk]), return_inverse=True)
        _, bcodes = np.unique(np.concatenate([lb, rb]), return_inverse=True)
        nb = int(bcodes.max()) + 1
        lg = kcodes[:len(lk)] * nb + bcodes[:len(lb)]
        rg = kcodes[len(lk):] * nb + bcodes[len(lb):]
        ts = rt["__ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, rg))
        rg_s, ts_s = rg[order], ts[order]
        s = lt["__s"].to_numpy(zero_copy_only=False)
        e = lt["__e"].to_numpy(zero_copy_only=False)
        g_lo = np.searchsorted(rg_s, lg, side="left")
        g_hi = np.searchsorted(rg_s, lg, side="right")
        p_lo = np.fromiter(
            (lo + np.searchsorted(ts_s[lo:hi], sv, side="left")
             for lo, hi, sv in zip(g_lo, g_hi, s)),
            dtype=np.int64, count=len(lg))
        p_hi = np.fromiter(
            (lo + np.searchsorted(ts_s[lo:hi], ev, side="left")
             for lo, hi, ev in zip(g_lo, g_hi, e)),
            dtype=np.int64, count=len(lg))
        counts = p_hi - p_lo
        if counts.sum() == 0:
            return _empty_out()
        lrep = np.repeat(np.arange(len(lg)), counts)
        roff = np.arange(len(lrep)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        ridx = order[np.repeat(p_lo, counts) + roff]
        lout = lt.take(pa.array(lrep, pa.int64()))
        rout = rt.take(pa.array(ridx, pa.int64()))
        cols = {c: lout[c] for c in lcols}
        cols.update({c: rout[c] for c in rcols})
        return pa.table(cols)

    return both.groupby("part").map_groups(probe, batch_format="pyarrow")
