"""Join operators beyond Dataset.join (SURVEY.md §2.4 / §2.11).

broadcast_semi_join   J3 semi-join: the small key side goes to the object store
                      once (ray.put); every map_batches task filters its batch
                      against the broadcast set — no shuffle of the big side at
                      all (the pattern the reference's client-side search
                      semi-join, apps/web/lib/store.ts:201-205, becomes at scale).

interval_join_count   J7 interval/range join, count form: for each left row
                      (key, ts), the number of right rows with the same key and
                      right_ts ∈ [ts − before, ts + after). The count form is
                      the scale-sane default (pair emission explodes on dense
                      windows); same cogroup-via-union + per-partition
                      searchsorted machinery as the as-of join.

asof_join_latest      As-of join (Ray Data has no native one): for each left row
                      (key, ts) attach the latest right row with the same key and
                      right_ts <= ts. Implemented as the cogroup-via-union
                      pattern: both sides are tagged, hash-partitioned on a
                      COARSE key (never group-per-key), unioned, and each
                      partition does a vectorized sorted-merge (np.searchsorted
                      per key present in the partition).

Partitioning assumption (documented per the custom-operator mandate): all rows
of one join key land in one coarse partition — guaranteed by the shared
``key % n_parts`` hash on both sides. Skewed hot keys bound the partition size;
raise ``n_parts`` proportionally to cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def drop_empty_blocks(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Guard a ``Dataset.join`` input against a Ray 2.49 shuffle defect.

    The hash-shuffle join broadcasts each input's schema to its aggregators by
    fanning out typed EMPTY shards — but only alongside the FIRST block of the
    input, and the shuffle task returns early for a block with 0 rows
    (``hash_shuffle.py`` ``_shuffle_block``), while the once-only broadcast
    flag is burned regardless. So if the first dispatched block of either side
    is empty (typed or not), every join partition that receives no actual rows
    is finalized as a SCHEMA-LESS table and pyarrow's join raises
    ``ArrowInvalid: No match ... for key field reference`` — a nondeterministic
    crash that appears exactly when a filter/map_groups upstream of a join
    leaves empty blocks (reproduced: tests/test_joins.py).

    The guard materializes the dataset (callers pass inputs that are already
    materialized or aggregate-small) and rebuilds it from the non-empty block
    REFS — metadata filtering only, no data copy. An all-empty dataset becomes
    a single typed empty block (preserving the schema for downstream map/agg
    consumers) — but note empty blocks are never shuffled at all, so a join
    whose input side is ENTIRELY empty still crashes: callers must
    short-circuit the zero-row case (see dup_clusters_distributed)."""
    mat = ds.materialize()
    refs = [br
            for b in mat.iter_internal_ref_bundles()
            for br, md in zip(b.block_refs, b.metadata)
            if md.num_rows is None or md.num_rows > 0]
    if not refs:
        schema = mat.schema()
        base = getattr(schema, "base_schema", None) if schema is not None \
            else None
        if base is None:
            return mat
        return ray.data.from_arrow(base.empty_table())
    return ray.data.from_arrow_refs(refs)


def broadcast_semi_join(ds: "ray.data.Dataset", key_col: str,
                        keys) -> "ray.data.Dataset":
    """Keep rows whose ``key_col`` is in ``keys`` (an iterable collected from the
    small side). The key set ships to the object store once. Integer keys use a
    sorted-array binary search; any other type falls back to a hash set."""
    key_list = list(keys)
    int_keys = all(isinstance(k, (int, np.integer)) for k in key_list)
    if int_keys:
        payload = np.unique(np.asarray(key_list, dtype=np.int64)) if key_list \
            else np.zeros(0, dtype=np.int64)
    else:
        payload = frozenset(key_list)
    ref = ray.put(payload)

    def f(batch: pa.Table) -> pa.Table:
        keyset = ray.get(ref)
        if isinstance(keyset, np.ndarray):
            vals = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(keyset) == 0:
                mask = np.zeros(len(vals), bool)
            else:
                idx = np.searchsorted(keyset, vals)
                idx[idx >= len(keyset)] = 0
                mask = keyset[idx] == vals
        else:
            mask = np.fromiter((v in keyset for v in batch[key_col].to_pylist()),
                               dtype=bool, count=batch.num_rows)
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def interval_join_count(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
                        left_key: str, right_key: str, left_ts: str,
                        right_ts: str, before_us: int, after_us: int,
                        out_col: str = "n_in_window",
                        n_parts: int = 64) -> "ray.data.Dataset":
    """left + count of right rows with the same key and
    right_ts ∈ [left_ts − before_us, left_ts + after_us)  (right-open: with
    after_us=0 a row never counts itself or simultaneous rows).

    Partitioning assumption (as asof_join_latest): all rows of one key share a
    coarse partition via the common ``key % n_parts`` hash of both sides."""
    for reserved in ("part", "_side", out_col):
        if reserved in left.schema().names:
            raise ValueError(f"interval_join_count: left column {reserved!r} "
                             "collides with an internal/output column — rename it")

    left_schema = left.schema()
    left_schema_names = left_schema.names
    left_schema_types = left_schema.types
    left_ts_type = left_schema_types[left_schema_names.index(left_ts)]
    left_key_type = left_schema_types[left_schema_names.index(left_key)]

    def tag_left_full(batch: pa.Table) -> pa.Table:
        keys = batch[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        out = batch.append_column("part", pa.array((keys % n_parts).astype(np.int32)))
        return out.append_column("_side", pa.array(np.zeros(len(keys), dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {name: pa.nulls(len(keys), typ)
                for name, typ in zip(left_schema_names, left_schema_types)}
        t = pa.table(cols)
        # cast to the LEFT key dtype so union() sees one block schema (a
        # mixed int32/int64 key column trips Ray's schema check)
        t = t.set_column(t.column_names.index(left_key),
                         left_key, pa.array(keys, pa.int64()).cast(left_key_type))
        t = t.set_column(t.column_names.index(left_ts), left_ts,
                         batch[right_ts].cast(left_ts_type))
        t = t.append_column("part", pa.array((keys % n_parts).astype(np.int32)))
        return t.append_column("_side", pa.array(np.ones(len(keys), dtype=np.int8)))

    lt = left.map_batches(tag_left_full, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def merge(part: pa.Table) -> pa.Table:
        side = part["_side"].to_numpy(zero_copy_only=False)
        keys = part[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part[left_ts].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        l_tbl = part.take(l_idx).drop_columns(["part", "_side"])
        counts = np.zeros(len(l_idx), dtype=np.int64)
        if len(r_idx) and len(l_idx):
            rk, rt_ = keys[r_idx], ts[r_idx]
            order = np.lexsort((rt_, rk))
            rk, rt_ = rk[order], rt_[order]
            lk, lt_ = keys[l_idx], ts[l_idx]
            # sort left by key once and walk key RUNS — a per-key `lk == k`
            # boolean scan would be O(keys · rows) per partition, quadratic
            # when partitions hold many keys at scale
            lorder = np.argsort(lk, kind="stable")
            lk_s = lk[lorder]
            runs = np.concatenate([[0], np.nonzero(np.diff(lk_s))[0] + 1,
                                   [len(lk_s)]])
            for a, b in zip(runs[:-1], runs[1:]):
                k = lk_s[a]
                s, e = np.searchsorted(rk, k, "left"), np.searchsorted(rk, k, "right")
                if s == e:
                    continue
                sel = lorder[a:b]
                lo = np.searchsorted(rt_[s:e], lt_[sel] - before_us, "left")
                hi = np.searchsorted(rt_[s:e], lt_[sel] + after_us, "left")
                counts[sel] = hi - lo
        return l_tbl.append_column(out_col, pa.array(counts, pa.int64()))

    return both.groupby("part").map_groups(merge, batch_format="pyarrow")


def asof_join_latest(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
                     left_key: str, right_key: str, left_ts: str, right_ts: str,
                     out_ts: str = "matched_ts",
                     n_parts: int = 64) -> "ray.data.Dataset":
    """left + (latest right_ts <= left_ts per key) → left columns + ``out_ts``
    (null when no right row qualifies)."""

    for reserved in ("part", "_side", out_ts):
        if reserved in left.schema().names:
            raise ValueError(f"asof_join_latest: left column {reserved!r} collides "
                             "with an internal/output column — rename it first")

    # carry the full left row through the shuffle; right contributes only (k, t)
    def tag_left_full(batch: pa.Table) -> pa.Table:
        keys = batch[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        out = batch.append_column("part", pa.array((keys % n_parts).astype(np.int32)))
        out = out.append_column("_side", pa.array(np.zeros(len(keys), dtype=np.int8)))
        return out

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {name: pa.nulls(len(keys), typ)
                for name, typ in zip(left_schema_names, left_schema_types)}
        t = pa.table(cols)
        # cast to the LEFT key dtype so union() sees one block schema
        t = t.set_column(t.column_names.index(left_key),
                         left_key, pa.array(keys, pa.int64()).cast(left_key_type))
        t = t.set_column(t.column_names.index(left_ts), left_ts,
                         batch[right_ts].cast(left_ts_type))
        t = t.append_column("part", pa.array((keys % n_parts).astype(np.int32)))
        t = t.append_column("_side", pa.array(np.ones(len(keys), dtype=np.int8)))
        return t

    left_schema = left.schema()
    left_schema_names = left_schema.names
    left_schema_types = left_schema.types
    left_ts_type = left_schema_types[left_schema_names.index(left_ts)]
    left_key_type = left_schema_types[left_schema_names.index(left_key)]

    lt = left.map_batches(tag_left_full, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def merge(part: pa.Table) -> pa.Table:
        side = part["_side"].to_numpy(zero_copy_only=False)
        keys = part[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part[left_ts].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        l_tbl = part.take(l_idx).drop_columns(["part", "_side"])
        matched = np.full(len(l_idx), np.iinfo(np.int64).min, dtype=np.int64)
        if len(r_idx) and len(l_idx):
            rk, rt_ = keys[r_idx], ts[r_idx]
            order = np.lexsort((rt_, rk))
            rk, rt_ = rk[order], rt_[order]
            lk, lt_ = keys[l_idx], ts[l_idx]
            # per key-RUN (left sorted once): a per-key `lk == k` scan would be
            # O(keys · rows) per partition — quadratic at scale
            lorder = np.argsort(lk, kind="stable")
            lk_s = lk[lorder]
            runs = np.concatenate([[0], np.nonzero(np.diff(lk_s))[0] + 1,
                                   [len(lk_s)]])
            for a, b in zip(runs[:-1], runs[1:]):
                k = lk_s[a]
                s, e = np.searchsorted(rk, k, "left"), np.searchsorted(rk, k, "right")
                if s == e:
                    continue
                sel = lorder[a:b]
                pos = np.searchsorted(rt_[s:e], lt_[sel], "right") - 1
                ok = pos >= 0
                matched[sel[ok]] = rt_[s:e][pos[ok]]
        valid = matched != np.iinfo(np.int64).min
        m = pa.array(np.where(valid, matched, 0).view("datetime64[us]"),
                     pa.timestamp("us"), mask=~valid)
        return l_tbl.append_column(out_ts, m)

    return both.groupby("part").map_groups(merge, batch_format="pyarrow")


def broadcast_lookup_join(ds: "ray.data.Dataset", key_col: str,
                          small: "ray.data.Dataset", *,
                          small_key_col: str | None = None,
                          attach_cols: list[str] | None = None,
                          how: str = "inner",
                          broadcast_limit: int = 5_000_000) -> "ray.data.Dataset":
    """J1 dimension-table attach — the broadcast hash join: the SMALL side
    (a dimension table: customers, hosts, label maps) ships to the object
    store ONCE and every task attaches its columns by a C++ ``index_in``
    probe; the big side never shuffles (a hash-shuffle ``Dataset.join``
    would move every row of BOTH sides for a lookup whose right side fits
    in memory). ``how``: "inner" drops probe misses, "left" keeps them with
    null attach columns.

    Scale contract: the small side is guarded by ``broadcast_limit`` rows
    and must be UNIQUE on its key (a dimension, not a fact) — both raise,
    not guess. Past the limit use ``Dataset.join`` (with
    ``drop_empty_blocks``) and pay the shuffle."""
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_lookup_join: how={how!r}")
    skey = small_key_col or key_col
    sm = small.materialize()
    n = sm.count()
    if n > broadcast_limit:
        raise ValueError(
            f"broadcast_lookup_join: small side has {n} rows > "
            f"broadcast_limit={broadcast_limit} — use Dataset.join")
    blocks = [b for b in (ray.get(r) for r in sm.to_arrow_refs())
              if skey in b.column_names]
    tbl = (pa.concat_tables(blocks).combine_chunks() if blocks
           else None)
    if tbl is None:
        # every block came back zero-column (the Ray empty-schema artifact)
        # — type the empty dimension from the dataset's reported schema so
        # a left join's attach columns don't drift to string
        sch = sm.schema()
        names = list(sch.names) if sch is not None else []
        need = [skey] + list(attach_cols or [])
        missing = [c for c in need if c not in names]
        if missing:
            raise ValueError(
                "broadcast_lookup_join: small side is empty and its schema "
                f"does not expose {missing} — cannot type the attach "
                "columns; pass a typed (possibly empty) dimension")
        types = {n: t for n, t in zip(names, sch.types)}
        keep = attach_cols if attach_cols is not None else \
            [c for c in names if c != skey]
        tbl = pa.table({c: pa.array([], types[c]) for c in [skey] + keep})
    cols = attach_cols if attach_cols is not None else \
        [c for c in tbl.column_names if c != skey]
    if tbl.num_rows and len(pc.unique(tbl[skey])) != tbl.num_rows:
        raise ValueError(
            f"broadcast_lookup_join: small side key {skey!r} is not unique "
            "— a dimension table must have one row per key")
    if tbl[skey].null_count:
        # a null dimension key passes the uniqueness check (pc.unique
        # counts null once) and index_in would resolve null probes against
        # it — letting null big-side keys match and survive an inner join,
        # diverging from SQL equi-join semantics (null never equals null)
        raise ValueError(
            f"broadcast_lookup_join: small side key {skey!r} contains null "
            "— SQL equi-join semantics require non-null dimension keys")
    ref = ray.put(tbl.select([skey] + cols))

    def attach(batch: pa.Table) -> pa.Table:
        from janet_ray.functions.broadcast import get_broadcast

        dim = get_broadcast(ref)
        for c in cols:
            if c in batch.column_names:
                raise ValueError(f"broadcast_lookup_join: attach column "
                                 f"{c!r} already exists on the big side")
        idx = pc.index_in(batch[key_col],
                          value_set=dim[skey].combine_chunks())
        out = batch
        for c in cols:
            out = out.append_column(c, pc.take(dim[c], idx))
        if how == "inner":
            out = out.filter(pc.is_valid(idx))
        return out

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)
