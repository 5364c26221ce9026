"""Crawl-snapshot diff — the delta between two crawls of the same keyed
corpus: which urls were ADDED, which were REMOVED, and which pages CHANGED
content between snapshots. The CC-style consumer is incremental curation:
a monthly crawl is diffed against the previous one and only the delta flows
into re-extraction / re-dedup (the reference analogue is the resume
anti-join, `apps/legacy/rename.ts:61-64` — "which inputs are not in the
completed mapping"; the diff generalizes it to both directions plus a
content-fingerprint comparison).

Scale shape (ONE union shuffle, payload never moves):

  1. each side projects to ``(key, fp)`` — the fingerprint column is
     computed upstream (`textstats.fingerprint`, the exact-dedup key), so
     the page payload never enters this operator;
  2. both sides co-partition on the key via the ENGINE-WIDE stable
     partitioner (`functions/partitioning.with_part`) and union with a
     side tag — one shuffle of ~50-byte rows;
  3. per partition, a full-outer Arrow join (C++ Acero, no per-row Python)
     classifies every key: old-only → ``removed``, new-only → ``added``,
     fingerprint mismatch → ``changed``; UNCHANGED keys are dropped here,
     inside the partition — the output is proportional to the DELTA, not
     the corpus (the property that makes monthly re-curation cheap).

Duplicate keys within one side are pinned to the MIN fingerprint string
(deterministic, replayed by ``min(fp) GROUP BY key`` in the SQL twin);
keys are compared in the STRING domain like `frontier.anti_join_values`
(non-string keys are cast — a contract, not a crash).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from janet_ray.functions.partitioning import N_PARTS_DEFAULT, with_part

_OUT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("status", pa.string()),
    ("old_fp", pa.string()),
    ("new_fp", pa.string()),
])


def _side(tag_val: int, key_col: str, fp_col: str, n_parts: int):
    def f(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch[key_col], pa.string())
        fps = pc.cast(batch[fp_col], pa.string())
        t = with_part(pa.table({"key": keys, "fp": fps}), ["key"],
                      n_parts=n_parts)
        return t.append_column(
            "tag", pa.array(np.full(len(keys), tag_val, dtype=np.int8)))

    return f


def _diff_part(part: pa.Table) -> pa.Table:
    empty = _OUT_SCHEMA.empty_table()
    if part.num_rows == 0 or "key" not in part.column_names:
        return empty
    # pin duplicate keys within a side to min(fp) — deterministic and
    # SQL-replayable; one Arrow group_by, no per-row Python
    agg = (pa.table({"key": part["key"], "fp": part["fp"],
                     "tag": part["tag"]})
           .group_by(["tag", "key"]).aggregate([("fp", "min")]))
    is_new = pc.equal(agg["tag"], pa.scalar(1, pa.int8()))
    old_t = (agg.filter(pc.invert(is_new))
             .select(["key", "fp_min"]).rename_columns(["key", "old_fp"]))
    new_t = (agg.filter(is_new)
             .select(["key", "fp_min"]).rename_columns(["key", "new_fp"]))
    j = old_t.join(new_t, keys="key", join_type="full outer",
                   coalesce_keys=True)
    old_fp, new_fp = j["old_fp"], j["new_fp"]
    added = pc.is_null(old_fp)
    removed = pc.is_null(new_fp)
    changed = pc.and_kleene(
        pc.and_(pc.invert(added), pc.invert(removed)),
        pc.not_equal(old_fp, new_fp))
    status = pc.if_else(added, pa.scalar("added", pa.string()),
                        pc.if_else(removed, pa.scalar("removed", pa.string()),
                                   pc.if_else(changed,
                                              pa.scalar("changed", pa.string()),
                                              pa.scalar(None, pa.string()))))
    out = pa.table({"url": pc.cast(j["key"], pa.string()),
                    "status": status,
                    "old_fp": pc.cast(old_fp, pa.string()),
                    "new_fp": pc.cast(new_fp, pa.string())})
    return out.filter(pc.is_valid(status))


def snapshot_diff(old, new, *, key_col: str = "url", fp_col: str = "fp",
                  n_parts: int = N_PARTS_DEFAULT):
    """Delta rows ``(url, status ∈ added|removed|changed, old_fp, new_fp)``
    between two snapshots keyed by ``key_col`` with content fingerprints in
    ``fp_col``. Unchanged keys are dropped inside the shuffle partitions —
    output size is O(delta)."""
    tagged = (old.map_batches(_side(0, key_col, fp_col, n_parts),
                              batch_format="pyarrow", zero_copy_batch=True)
              .union(new.map_batches(_side(1, key_col, fp_col, n_parts),
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)))
    return tagged.groupby("part").map_groups(_diff_part,
                                             batch_format="pyarrow")


def snapshot_diff_sql(*, old_sql: str, new_sql: str) -> str:
    """SQL twin: full outer join of the two ``(url, fp)`` relations with the
    same min-fp duplicate pin and the same unchanged-row drop. ``old_sql`` /
    ``new_sql`` are relations producing columns (url, fp)."""
    return f"""
WITH o AS (SELECT url, min(fp) AS fp FROM ({old_sql}) GROUP BY url),
     n AS (SELECT url, min(fp) AS fp FROM ({new_sql}) GROUP BY url)
SELECT COALESCE(o.url, n.url) AS url,
       CASE WHEN o.url IS NULL THEN 'added'
            WHEN n.url IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       o.fp AS old_fp, n.fp AS new_fp
FROM o FULL OUTER JOIN n ON o.url = n.url
WHERE o.url IS NULL OR n.url IS NULL OR o.fp <> n.fp
"""
