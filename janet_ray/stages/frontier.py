"""Crawl-frontier construction — the link-graph consumer that closes the
crawl loop: resolve every extracted outlink to an absolute URL, then keep
the DISTINCT targets not already in the crawled set (reference analogue:
the resume anti-join `apps/legacy/rename.ts:61-64` filters inputs against
the completed-mapping set; here the same anti-join runs value-wise over
urls at corpus scale).

`anti_join_values` is a distributed shuffle anti-join by value — the scale
path where neither side fits a broadcast (`joins.broadcast_semi_join` is
the small-side variant). Shape: both sides are tagged and co-partitioned by
a deterministic coarse hash of the key (crc32 — stable across processes,
unlike Python's salted `hash()`), ONE union shuffle of (part, key, tag)
rows, then a per-partition vectorized sorted-membership kernel emits the
distinct left keys with no right match. Payloads never move; the shuffle
carries exactly one string column per row. Output is distinct by
construction (np.unique per partition; partitions are disjoint by hash).

URL resolution is pinned to the two cases the synthetic corpus (and the
SQL twin) exercise: absolute http(s) hrefs pass through; root-relative
hrefs are prefixed with the page origin. The oracle replays the same CASE."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_N_PARTS = 64


def _part_of(strs: list, n_parts: int) -> np.ndarray:
    return np.asarray(
        [zlib.crc32(s.encode("utf-8")) % n_parts for s in strs],
        dtype=np.int32)


def anti_join_values(left, right, *, key_col: str,
                     right_key_col: str | None = None,
                     n_parts: int = _N_PARTS):
    """DISTINCT ``left[key_col]`` values that never occur in
    ``right[right_key_col or key_col]``. One union shuffle; per-partition
    set difference."""

    def tag(tag_val: int, col: str):
        def f(batch: pa.Table) -> pa.Table:
            keys = [k for k in batch[col].to_pylist() if k is not None]
            return pa.table({
                "part": pa.array(_part_of(keys, n_parts)),
                "key": pa.array(keys, pa.string()),
                "tag": pa.array(np.full(len(keys), tag_val, dtype=np.int8)),
            })

        return f

    tagged = (left.map_batches(tag(1, key_col), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right.map_batches(tag(0, right_key_col or key_col),
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)))

    def diff(part: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], pa.string())})
        if part.num_rows == 0 or "key" not in part.column_names:
            return empty
        keys = np.asarray(part["key"].to_pylist(), dtype=object)
        tags = part["tag"].to_numpy(zero_copy_only=False)
        new = np.unique(keys[tags == 1])
        seen = np.unique(keys[tags == 0])
        keep = new[~np.isin(new, seen)]
        return pa.table({key_col: pa.array(keep.tolist(), pa.string())})

    return tagged.groupby("part").map_groups(diff, batch_format="pyarrow")


def resolve_hrefs(links, *, origin: str, href_col: str = "href",
                  out_col: str = "url"):
    """Absolute URL per link row: http(s) hrefs pass through, root-relative
    hrefs get the page origin prefixed (the only two shapes the corpus
    contract emits; anything else passes through untouched like a browser
    would resolve it against an opaque base)."""

    def f(batch: pa.Table) -> pa.Table:
        href = batch[href_col]
        absolute = pc.starts_with(href, "http")
        resolved = pc.if_else(
            absolute, href,
            pc.binary_join_element_wise(origin, href, ""))
        return batch.append_column(out_col, resolved)

    return links.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def crawl_frontier(links, crawled, *, origin: str, href_col: str = "href",
                   url_col: str = "url", n_parts: int = _N_PARTS):
    """Distinct resolved link targets not yet crawled — the next crawl
    round's seed list."""
    resolved = resolve_hrefs(links, origin=origin, href_col=href_col,
                             out_col="__resolved")
    return anti_join_values(resolved, crawled, key_col="__resolved",
                            right_key_col=url_col,
                            n_parts=n_parts).map_batches(
        lambda b: pa.table({url_col: b["__resolved"]}),
        batch_format="pyarrow", zero_copy_batch=True)
