"""Crawl-frontier construction — the link-graph consumer that closes the
crawl loop: resolve every extracted outlink to an absolute URL, then keep
the DISTINCT targets not already in the crawled set (reference analogue:
the resume anti-join `apps/legacy/rename.ts:61-64` filters inputs against
the completed-mapping set; here the same anti-join runs value-wise over
urls at corpus scale).

`anti_join_values` is a distributed shuffle anti-join by value — the scale
path where neither side fits a broadcast (`joins.broadcast_semi_join` is
the small-side variant). Shape: both sides cast their key to STRING (the
pinned comparison domain — document it, don't crash on int keys) and
co-partition via the ENGINE-WIDE stable partitioner
(`functions/partitioning.with_part` — one crc32 implementation shared by
every grouped reducer, never a private copy), ONE union shuffle of
(part, key, tag) rows, then a per-partition Arrow-native set difference
(`pc.unique` + `pc.is_in` — C++ kernels, no per-row Python objects).
Payloads never move; output is distinct by construction (partitions are
disjoint by hash).

URL resolution is pinned to four RE2-expressible rules the SQL twin
replays: (1) an href with a URI scheme (``^[A-Za-z][A-Za-z0-9+.-]*:`` —
http, https, mailto, …) passes through; (2) a protocol-relative ``//h/p``
href gets the origin's scheme; (3) a root-relative ``/p`` href gets the
origin prefixed; (4) anything else (document-relative paths, bare
fragments) passes through UNTOUCHED — resolving those needs the page's
own directory, which is the caller's context, not this operator's."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from janet_ray.functions.partitioning import N_PARTS_DEFAULT, with_part

SCHEME_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def anti_join_values(left, right, *, key_col: str,
                     right_key_col: str | None = None,
                     n_parts: int = N_PARTS_DEFAULT):
    """DISTINCT ``left[key_col]`` values that never occur in
    ``right[right_key_col or key_col]``. One union shuffle; per-partition
    Arrow set difference. Values are compared in the STRING domain (the
    output column is string; non-string key columns are cast — a pinned
    contract, not a crash)."""

    def tag(tag_val: int, col: str):
        def f(batch: pa.Table) -> pa.Table:
            keys = pc.cast(pc.drop_null(batch[col]), pa.string())
            t = with_part(pa.table({"key": keys}), ["key"], n_parts=n_parts)
            return t.append_column(
                "tag", pa.array(np.full(len(keys), tag_val, dtype=np.int8)))

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
        is_new = pc.equal(part["tag"], pa.scalar(1, pa.int8()))
        new = pc.unique(part.filter(is_new)["key"].combine_chunks())
        seen = pc.unique(part.filter(pc.invert(is_new))["key"]
                         .combine_chunks())
        keep = new.filter(pc.invert(pc.is_in(new, value_set=seen)))
        return pa.table({key_col: keep})

    return tagged.groupby("part").map_groups(diff, batch_format="pyarrow")


def resolve_hrefs(links, *, origin: str, href_col: str = "href",
                  out_col: str = "url"):
    """Absolute URL per link row under the four pinned rules (module
    docstring): scheme'd hrefs pass, ``//`` gets the origin's scheme,
    ``/`` gets the origin, anything else passes untouched."""
    scheme = origin.split("://", 1)[0] if "://" in origin else "https"

    def f(batch: pa.Table) -> pa.Table:
        href = batch[href_col]
        has_scheme = pc.match_substring_regex(href, SCHEME_PATTERN)
        proto_rel = pc.starts_with(href, "//")
        root_rel = pc.starts_with(href, "/")
        resolved = pc.if_else(
            has_scheme, href,
            pc.if_else(
                proto_rel,
                pc.binary_join_element_wise(scheme + ":", href, ""),
                pc.if_else(
                    root_rel,
                    pc.binary_join_element_wise(origin, href, ""),
                    href)))
        return batch.append_column(out_col, resolved)

    return links.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def crawl_frontier(links, crawled, *, origin: str, href_col: str = "href",
                   url_col: str = "url", n_parts: int = N_PARTS_DEFAULT):
    """Distinct resolved link targets not yet crawled — the next crawl
    round's seed list."""
    resolved = resolve_hrefs(links, origin=origin, href_col=href_col,
                             out_col="__resolved")
    return anti_join_values(resolved, crawled, key_col="__resolved",
                            right_key_col=url_col,
                            n_parts=n_parts).map_batches(
        lambda b: pa.table({url_col: b["__resolved"]}),
        batch_format="pyarrow", zero_copy_batch=True)
