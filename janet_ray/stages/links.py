"""Outlink extraction — the WAT-file sibling of main-content extraction: a
Common-Crawl-scale pipeline emits (page, position, href, anchor) tuples for
link-graph construction, crawl frontier updates, and anchor-text corpora
(reference analogue: the DOM walk in apps/web's extraction path sees the
same <a> elements it strips as boilerplate; here they are the product).

Semantics are pinned to ONE pattern constant compiled on both engines'
RE2-compatible dialects (Python ``re`` here, DuckDB ``regexp_extract_all``
in ``links_sql`` — the pattern avoids constructs where the two dialects
diverge): an anchor is ``<a ...href="...">text</a>`` with a double-quoted
href and no nested tags in the match window; ``pos`` is the 1-based match
ordinal within the page. Extraction is a stateless per-document explode —
embarrassingly parallel, no shuffle; at 10^12 pages the output is written
partitioned by the same input shards as the text product.

The module-level compiled regex is process-wide warm state for the
stateless tasks (the ``_minhasher`` worker-cache pattern, without needing
the cache: ``re.compile`` at import time is free per worker)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

LINK_PATTERN = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'

_LINK_RE = re.compile(LINK_PATTERN)


def doc_links(html: str) -> list[tuple[str, str]]:
    """[(href, anchor_text)] in document order."""
    return _LINK_RE.findall(html or "")


def extract_links(ds, *, html_col: str = "html", id_col: str = "doc_id"):
    """Exploded (doc_id, pos, href, anchor) rows, pos 1-based per document."""

    def explode(batch: pa.Table) -> pa.Table:
        ids_out: list = []
        pos_out: list[int] = []
        href_out: list[str] = []
        anchor_out: list[str] = []
        ids = batch[id_col].to_pylist()
        col = batch[html_col]
        texts = [
            (v.decode("utf-8", "replace") if isinstance(v, bytes) else v)
            for v in col.to_pylist()
        ]
        for i, html in zip(ids, texts):
            for p, (href, anchor) in enumerate(doc_links(html), start=1):
                ids_out.append(i)
                pos_out.append(p)
                href_out.append(href)
                anchor_out.append(anchor)
        return pa.table({
            id_col: pa.array(ids_out, batch[id_col].type),
            "pos": pa.array(np.asarray(pos_out, dtype=np.int64)),
            "href": pa.array(href_out, pa.string()),
            "anchor": pa.array(anchor_out, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


def links_sql(*, source: str = "documents", html_expr: str = "html",
              id_col: str = "doc_id") -> str:
    """DuckDB replay from the same pattern constant: group-1/group-2
    extract_all lists zipped by ordinal."""
    pat = _sql_quote(LINK_PATTERN)
    return f"""
WITH pages AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all({html_expr}, '{pat}', 1) AS hrefs,
         regexp_extract_all({html_expr}, '{pat}', 2) AS anchors
  FROM {source}
)
SELECT doc_id,
       CAST(i AS BIGINT) AS pos,
       hrefs[i] AS href,
       anchors[i] AS anchor
FROM pages, UNNEST(range(1, len(hrefs) + 1)) AS t(i)
"""


def anchor_corpus(links, *, href_col: str = "href",
                  anchor_col: str = "anchor"):
    """Per-target anchor-text aggregation — the classic link-graph text
    product (anchor text describes the TARGET page; search engines and
    DQ-style corpora index it): for each distinct link target, the number
    of referring links and the lexicographically-first anchor text.

    Shape: per-batch pyarrow ``group_by`` partials collapse the link stream
    to (href, n, min_anchor) rows BEFORE the shuffle (the vocab_topk
    combiner pattern — the anchor stream itself is never shuffled), then
    one small native groupby folds partials with Sum/Min. Both folds are
    associative, so the two-level aggregation is exact."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"href": batch[href_col], "anchor": batch[anchor_col]})
        # count_all, not count(anchor): n_refs is the number of REFERRING
        # LINKS, and a null anchor (possible from non-extract_links sources)
        # is still a referring link
        agg = t.group_by("href").aggregate(
            [([], "count_all"), ("anchor", "min")])
        return pa.table({
            "href": agg["href"],
            "n": agg["count_all"].cast(pa.int64()),
            "a_min": agg["anchor_min"],
        })

    partials = links.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return (partials.groupby("href")
            .aggregate(Sum("n", alias_name="n_refs"),
                       Min("a_min", alias_name="top_anchor")))
