"""URL-level document filtering (RefinedWeb §2.1 / Penedo et al. 2023 App. G).

The first, cheapest cut in a web-curation pipeline — documents are kept or
dropped on the URL alone, before any text ever moves:

  1. **domain blocklist** — the host (lowercased, port stripped) is blocked
     if it equals a blocked domain or is a subdomain of one. Production
     blocklists are millions of entries (UT1 ~4.6M), far past per-domain
     vector kernels, so membership is a broadcast set probed once per label
     suffix ("a.b.c.com" → a.b.c.com, b.c.com, c.com — O(labels) O(1)
     lookups per row); the set ships once per worker via ``ray.put`` +
     the per-process broadcast cache, never per batch.
  2. **soft word score** — each scored word present as a substring of the
     lowercased URL adds its integer weight; total ≥ threshold drops the
     document. Vectorized: one ``pc.match_substring`` per word (the word
     list is a small constant), weights summed as int64.
  3. **whitelist** — whitelisted domains (same suffix semantics) bypass
     both rules (RefinedWeb keeps e.g. wikipedia regardless of score).

Stateless map, zero shuffles; all input columns pass through, with
``host`` (string), ``domain_blocked`` (bool), ``url_score`` (int64) and
``keep`` (bool) appended so downstream stages can filter or audit. Every
decision is exact-int/boolean → value-hash-strict SQL twin
(``url_filter_sql``).

Host extraction contract (shared with the SQL twin): the substring after
``://`` up to the first ``/``, ``?`` or ``#``, lowercased, port stripped.
URLs produced by the engine's canonicalizer (urlnorm) satisfy this; raw
userinfo@ URLs should pass through ``canonical_url`` first.

Reference anchor: the reference's visibility predicate
(packages/db/src/queries.ts filtering by ownership) is the row-level
keep/drop analogue; here the predicate is content-addressed on the URL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from janet_ray.functions.broadcast import get_broadcast


def _hosts(url_col) -> list[str]:
    tail = pc.replace_substring_regex(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://",
                                      "")
    tail = pc.replace_substring_regex(tail, r"[/?#].*$", "")
    tail = pc.replace_substring_regex(pc.utf8_lower(tail), r":\d*$", "")
    return tail.to_pylist()


def _suffix_blocked(host: str, blocked: frozenset[str]) -> bool:
    parts = host.split(".")
    return any(".".join(parts[i:]) in blocked for i in range(len(parts)))


def url_filter(ds, *, url_col: str = "url",
               blocked_domains=(), scored_words: dict[str, int] | None = None,
               threshold: int = 2, whitelist_domains=()):
    """→ input columns + (host, domain_blocked, url_score, keep). Rows are
    NOT dropped here — ``keep`` is the decision column, so audits and
    removal-rate metrics read the same pass (filter with ds.filter after)."""
    scored = dict(scored_words or {})
    blocked_ref = ray.put(frozenset(s.lower() for s in blocked_domains))
    white_ref = ray.put(frozenset(s.lower() for s in whitelist_domains))

    def decide(batch: pa.Table) -> pa.Table:
        blocked = get_broadcast(blocked_ref)
        white = get_broadcast(white_ref)
        urls = batch[url_col]
        hosts = _hosts(urls)
        low = pc.utf8_lower(urls)
        score = np.zeros(batch.num_rows, dtype=np.int64)
        for w, wt in scored.items():
            hit = pc.match_substring(low, w).to_numpy(zero_copy_only=False)
            score += np.where(hit, np.int64(wt), np.int64(0))
        dom = np.fromiter((_suffix_blocked(h, blocked) for h in hosts),
                          dtype=bool, count=len(hosts))
        wl = np.fromiter((_suffix_blocked(h, white) for h in hosts),
                         dtype=bool, count=len(hosts))
        keep = wl | (~dom & (score < threshold))
        return (batch.append_column("host", pa.array(hosts, pa.string()))
                .append_column("domain_blocked", pa.array(dom))
                .append_column("url_score", pa.array(score, pa.int64()))
                .append_column("keep", pa.array(keep)))

    return ds.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True)


def url_filter_sql(url_expr: str, *, blocked_domains=(), scored_words=None,
                   threshold: int = 2, whitelist_domains=()) -> dict[str, str]:
    """Render the exact decision chain as SQL expressions over ``url_expr``.
    Returns {'host', 'domain_blocked', 'url_score', 'keep'} fragments the
    caller embeds in its SELECT (DuckDB dialect)."""

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    host = ("lower(regexp_replace(regexp_replace(regexp_replace("
            f"{url_expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), "
            "'[/?#].*$', ''), ':[0-9]*$', ''))")

    def member(domains) -> str:
        if not domains:
            return "FALSE"
        terms = [f"(__host = {_q(d.lower())} OR "
                 f"suffix(__host, {_q('.' + d.lower())}))"
                 for d in domains]
        return "(" + " OR ".join(terms) + ")"

    scored = dict(scored_words or {})
    if scored:
        score = " + ".join(
            f"(CASE WHEN contains(lower({url_expr}), {_q(w)}) "
            f"THEN {int(wt)} ELSE 0 END)"
            for w, wt in scored.items())
    else:
        score = "0"
    return {
        "host": host,
        "domain_blocked": member(blocked_domains),
        "url_score": f"CAST({score} AS BIGINT)",
        "keep": (f"({member(whitelist_domains)} OR (NOT {member(blocked_domains)} "
                 f"AND CAST({score} AS BIGINT) < {int(threshold)}))"),
    }
