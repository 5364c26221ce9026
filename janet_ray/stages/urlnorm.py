"""Canonical URL normalization — the crawl-side sibling of text
normalization: before urls can serve as dedup/partition keys
(`dedupe_last_wins`, the crawl frontier's anti-join), equivalent spellings
must collapse (`HTTP://Example.com:80/a#x` and `http://example.com/a` are
the same resource).

Pinned four-step chain, each step ONE RE2-compatible pattern shared with
the SQL twin (no lookaround — DuckDB's regexp engine is RE2; order
matters and is replayed identically):

  1. fragment strip: ``#.*$`` → '' (fragments are client-side only);
  2. scheme+host lowercase: the authority prefix
     (``^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*``) is case-insensitive per RFC
     3986 §6.2.2.1; path/query case is preserved (significant);
  3. default-port strip: ``:80`` for http / ``:443`` for https at the end
     of the authority (capture-group rewrite, no lookahead);
  4. empty-query strip: a trailing ``?`` with nothing after it.

Stateless per-batch map on vectorized Arrow RE2 kernels except step 2's
case fold, which needs a span-local lower (regexp extract + concat —
vectorized via two kernel calls, no Python loop)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

FRAGMENT_PATTERN = r"#.*$"
AUTHORITY_PATTERN = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
HTTP_PORT_PATTERN = r"^(http://[^/:?#]*):80([/?].*)?$"
HTTPS_PORT_PATTERN = r"^(https://[^/:?#]*):443([/?].*)?$"
EMPTY_QUERY_PATTERN = r"\?$"

_FRAGMENT_RE = re.compile(FRAGMENT_PATTERN)
_AUTHORITY_RE = re.compile(AUTHORITY_PATTERN)
_HTTP_PORT_RE = re.compile(HTTP_PORT_PATTERN)
_HTTPS_PORT_RE = re.compile(HTTPS_PORT_PATTERN)
_EMPTY_QUERY_RE = re.compile(EMPTY_QUERY_PATTERN)


def canonical_url(url: str) -> str:
    """Reference scalar (test oracle; identical chain to the batch kernel)."""
    u = _FRAGMENT_RE.sub("", url or "")
    m = _AUTHORITY_RE.match(u)
    if m:
        u = m.group(0).lower() + u[m.end():]
    u = _HTTP_PORT_RE.sub(r"\1\2", u)
    u = _HTTPS_PORT_RE.sub(r"\1\2", u)
    return _EMPTY_QUERY_RE.sub("", u)


def canonicalize_urls(ds, *, url_col: str = "url", out_col: str = "url_canon"):
    """(…, out_col, changed) — the canonicalization map."""

    def f(batch: pa.Table) -> pa.Table:
        u = pc.coalesce(batch[url_col], pa.scalar("", pa.string()))
        u1 = pc.replace_substring_regex(u, pattern=FRAGMENT_PATTERN,
                                        replacement="")
        # span-local lowercase without Python rows: lower(extracted prefix)
        # + suffix (prefix removal via one more RE2 call)
        prefix = pc.utf8_lower(_extract_prefix(u1))
        suffix = pc.replace_substring_regex(u1, pattern=AUTHORITY_PATTERN,
                                            replacement="")
        u2 = pc.binary_join_element_wise(prefix, suffix, "")
        u3 = pc.replace_substring_regex(u2, pattern=HTTP_PORT_PATTERN,
                                        replacement=r"\1\2")
        u4 = pc.replace_substring_regex(u3, pattern=HTTPS_PORT_PATTERN,
                                        replacement=r"\1\2")
        out = pc.replace_substring_regex(u4, pattern=EMPTY_QUERY_PATTERN,
                                         replacement="")
        return batch.append_column(out_col, out).append_column(
            "changed", pc.not_equal(out, u))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _extract_prefix(arr):
    """Authority prefix of each url ('' when absent) — RE2 extract via a
    capture group."""
    st = pc.extract_regex(arr, pattern=f"(?P<p>{AUTHORITY_PATTERN})")
    return pc.coalesce(pc.struct_field(st, "p"), pa.scalar("", pa.string()))


def canonical_url_sql(expr: str) -> str:
    """DuckDB replay: same patterns, same order (RE2 on both engines)."""
    frag = f"regexp_replace({expr}, '{FRAGMENT_PATTERN}', '')"
    low = (f"lower(regexp_extract({frag}, '{AUTHORITY_PATTERN}')) || "
           f"regexp_replace({frag}, '{AUTHORITY_PATTERN}', '')")
    p80 = (f"regexp_replace(({low}), '{HTTP_PORT_PATTERN}', "
           r"'\1\2')")
    p443 = (f"regexp_replace(({p80}), '{HTTPS_PORT_PATTERN}', "
            r"'\1\2')")
    return f"regexp_replace(({p443}), '{EMPTY_QUERY_PATTERN}', '')"
