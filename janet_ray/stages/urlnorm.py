"""Canonical URL normalization — the crawl-side sibling of text
normalization: before urls can serve as dedup/partition keys
(`dedupe_last_wins`, the crawl frontier's anti-join), equivalent spellings
must collapse (`HTTP://Example.com:80/a#x` and `http://example.com/a` are
the same resource).

Pinned five-step chain, each step built from RE2-compatible patterns
shared with the SQL twin (no lookaround — DuckDB's regexp engine is RE2;
order matters and is replayed identically):

  0. control strip: ``[\\t\\r\\n]`` → '' — the same post-bpo-43882 rule the
     engine's `_host_path` applies; ALSO load-bearing for dialect parity:
     Python-re ``$`` matches before a trailing newline while RE2 ``$``
     matches only end-of-text, so anchored steps below would diverge on
     newline-bearing crawl urls if newlines survived to them;
  1. fragment strip: ``#[\\s\\S]*`` → '' (fragments are client-side only;
     unanchored so both dialects agree);
  2. scheme + HOST lowercase: RFC 3986 §6.2.2.1 makes only the scheme and
     host case-insensitive — USERINFO IS CASE-SIGNIFICANT and is preserved
     verbatim (group-structured authority pattern: scheme, optional
     userinfo@, host:port);
  3. default-port strip: ``:80`` for http / ``:443`` for https at the end
     of the host (capture-group rewrite tolerating a userinfo@ prefix);
  4. empty-query strip: a trailing ``?`` with nothing after it (engine
     end-of-text idiom per side — after step 0 no newline can make the
     anchors disagree).

Stateless per-batch map on vectorized Arrow RE2 kernels; step 2's case
fold is span-local (regexp extract per group + lower + concat — no Python
loop)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

CONTROL_PATTERN = r"[\t\r\n]"
FRAGMENT_PATTERN = r"#[\s\S]*"
# groups: 1 = scheme, 2 = optional userinfo@ (case-significant, preserved),
# 3 = host[:port] (case-insensitive)
AUTHORITY_PATTERN = (r"^([A-Za-z][A-Za-z0-9+.-]*)://"
                     r"([^/?#]*@)?([^/?#@]*)")
HTTP_PORT_PATTERN = r"^(http://(?:[^/?#]*@)?[^/:?#]*):80([/?].*)?$"
HTTPS_PORT_PATTERN = r"^(https://(?:[^/?#]*@)?[^/:?#]*):443([/?].*)?$"
EMPTY_QUERY_PATTERN = r"\?$"

_CONTROL_RE = re.compile(CONTROL_PATTERN)
_FRAGMENT_RE = re.compile(FRAGMENT_PATTERN)
_AUTHORITY_RE = re.compile(AUTHORITY_PATTERN)
_HTTP_PORT_RE = re.compile(HTTP_PORT_PATTERN)
_HTTPS_PORT_RE = re.compile(HTTPS_PORT_PATTERN)


def canonical_url(url: str) -> str:
    """Reference scalar (test oracle; identical chain to the batch kernel)."""
    u = _CONTROL_RE.sub("", url or "")
    u = _FRAGMENT_RE.sub("", u)
    m = _AUTHORITY_RE.match(u)
    if m:
        userinfo = m.group(2) or ""
        u = (m.group(1).lower() + "://" + userinfo + m.group(3).lower()
             + u[m.end():])
    u = _HTTP_PORT_RE.sub(r"\1\2", u)
    u = _HTTPS_PORT_RE.sub(r"\1\2", u)
    return u[:-1] if u.endswith("?") else u


def _group(arr, pattern: str, name: str):
    st = pc.extract_regex(arr, pattern=pattern)
    return pc.coalesce(pc.struct_field(st, name), pa.scalar("", pa.string()))


def canonicalize_urls(ds, *, url_col: str = "url", out_col: str = "url_canon"):
    """(…, out_col, changed) — the canonicalization map."""
    named = (r"^(?P<s>[A-Za-z][A-Za-z0-9+.-]*)://"
             r"(?P<ui>[^/?#]*@)?(?P<h>[^/?#@]*)")

    def f(batch: pa.Table) -> pa.Table:
        u = pc.coalesce(batch[url_col], pa.scalar("", pa.string()))
        u0 = pc.replace_substring_regex(u, pattern=CONTROL_PATTERN,
                                        replacement="")
        u1 = pc.replace_substring_regex(u0, pattern=FRAGMENT_PATTERN,
                                        replacement="")
        scheme = pc.utf8_lower(_group(u1, named, "s"))
        userinfo = _group(u1, named, "ui")
        host = pc.utf8_lower(_group(u1, named, "h"))
        has_auth = pc.not_equal(scheme, pa.scalar("", pa.string()))
        rest = pc.replace_substring_regex(u1, pattern=AUTHORITY_PATTERN,
                                          replacement="")
        rebuilt = pc.binary_join_element_wise(scheme, "://", userinfo, host,
                                              rest, "")
        u2 = pc.if_else(has_auth, rebuilt, u1)
        u3 = pc.replace_substring_regex(u2, pattern=HTTP_PORT_PATTERN,
                                        replacement=r"\1\2")
        u4 = pc.replace_substring_regex(u3, pattern=HTTPS_PORT_PATTERN,
                                        replacement=r"\1\2")
        out = pc.replace_substring_regex(u4, pattern=EMPTY_QUERY_PATTERN,
                                         replacement="")
        return batch.append_column(out_col, out).append_column(
            "changed", pc.not_equal(out, u))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def canonical_url_sql(expr: str) -> str:
    """DuckDB replay: same patterns, same order (RE2 on both engines);
    NULL urls coalesce to '' like every Python path."""
    u0 = (f"regexp_replace(COALESCE({expr}, ''), "
          f"'{CONTROL_PATTERN}', '', 'g')")
    frag = f"regexp_replace({u0}, '{FRAGMENT_PATTERN}', '')"
    auth = AUTHORITY_PATTERN
    low = (f"CASE WHEN regexp_matches(({frag}), '{auth}') THEN "
           f"lower(regexp_extract(({frag}), '{auth}', 1)) || '://' || "
           f"regexp_extract(({frag}), '{auth}', 2) || "
           f"lower(regexp_extract(({frag}), '{auth}', 3)) || "
           f"regexp_replace(({frag}), '{auth}', '') "
           f"ELSE ({frag}) END")
    p80 = f"regexp_replace(({low}), '{HTTP_PORT_PATTERN}', " + r"'\1\2')"
    p443 = f"regexp_replace(({p80}), '{HTTPS_PORT_PATTERN}', " + r"'\1\2')"
    return f"regexp_replace(({p443}), '{EMPTY_QUERY_PATTERN}', '')"
