"""Canonical URL normalization (stages/urlnorm.py): chain semantics,
batch-vs-scalar parity, DuckDB RE2 dialect parity (hypothesis)."""

import pytest

from janet_ray.stages.urlnorm import canonical_url, canonicalize_urls

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def test_scalar_chain():
    assert canonical_url("HTTP://Example.com:80/A/b#frag") == \
        "http://example.com/A/b"
    assert canonical_url("https://Ex.COM:443/x?") == "https://ex.com/x"
    # non-default ports survive; path/query case survives
    assert canonical_url("https://ex.com:8443/x") == "https://ex.com:8443/x"
    assert canonical_url("http://a.b/p?q=UP#z") == "http://a.b/p?q=UP"
    assert canonical_url("ftp://Mixed.Case/Z") == "ftp://mixed.case/Z"
    assert canonical_url("/relative/path") == "/relative/path"
    assert canonical_url(None) == ""
    # :80 only strips for http, :443 only for https
    assert canonical_url("https://h.com:80/x") == "https://h.com:80/x"
    assert canonical_url("http://h.com:443/x") == "http://h.com:443/x"
    # USERINFO is case-significant (RFC 3986 §6.2.2.1 folds only
    # scheme+host) and must not defeat the default-port strip
    assert canonical_url("http://User:Pw@Host.com:80/P") == \
        "http://User:Pw@host.com/P"
    assert canonical_url("http://U@H.com/q") == "http://U@h.com/q"
    # control chars strip FIRST (the _host_path rule; also keeps the
    # $-anchored steps dialect-safe)
    assert canonical_url("http://a.com/x?#frag\n") == "http://a.com/x"
    assert canonical_url("HT\tTP://A.com/z") == "http://a.com/z"


def test_batch_matches_scalar(ray_session):
    import ray

    urls = ["HTTP://A.B:80/x#f", "https://C.d:443/y?", "plain", "",
            "http://keep.com:8080/z?q", "http://Us:Er@Host.IO:80/K",
            "http://a.com/x#f\n"]
    rows = [{"doc_id": i, "url": u} for i, u in enumerate(urls)]
    out = (canonicalize_urls(ray.data.from_items(rows)).to_pandas()
           .set_index("doc_id"))
    for r in rows:
        want = canonical_url(r["url"])
        assert out.loc[r["doc_id"], "url_canon"] == want, r["url"]
        assert bool(out.loc[r["doc_id"], "changed"]) == (want != r["url"])


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis unavailable")
@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.sampled_from(
    list("abcXYZ019:/?#.&=%-_~@\t\n")), max_size=60))
def test_duckdb_dialect_parity(u):
    """DuckDB's RE2 replay must agree with the Python chain on arbitrary
    url-ish strings INCLUDING control characters and userinfo marks (the
    oracle's load-bearing assumption)."""
    import duckdb

    from janet_ray.stages.urlnorm import canonical_url_sql

    got = duckdb.connect().execute(
        f"SELECT {canonical_url_sql('u')} FROM (SELECT ? AS u)", [u]
    ).fetchone()[0]
    assert got == canonical_url(u)
