"""URL filter: suffix blocklist semantics, word scoring, whitelist override,
host extraction edge cases, SQL-fragment parity via DuckDB."""
import duckdb
import pyarrow as pa

from janet_ray.stages.urlfilter import _hosts, _suffix_blocked, url_filter, \
    url_filter_sql


def test_suffix_blocked_label_boundaries():
    b = frozenset({"spam.biz", "tracker.net"})
    assert _suffix_blocked("spam.biz", b)
    assert _suffix_blocked("cdn.spam.biz", b)
    assert _suffix_blocked("a.b.tracker.net", b)
    assert not _suffix_blocked("notspam.biz", b)       # label boundary
    assert not _suffix_blocked("spam.biz.evil.com", b)  # suffix, not prefix


def test_host_extraction():
    urls = pa.array([
        "https://A.B.com:8080/p?q=1",
        "http://x.org",
        "ftp://Host.Net/file",
        "https://h.io#frag",
        "https://h.io?only=query",
    ])
    assert _hosts(urls) == ["a.b.com", "x.org", "host.net", "h.io", "h.io"]


def test_url_filter_decisions(ray_session):
    import ray.data

    rows = [
        ("https://good-site.com/a", True, False, 0),
        ("https://ads.tracker.net/a", False, True, 0),          # blocked domain
        ("https://good-site.com/casino", False, False, 2),      # score cut
        ("https://good-site.com/poker", True, False, 1),        # under threshold
        ("https://en.wikipedia.org/casino-poker", True, False, 3),  # whitelisted
        ("https://sub.spam.biz/x", False, True, 1),             # 'spam' word + domain
    ]
    t = pa.table({"doc_id": list(range(len(rows))),
                  "url": [r[0] for r in rows]})
    out = url_filter(ray.data.from_arrow(t),
                     blocked_domains=("tracker.net", "spam.biz"),
                     scored_words={"casino": 2, "poker": 1, "spam": 1},
                     threshold=2,
                     whitelist_domains=("wikipedia.org",)).take_all()
    out.sort(key=lambda r: r["doc_id"])
    for r, (url, keep, dom, score) in zip(out, rows):
        assert (r["keep"], r["domain_blocked"], r["url_score"]) == \
            (keep, dom, score), url


def test_sql_fragment_parity(ray_session):
    """The rendered SQL decisions equal the Ray decisions row for row."""
    import ray.data

    urls = [
        "https://good-site.com/a", "https://ads.tracker.net/b",
        "https://x.CASINO.com/poker", "http://EN.wikipedia.org:80/spam",
        "https://spam.biz.evil.com/", "https://notspam.biz/q?casino=1",
    ]
    kw = dict(blocked_domains=("tracker.net", "spam.biz"),
              scored_words={"casino": 2, "poker": 1, "spam": 1},
              threshold=2, whitelist_domains=("wikipedia.org",))
    t = pa.table({"doc_id": list(range(len(urls))), "url": urls})
    got = url_filter(ray.data.from_arrow(t), **kw).take_all()
    got.sort(key=lambda r: r["doc_id"])
    frags = url_filter_sql("url", **kw)
    con = duckdb.connect()
    con.register("pages", t)
    want = con.execute(f"""
        WITH hosted AS (SELECT doc_id, url, {frags['host']} AS __host FROM pages)
        SELECT doc_id, __host AS host, {frags['domain_blocked']} AS domain_blocked,
               {frags['url_score']} AS url_score, {frags['keep']} AS keep
        FROM hosted ORDER BY doc_id""").fetchall()
    for r, w in zip(got, want):
        assert (r["host"], r["domain_blocked"], r["url_score"], r["keep"]) == \
            (w[1], w[2], w[3], w[4]), w
