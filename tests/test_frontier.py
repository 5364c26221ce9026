"""Crawl-frontier operators (stages/frontier.py) and anchor-text
aggregation (stages/links.py anchor_corpus): distributed anti-join
semantics, URL resolution, exact aggregation."""

import pyarrow as pa

from janet_ray.stages.frontier import (anti_join_values, crawl_frontier,
                                       resolve_hrefs)
from janet_ray.stages.links import anchor_corpus


def _ds(ray, rows):
    return ray.data.from_items(rows)


def test_anti_join_values_basic(ray_session):
    import ray

    left = _ds(ray, [{"u": x} for x in
                     ["a", "b", "c", "b", "d", "a"]])  # dups in left
    right = _ds(ray, [{"u": x} for x in ["b", "d", "e"]])
    out = anti_join_values(left, right, key_col="u").to_pandas()
    assert sorted(out["u"]) == ["a", "c"]  # distinct, right-matched dropped


def test_anti_join_values_disjoint_and_empty(ray_session):
    import ray

    left = _ds(ray, [{"u": "x"}, {"u": "y"}])
    right = _ds(ray, [{"u": "z"}])
    out = anti_join_values(left, right, key_col="u").to_pandas()
    assert sorted(out["u"]) == ["x", "y"]
    # everything matched → empty result
    out2 = anti_join_values(left, left, key_col="u").to_pandas()
    assert len(out2) == 0


def test_anti_join_right_key_col(ray_session):
    import ray

    left = _ds(ray, [{"a": "p"}, {"a": "q"}])
    right = _ds(ray, [{"b": "q"}])
    out = anti_join_values(left, right, key_col="a",
                           right_key_col="b").to_pandas()
    assert sorted(out["a"]) == ["p"]


def test_resolve_hrefs(ray_session):
    import ray

    links = _ds(ray, [{"href": "/x/1"}, {"href": "https://other/abs"},
                      {"href": "http://h/p"}])
    out = resolve_hrefs(links, origin="https://base").to_pandas()
    assert sorted(out["url"]) == ["http://h/p", "https://base/x/1",
                                  "https://other/abs"]


def test_crawl_frontier_end_to_end(ray_session):
    import ray

    links = _ds(ray, [{"href": "/d/1"}, {"href": "/d/2"},
                      {"href": "https://ext/a"}, {"href": "/d/1"}])
    crawled = _ds(ray, [{"url": "https://base/d/1"}])
    out = crawl_frontier(links, crawled, origin="https://base").to_pandas()
    assert sorted(out["url"]) == ["https://base/d/2", "https://ext/a"]


def test_anchor_corpus_exact(ray_session):
    import ray

    links = _ds(ray, [
        {"href": "/t1", "anchor": "beta"},
        {"href": "/t1", "anchor": "alpha"},
        {"href": "/t2", "anchor": "solo"},
        {"href": "/t1", "anchor": "gamma"},
    ])
    out = (anchor_corpus(links).to_pandas()
           .sort_values("href").reset_index(drop=True))
    assert list(out["href"]) == ["/t1", "/t2"]
    assert list(out["n_refs"]) == [3, 1]
    assert list(out["top_anchor"]) == ["alpha", "solo"]


def test_anti_join_int_keys_string_domain(ray_session):
    import ray

    # non-string keys are compared in the pinned string domain, not crashed
    left = _ds(ray, [{"k": 1}, {"k": 2}, {"k": 3}])
    right = _ds(ray, [{"k": 2}])
    out = anti_join_values(left, right, key_col="k").to_pandas()
    assert sorted(out["k"]) == ["1", "3"]


def test_resolve_hrefs_pinned_rules(ray_session):
    import ray

    links = _ds(ray, [{"href": "/root/rel"}, {"href": "//cdn.x/lib.js"},
                      {"href": "mailto:a@b.c"}, {"href": "page.html"},
                      {"href": "http-errors.html"}, {"href": "#frag"},
                      {"href": "https://abs/x"}])
    out = resolve_hrefs(links, origin="https://base").to_pandas()
    got = dict(zip(out["href"], out["url"]))
    assert got["/root/rel"] == "https://base/root/rel"
    assert got["//cdn.x/lib.js"] == "https://cdn.x/lib.js"
    assert got["mailto:a@b.c"] == "mailto:a@b.c"       # scheme'd: untouched
    assert got["page.html"] == "page.html"             # doc-relative: untouched
    assert got["http-errors.html"] == "http-errors.html"  # no scheme colon
    assert got["#frag"] == "#frag"
    assert got["https://abs/x"] == "https://abs/x"
