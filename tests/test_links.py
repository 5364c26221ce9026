"""Outlink extraction (stages/links.py): pattern semantics, edge cases,
dialect parity with DuckDB RE2, and the explode over real synthetic pages."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.stages.links import doc_links, extract_links, links_sql


def test_basic_and_order():
    html = ('x <a href="/a">first</a> y '
            '<a class="z" href="http://e/b?q=1">second link</a>')
    assert doc_links(html) == [("/a", "first"),
                               ("http://e/b?q=1", "second link")]


def test_edge_cases():
    assert doc_links("") == []
    assert doc_links(None) == []
    assert doc_links("<a href='/single-quote'>no</a>") == []  # pinned: "" only
    assert doc_links('<a href="/x"><b>nested</b></a>') == []  # pinned: no tags
    assert doc_links('<a href="">empty</a>') == [("", "empty")]
    # two hrefs in one tag: greedy [^>]* picks the LAST (both dialects)
    assert doc_links('<a href="/1" href="/2">t</a>') == [("/2", "t")]


@given(st.lists(st.tuples(
    st.text(alphabet="abc/:?=.-", max_size=12),
    st.text(alphabet="abc xyz.,", max_size=12)), max_size=5))
@settings(max_examples=60, deadline=None)
def test_dialect_parity(links):
    html = "pre " + " mid ".join(
        f'<a data-k="v" href="{h}">{a}</a>' for h, a in links) + " post"
    con = duckdb.connect()
    got = con.execute(
        links_sql(source="(SELECT 1 AS doc_id, ? AS html) AS t",
                  html_expr="html"), [html]).df()
    mine = doc_links(html)
    assert [(r.href, r.anchor) for r in got.itertuples()] == mine
    assert got["pos"].tolist() == list(range(1, len(mine) + 1))


def test_explode_over_real_pages(ray_session):
    import ray

    from janet_ray.sources import documents as docsrc

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.map_batches(docsrc.html_pages_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = extract_links(pages, html_col="html", id_col="url").to_pandas()
    per_page = out.groupby("url").size()
    assert (per_page == 12).all()                 # 8 nav + 4 footer
    assert (out["href"].str.startswith("/l")).all()
    assert set(out.columns) == {"url", "pos", "href", "anchor"}
