"""Property-based tests for the round-2 operators (hypothesis): totality of
the artifact parser, highlight-rect invariants, url-split equivalence,
group-topk bounds."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.formats.jpdf import CELL_H, CELL_W, GLYPH_H, GLYPH_W
from janet_ray.formats.textlayer import TextLayerError, parse_searchable_artifact
from janet_ray.stages import highlights as hl
from janet_ray.stages.search import normalize_keyword


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_artifact_parser_total(data):
    """parse_searchable_artifact never raises anything but TextLayerError on
    arbitrary bytes (no struct.error / IndexError escapes)."""
    try:
        parse_searchable_artifact(data)
    except TextLayerError:
        pass


_text = st.text(alphabet=st.sampled_from("ab c.x-"), max_size=120)
_kw = st.text(alphabet=st.sampled_from("abc x"), min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(_text, _kw, st.integers(min_value=2, max_value=50))
def test_highlight_rects_invariants(text, keyword, wrap_cols):
    """Rects lie inside the page, are (top,left)-sorted with 1-based dense
    ranks, and every rect is at least one glyph wide."""
    kw = normalize_keyword(keyword, match_case=True)
    rects = hl.match_highlight_rects(text, kw, wrap_cols)
    page_w = wrap_cols * CELL_W
    n_lines = max(1, -(-len(text) // wrap_cols))
    prev = None
    for i, r in enumerate(rects, 1):
        assert r["hl_rank"] == i
        assert 0 <= r["x0"] < r["x1"] <= (wrap_cols - 1) * CELL_W + GLYPH_W
        assert 0 <= r["y0"] < r["y1"] <= (n_lines - 1) * CELL_H + GLYPH_H
        assert r["x1"] <= page_w
        if prev is not None:
            assert (r["y0"], r["x0"]) >= prev
        prev = (r["y0"], r["x0"])


@settings(max_examples=200, deadline=None)
@given(_text, st.integers(min_value=2, max_value=50))
def test_char_span_indexes_monotone_dense(text, wrap_cols):
    idx = hl.char_span_indexes(text, wrap_cols)
    assert len(idx) == len(text)
    if len(idx):
        d = np.diff(idx)
        assert ((d == 0) | (d == 1)).all() and idx[0] == 0  # dense, monotone


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.sampled_from("abc:/?#.%20 &=_-\t\r\n"), max_size=40)
       .map(lambda s: "https://" + s))
def test_fast_url_split_matches_urlparse(url):
    from urllib.parse import urlparse

    from janet_ray.functions.text import _host_path

    try:
        p = urlparse(url)
        want = (p.netloc or "", p.path)
    except ValueError:
        want = ("", "")
    assert _host_path(url) == want


def test_fast_url_split_strips_control_chars():
    """bpo-43882: urlsplit removes \\t\\r\\n anywhere in the URL — the fast
    path must agree or malformed crawl urls change the A6 dedupe key
    (ADVICE r2)."""
    from janet_ray.functions.text import _host_path, url_host

    assert _host_path("https://exa\tmple.com/x") == ("example.com", "/x")
    assert _host_path("https://example.com/a\nb?q#f") == ("example.com", "/ab")
    assert url_host("http\n://example.com/x") == "example.com"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                min_size=1, max_size=200),
       st.integers(min_value=1, max_value=5))
def test_group_topk_kernel_matches_pandas(rows, k):
    """The actual within-partition kernel == pandas per-group head(k)."""
    from janet_ray.stages.rank import group_topk_kernel

    t = pa.table({
        "g": pa.array([g for g, _ in rows], pa.int64()),
        "s": pa.array([s for _, s in rows], pa.int64()),
        "id": pa.array(range(len(rows)), pa.int64()),
    })
    got = group_topk_kernel(t, ["g"], "s", k, tiebreak_cols=["id"]).to_pandas()
    df = t.to_pandas()
    for g, sub in df.groupby("g"):
        want = sub.sort_values(["s", "id"], ascending=[False, True]).head(k)
        gg = got[got["g"] == g].sort_values("rank")
        assert gg["id"].tolist() == want["id"].tolist()
        assert gg["rank"].tolist() == list(range(1, len(want) + 1))
