"""Property-based robustness tests (hypothesis): arbitrary/adversarial inputs
must never crash the extractors — errors are data (the engine-wide contract),
spans are always valid offsets, and scalar operators are total functions."""
import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from janet_ray.formats import jpdf
from janet_ray.stages import dedup, textstats as ts
from janet_ray.stages.html_extract import extract_html
from janet_ray.stages.search import count_matches, find_matches, normalize_keyword

html_ish = st.text(
    alphabet=st.sampled_from(list("<>/ab cp!&\"'=-\n\tä文%[]")), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(html_ish)
def test_extract_html_total_and_spans_valid(s):
    payload = s.encode("utf-8")
    text, spans = extract_html(payload)
    assert isinstance(text, str)
    for sp in spans:
        assert 0 <= sp["start"] <= sp["end"] <= len(text)
        # a span's slice is exactly one kept block's text
        assert "\n\n" not in text[sp["start"]:sp["end"]]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_extract_html_arbitrary_bytes_never_raise(b):
    text, spans = extract_html(b)
    assert isinstance(text, str) and isinstance(spans, list)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_jpdf_parse_total(b):
    """parse() either returns pages or raises JPdfError — never anything else."""
    payload = jpdf.MAGIC + b
    try:
        pages = jpdf.parse(payload)
        assert isinstance(pages, list)
    except jpdf.JPdfError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=120), st.text(min_size=1, max_size=8),
       st.booleans(), st.booleans())
def test_count_matches_total_and_consistent(text, kw, mc, ww):
    n = count_matches(text, kw, match_case=mc, whole_words=ww)
    assert n >= 0
    spans = find_matches([text], normalize_keyword(kw, mc, ww))
    assert len(spans) == n
    for m in spans:
        assert 0 <= m["start"] <= m["end"] <= len(text)
        assert m["page_index"] == 0


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_textstats_total(s):
    r = ts.text_stats_row(s)
    assert r["n_chars"] == len(s)
    assert 0 <= r["alpha_ratio"] <= 1
    assert 0 <= r["stopword_ratio"] <= 1
    assert ts.lang_id(s) in ("en", "es", "de", "fr", "zh", "unknown")
    assert len(ts.fingerprint(s)) == 32


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=150), st.text(max_size=150))
def test_jaccard_bounds_and_symmetry(a, b):
    j = dedup.jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == dedup.jaccard(b, a)
    # self-similarity is 1.0 whenever the doc has shingles at all; shingle-less
    # docs are defined non-duplicates of everything, themselves included
    expected_self = 1.0 if dedup.shingle_hashes(a).size else 0.0
    assert dedup.jaccard(a, a) == expected_self


def test_extract_stage_junk_batch_is_error_rows(ray_session):
    """Poison rows become error rows, never task failures (fileProcessor.ts:70-76)."""
    from datetime import datetime

    from janet_ray.stages.extract import ExtractStage
    from janet_ray.stages.router import sniff_routes

    junk = [b"%PDF-1.7\n%JRAY\n\x01\x02trunc", b"<html><p>" + b"\xff" * 20,
            b"", b"\x00" * 50, jpdf.MAGIC + b"PG\xff\xff\xff\xff"]
    batch = pa.table({
        "url": [f"https://x.example/j{i}" for i in range(len(junk))],
        "warc_ts": pa.array([datetime(2024, 1, 1)] * len(junk), pa.timestamp("us")),
        "html": pa.array(junk, pa.binary()),
        "text": [""] * len(junk),
        "lang": ["en"] * len(junk),
    })
    out = ExtractStage()(sniff_routes(batch))
    assert out.num_rows == len(junk)
    for r in out.to_pylist():
        assert isinstance(r["success"], bool)
        if not r["success"]:
            assert r["route"] == "error" and r["error"]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 50)),
                min_size=1, max_size=60))
def test_dedupe_last_wins_matches_reference(ray_session, pairs):
    """Random (url_idx, ts) multisets: the distributed last-wins dedupe equals
    the obvious sequential reference for every dup pattern."""
    from datetime import datetime, timedelta

    from janet_ray.pipelines.extract import dedupe_last_wins
    import ray.data

    rows = [
        {"url": f"https://h{u % 4}.example/p{u}",
         "warc_ts": datetime(2024, 1, 1) + timedelta(hours=t),
         "route": "html", "text": f"text-{u}-{t}"}
        for u, t in pairs
    ]
    t = pa.table({
        "url": [r["url"] for r in rows],
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "route": [r["route"] for r in rows],
        "text": [r["text"] for r in rows],
    })
    got = {r["url"]: (r["warc_ts"], r["text"])
           for r in dedupe_last_wins(ray.data.from_arrow(t)).take_all()}
    want = {}
    for r in rows:
        cur = want.get(r["url"])
        if cur is None or r["warc_ts"] > cur[0]:
            want[r["url"]] = (r["warc_ts"], r["text"])
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_warc_parse_total(b):
    """parse_warc_bytes is total on arbitrary bytes (incl. fake gzip magic)."""
    from janet_ray.sources.warc import parse_warc_bytes

    rows, skipped, seen = parse_warc_bytes(b)
    assert isinstance(rows, list) and skipped >= 0 and seen >= 0
    for r in rows:
        assert r["url"] and isinstance(r["html"], bytes)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_warc_parse_total_with_warc_prefix(b):
    from janet_ray.sources.warc import parse_warc_bytes

    rows, skipped, seen = parse_warc_bytes(b"WARC/1.0\r\n" + b)
    assert isinstance(rows, list)


def test_compression_stats_reference(ray_session):
    """add_compression_stats == per-row zlib at the pinned level, exact."""
    import zlib

    import pyarrow as pa

    from janet_ray.stages.textstats import add_compression_stats

    texts = ["", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "Zf3#kQ!9 vX@1 rnd",
             "the the the the the the", "unicode snowman ☃" * 3]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = add_compression_stats(batch)
    for t, raw, comp in zip(texts, out["n_raw_bytes"].to_pylist(),
                            out["n_zlib_bytes"].to_pylist()):
        b = t.encode("utf-8")
        assert raw == len(b)
        assert comp == len(zlib.compress(b, 6))
    # the signal separates repetition from noise
    rep = out["n_zlib_bytes"][1].as_py() * 100
    noise = out["n_zlib_bytes"][2].as_py() * 100
    assert rep < out["n_raw_bytes"][1].as_py() * 100
    assert noise > out["n_raw_bytes"][2].as_py() * 60
