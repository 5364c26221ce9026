"""Golden end-to-end over the Ray Dataset pipeline (SURVEY.md §5 layer 2 analogue):
byte-identical extracted text per url vs the committed-by-construction goldens."""

import json
import os

import pyarrow.parquet as pq
import pytest

import ray.data

from janet_ray.pipelines.extract import build_extract_pipeline, run_metrics
from janet_ray.stages.search import count_matches


@pytest.fixture(scope="module")
def extracted(ray_session, small_corpus):
    ds = ray.data.read_parquet(os.path.join(small_corpus, "pages"))
    out = build_extract_pipeline(ds, batch_size=32, concurrency=2)
    return out.to_pandas(), small_corpus


def test_byte_identical_text_per_url(extracted):
    df, corpus = extracted
    golden = pq.read_table(os.path.join(corpus, "golden.parquet")).to_pandas()
    g = golden.set_index("url")
    assert len(df) == len(golden)  # dedupe collapsed duplicate urls
    mismatches = []
    for row in df.itertuples():
        grow = g.loc[row.url]
        if row.text != grow.text or row.route != grow.route or row.success != grow.success:
            mismatches.append(row.url)
        if grow.filename and row.filename != grow.filename:
            mismatches.append("filename:" + row.url)
    assert mismatches == []


def test_output_sorted_and_unique(extracted):
    df, _ = extracted
    urls = df["url"].tolist()
    assert urls == sorted(urls)
    assert len(set(urls)) == len(urls)


def test_spans_match_text_slices(extracted):
    df, _ = extracted
    checked = 0
    for row in df.itertuples():
        if not row.success or len(row.spans) == 0:
            continue
        for s in row.spans[:3]:
            frag = row.text[s["start"] : s["end"]]
            assert len(frag) == s["end"] - s["start"] > 0
        checked += 1
    assert checked > 50


def test_error_rows_are_data_not_exceptions(extracted):
    df, _ = extracted
    errs = df[~df["success"]]
    assert len(errs) > 0
    assert (errs["route"] == "error").all()
    assert (errs["error"] != "").all()
    assert (errs["text"] == "").all()


def test_anchor_match_counts(extracted):
    df, corpus = extracted
    with open(os.path.join(corpus, "matches.json")) as f:
        matches = json.load(f)
    by_url = df.set_index("url")
    for url, kws in matches.items():
        text = by_url.loc[url, "text"]
        for kw, expected in kws.items():
            assert count_matches(text, kw) == expected, (url, kw)


def test_run_metrics(ray_session, small_corpus):
    ds = ray.data.read_parquet(os.path.join(small_corpus, "pages"))
    out = build_extract_pipeline(ds, batch_size=32, concurrency=2, sort=False)
    m = run_metrics(out)
    assert m["processed"] == 300
    assert m["succeeded"] + m["failed"] == m["processed"]
    assert set(m["routes"]) >= {"html", "pdf", "ocr", "error"}
    assert m["failed"] == m["routes"]["error"]
