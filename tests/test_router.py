"""Routing truth table — mirrors the reference's mocked-engine routing tests
(apps/legacy/tests/services/pdf.test.ts:52-115 semantics, SURVEY.md §5 layer 1)."""

import pyarrow as pa

from janet_ray.schemas import PAGES_SCHEMA
from janet_ray.stages.router import sniff_routes


def _batch(rows):
    return pa.table(
        {
            "url": [r.get("url", "https://x.example/a") for r in rows],
            "warc_ts": pa.array([None] * len(rows), pa.timestamp("us")),
            "html": [r.get("html", b"") for r in rows],
            "text": [r.get("text", "") for r in rows],
            "lang": ["en"] * len(rows),
        },
        schema=PAGES_SCHEMA,
    )


def routes_of(rows):
    return sniff_routes(_batch(rows))["route"].to_pylist()


def test_pdf_magic():
    assert routes_of([{"html": b"%PDF-1.7\nstuff"}]) == ["pdf"]


def test_html_variants():
    assert routes_of(
        [
            {"html": b"<!DOCTYPE html><html>"},
            {"html": b"<html lang=en>"},
            {"html": b"  \n <div>x</div>"},
            {"html": b"<p>hi</p>"},
            {"html": b"<article>"},
        ]
    ) == ["html"] * 5


def test_text_passthrough_on_empty_payload_with_text():
    assert routes_of([{"html": b"", "text": "pre-extracted"}]) == ["text"]


def test_error_when_nothing_usable():
    assert routes_of([{"html": b""}, {"html": b"\x00\x01junk"}]) == ["error", "error"]


def test_junk_with_text_hint_routes_text():
    assert routes_of([{"html": b"\x00\x01junk", "text": "hint"}]) == ["text"]
