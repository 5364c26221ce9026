"""WARC + JSONL/CSV source adapters → pages table → full extraction."""
import base64
import csv
import gzip
import json
import os
from datetime import datetime

import pyarrow as pa
import pytest

from janet_ray.sources import warc
from janet_ray.sources.tabular import read_pages_csv, read_pages_json


def _records():
    return [
        {"url": f"https://w.example/p{i}", "ts": datetime(2024, 1, 1, i),
         "html": (f"<html><body><article><h1>Title {i}</h1>"
                  f"<p>{'content words here ' * 8}page {i}</p></article>"
                  f"</body></html>").encode()}
        for i in range(5)
    ]


def test_parse_warc_roundtrip():
    data = warc.build_warc(_records())
    rows, skipped, seen = warc.parse_warc_bytes(data)
    assert skipped == 0 and len(rows) == 5 and seen == 5
    assert rows[0]["url"] == "https://w.example/p0"
    assert rows[0]["warc_ts"] == datetime(2024, 1, 1, 0)
    assert rows[2]["html"].startswith(b"<html>")


def test_parse_warc_gzip_members():
    data = warc.build_warc(_records(), gzip_members=True)
    assert data[:2] == b"\x1f\x8b"
    rows, skipped, seen = warc.parse_warc_bytes(data)
    assert skipped == 0 and len(rows) == 5 and seen == 5


def test_parse_warc_skips_malformed_and_nonresponse():
    good = warc.build_warc(_records()[:2])
    nonresp = (b"WARC/1.0\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: https://w.example/req\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nGET \r\n\r\n")
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    rows, skipped, seen = warc.parse_warc_bytes(nonresp + good + bad)
    assert len(rows) == 2          # request record ignored silently
    assert skipped == 1            # malformed length counted
    assert seen == 4               # every record header observed


def test_read_warc_to_extraction(ray_session, tmp_path):
    """WARC files → pages Dataset → flagship extraction, end to end."""
    from janet_ray.pipelines.extract import build_extract_pipeline

    for shard in range(2):
        with open(tmp_path / f"seg-{shard}.warc", "wb") as f:
            f.write(warc.build_warc(_records()[shard * 2:(shard + 1) * 2]))
    ds = warc.read_warc(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 4
    assert all(r["warc_skipped"] == 0 for r in rows)
    out = build_extract_pipeline(
        ds.drop_columns(["warc_skipped"]), dedupe=False, sort=True
    ).take_all()
    assert len(out) == 4
    assert all(r["route"] == "html" and r["success"] for r in out)
    assert out[0]["text"].startswith("Title ")


@pytest.fixture
def page_rows():
    return [
        {"u": f"https://t.example/{i}", "when": f"2024-01-0{i+1}T00:00:00",
         "payload": base64.b64encode(
             f"<html><p>{'words ' * 20}row {i}</p></html>".encode()).decode(),
         "language": "en"}
        for i in range(3)
    ]


def test_read_pages_json(ray_session, tmp_path, page_rows):
    p = tmp_path / "pages.jsonl"
    with open(p, "w") as f:
        for r in page_rows:
            f.write(json.dumps(r) + "\n")
    ds = read_pages_json(str(p), mapping={"url": "u", "warc_ts": "when",
                                          "html": "payload", "lang": "language"})
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert len(rows) == 3
    assert rows[0]["html"].startswith(b"<html>")
    assert rows[0]["lang"] == "en" and rows[0]["text"] == ""
    assert rows[1]["warc_ts"] == datetime(2024, 1, 2)


def test_read_pages_csv(ray_session, tmp_path, page_rows):
    p = tmp_path / "pages.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["u", "when", "payload", "language"])
        w.writeheader()
        for r in page_rows:
            w.writerow(r)
    ds = read_pages_csv(str(p), mapping={"url": "u", "warc_ts": "when",
                                         "html": "payload", "lang": "language"})
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert len(rows) == 3 and rows[2]["html"].endswith(b"</html>")


def test_warc_request_only_segment_is_not_loss(ray_session, tmp_path):
    """A valid request-only WARC (CC publishes those) must emit neither rows
    nor a fabricated error row."""
    nonresp = (b"WARC/1.0\r\nWARC-Type: request\r\n"
               b"WARC-Target-URI: https://w.example/req\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nGET \r\n\r\n")
    with open(tmp_path / "req.warc", "wb") as f:
        f.write(nonresp * 3)
    assert warc.read_warc(str(tmp_path)).count() == 0


def test_warc_gzip_trailing_garbage_not_fatal(ray_session, tmp_path):
    """Trailing non-gzip padding after the last member keeps the good records
    (the review repro: gzip.compress(rec) + NUL padding crashed the read)."""
    data = warc.build_warc(_records()[:3], gzip_members=True) + b"\x00" * 16
    with open(tmp_path / "pad.warc.gz", "wb") as f:
        f.write(data)
    rows = warc.read_warc(str(tmp_path)).take_all()
    assert len(rows) == 3
    assert all(not r["url"].startswith("warc-error") for r in rows)


def test_read_pages_json_iso_variants(ray_session, tmp_path):
    """Z-suffix, offset, fractional seconds, and date-only timestamps all
    parse — including MIXED within one column (the common real-export case)."""
    rows = [
        {"u": "https://t/1", "when": "2024-01-01T10:00:00Z", "payload": None},
        {"u": "https://t/2", "when": "2024-01-01T05:00:00-05:00", "payload": None},
        {"u": "https://t/3", "when": "2024-01-01T10:00:00.250Z", "payload": None},
        {"u": "https://t/4", "when": "2024-01-01", "payload": None},
    ]
    p = tmp_path / "iso.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = {r["url"]: r["warc_ts"] for r in read_pages_json(
        str(p), mapping={"url": "u", "warc_ts": "when", "html": "payload"}).take_all()}
    assert out["https://t/1"] == datetime(2024, 1, 1, 10)
    assert out["https://t/2"] == datetime(2024, 1, 1, 10)  # offset normalized to UTC
    assert out["https://t/3"] == datetime(2024, 1, 1, 10, 0, 0, 250000)
    assert out["https://t/4"] == datetime(2024, 1, 1)


def test_warc_and_parquet_paths_extract_identically(ray_session, small_corpus, tmp_path):
    """The same corpus served via WARC segments and via parquet pages must
    extract byte-identically (source adapters are transparent)."""
    import glob as _glob

    import pyarrow.parquet as pq
    import ray.data
    from janet_ray.pipelines.extract import build_extract_pipeline

    files = sorted(_glob.glob(os.path.join(small_corpus, "pages", "*.parquet")))[:2]
    pages = pq.read_table(files)
    # render the html-routed rows as WARC response records
    recs = [
        {"url": u, "ts": t, "html": h}
        for u, t, h in zip(pages["url"].to_pylist(), pages["warc_ts"].to_pylist(),
                           pages["html"].to_pylist())
        if h and h[:1] == b"<"
    ]
    assert len(recs) > 10
    for shard in range(2):
        with open(tmp_path / f"s{shard}.warc.gz", "wb") as f:
            f.write(warc.build_warc(recs[shard::2], gzip_members=True))

    via_warc = build_extract_pipeline(
        warc.read_warc(str(tmp_path)).drop_columns(["warc_skipped"]),
        dedupe=True, sort=True)
    via_parquet = build_extract_pipeline(
        ray.data.read_parquet(files).filter(
            lambda r: bool(r["html"]) and bytes(r["html"])[:1] == b"<"),
        dedupe=True, sort=True)
    a = [(r["url"], r["text"], r["route"]) for r in via_warc.take_all()]
    b = [(r["url"], r["text"], r["route"]) for r in via_parquet.take_all()]
    assert a == b and len(a) == len({u for u, _, _ in a})
