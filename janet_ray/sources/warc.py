"""WARC source — the native Common-Crawl input format (S1 generalized).

A minimal, dependency-free reader for WARC/1.0 response records (ISO 28500):

    WARC/1.0\\r\\n
    <warc headers>\\r\\n
    \\r\\n
    <Content-Length bytes: HTTP response = status line + headers + \\r\\n\\r\\n + body>
    \\r\\n\\r\\n

``read_warc`` maps WARC files to the engine's pages table
``(url, warc_ts, html, text, lang)`` Ray-Data-first: ``read_binary_files`` gives
one block per file (CC segment files are ~1 GB — natural input partitioning),
and a ``flat`` ``map_batches`` parses records vectorized-per-file. Gzip is
handled per FILE including multi-member streams (CC's record-per-member layout)
via a zlib decompressobj loop.

Malformed records are skipped, never fatal; the per-file skip count rides along
as a constant ``warc_skipped`` column on every emitted row of that file so a
downstream aggregate can audit record loss (error-as-data at the source layer).
"""

from __future__ import annotations

import zlib
from datetime import datetime

import pyarrow as pa

from janet_ray.schemas import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def gunzip_multi(data: bytes) -> bytes:
    """Decompress a gzip stream with any number of members (CC layout).
    Trailing garbage / corrupt members keep whatever decompressed cleanly —
    never fatal (the skipped-record audit reports the loss downstream)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break  # corrupt member or non-gzip padding: keep prior members
        data = d.unused_data
        if not d.eof:  # truncated member: keep what we got
            break
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version / status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int, int]:
    """→ (rows for response records, n_skipped, n_records_seen).

    ``n_records_seen`` counts every record header encountered (any WARC-Type),
    so a valid request-only/metadata-only segment is distinguishable from a
    corrupt one."""
    if data[:2] == b"\x1f\x8b":
        data = gunzip_multi(data)
    rows: list[dict] = []
    skipped = 0
    seen = 0
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            break
        hdr_end = data.find(_CRLF2, start)
        if hdr_end == -1:
            skipped += 1
            break
        head = data[start:hdr_end]
        headers = _parse_headers(head)
        seen += 1
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            skipped += 1
            pos = hdr_end + 4
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type", "").lower() != "response":
            continue  # warcinfo/request/metadata records are structural, not loss
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).replace(tzinfo=None)
        except ValueError:
            skipped += 1
            continue
        if not url or len(block) < length:
            skipped += 1
            continue
        # the block is an HTTP response; payload follows its header section
        http_split = block.find(_CRLF2)
        body = block[http_split + 4 :] if http_split != -1 else block
        rows.append({"url": url, "warc_ts": ts, "html": body})
    return rows, skipped, seen


def warc_batch_to_pages(batch: pa.Table) -> pa.Table:
    """map_batches body over read_binary_files output (columns: bytes, path)."""
    urls, tss, payloads, skips = [], [], [], []
    paths = (batch["path"].to_pylist() if "path" in batch.column_names
             else [""] * batch.num_rows)
    for data, path in zip(batch["bytes"].to_pylist(), paths):
        try:
            rows, skipped, seen = parse_warc_bytes(data or b"")
        except Exception:  # never let one segment kill the pipeline
            rows, skipped, seen = [], 1, 0
        if not rows and (skipped or (data and seen == 0)):
            # a fully-corrupt / non-WARC segment would otherwise vanish from
            # the audit — surface it as one error-as-data row. A VALID
            # request-/metadata-only segment (seen > 0, skipped == 0) is NOT
            # loss and emits nothing.
            skipped = max(skipped, 1)
            rows = [{"url": f"warc-error://{path or 'unknown-segment'}",
                     "warc_ts": datetime(1970, 1, 1), "html": b""}]
        for r in rows:
            urls.append(r["url"])
            tss.append(r["warc_ts"])
            payloads.append(r["html"])
            skips.append(skipped)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array([""] * len(urls), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    return t.append_column("warc_skipped", pa.array(skips, pa.int64()))


def _list_warc_files(paths) -> list[str]:
    import os

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                       if not f.startswith("_"))
        else:
            out.append(p)
    return sorted(out)


def _load_warc_paths(batch: pa.Table) -> pa.Table:
    """Read each segment's RAW bytes (no extension-based auto-gunzip — Ray's
    reader hard-fails on trailing padding, which gunzip_multi tolerates)."""
    from pyarrow import fs as pafs

    rows = []
    for path in batch["path"].to_pylist():
        if "://" in path:
            filesystem, rel = pafs.FileSystem.from_uri(path)
        else:
            filesystem, rel = pafs.LocalFileSystem(), path
        try:
            with filesystem.open_input_stream(rel, compression=None) as f:
                data = f.readall()
        except OSError:
            data = b"\x00"  # unreadable segment → audit row downstream
        rows.append(data)
    return pa.table({"bytes": pa.array(rows, pa.binary()), "path": batch["path"]})


def read_warc(paths, **kwargs) -> "ray.data.Dataset":
    """WARC file(s)/dir → pages Dataset (+ ``warc_skipped`` audit column).

    One task per segment file (CC segments are ~1 GB — natural partitioning);
    bytes are read raw and decompressed by the tolerant ``gunzip_multi``."""
    import ray.data

    files = _list_warc_files(paths)
    if not files:
        raise FileNotFoundError(f"no WARC files under {paths!r}")
    ds = ray.data.from_items([{"path": p} for p in files],
                             override_num_blocks=len(files))
    return ds.map_batches(_load_warc_paths, batch_format="pyarrow",
                          zero_copy_batch=True, **kwargs).map_batches(
        warc_batch_to_pages, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ writer
# (tests/fixtures only — the engine consumes WARC, it does not produce it)

def build_warc(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """records: [{url, ts: datetime, html: bytes}] → WARC/1.0 bytes."""
    import gzip as _gzip

    out = []
    for r in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"])
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['ts'].isoformat()}Z\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
        )
        rec = head + b"\r\n" + http + b"\r\n\r\n"
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)
