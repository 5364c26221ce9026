"""Source adapters: the driver's ``documents`` table → CC-style pages / media
tables, as DISTRIBUTED ``map_batches`` bodies (never a driver-side loop).

Each adapter is per-row deterministic — randomness (boilerplate link text) is
seeded from ``doc_id``, so the emitted payload bytes are identical regardless of
batch boundaries, run order, or cluster size (the resume/byte-identity contract,
SURVEY.md §7.4).

Derived facts an oracle can recompute in SQL (parity contract used by
``__ray_entry__.oracle_sql``):

    url                 'https://docs.example/d-' || lpad(doc_id, 7, '0')
    html golden text    'Document {doc_id} synthetic article' || '\\n\\n' ||
                        collapse_ws(text < 60 chars ? text + ' ' + 'pad '*20 : text)
    pdf  golden text    words of ``text`` joined by single spaces
    mixed route         doc_id % 10 == 0 → pdf | == 9 → error | else html
    media dims (JIMG)   width = 8 + doc_id % 9, height = 6 + doc_id % 5
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from janet_ray.formats import jpdf
from janet_ray.schemas import PAGES_SCHEMA
from janet_ray.stages.media import encode_jimg

EPOCH = datetime(2024, 1, 1)

_PAD = " " + "pad " * 20  # golden-stable padding for sub-threshold docs


def doc_url(doc_id: int) -> str:
    return f"https://docs.example/d-{doc_id:07d}"


def _link_soup(doc_id: int, k: int) -> str:
    rng = np.random.RandomState((doc_id * 2654435761 + 17) & 0x7FFFFFFF)
    words = ["home", "about", "login", "next", "prev", "tags", "archive", "contact"]
    return " ".join(
        f'<a href="/l{rng.randint(999)}">{words[rng.randint(len(words))]}</a>'
        for _ in range(k)
    )


def html_payload(doc_id: int, text: str) -> bytes:
    title = f"Document {doc_id} synthetic article"
    para = text if len(text) >= 60 else text + _PAD
    nav = f"<nav>{_link_soup(doc_id, 8)}</nav>"
    footer = f"<footer>{_link_soup(doc_id, 4)} © 2024 corp</footer>"
    doc = (
        f"<!DOCTYPE html><html><head><title>{title}</title></head>"
        f"<body>{nav}<article><h1>{title}</h1><p>{para}</p></article>{footer}</body></html>"
    )
    return doc.encode("utf-8")


def pdf_payload(text: str) -> bytes:
    """Single PG page; items = 3-word chunks at increasing (y, x) — the native
    text layer reconstructs to words joined by single spaces."""
    ws = text.split()
    items, x, y = [], 30, 40
    for j in range(0, len(ws), 3):
        items.append((x, y, " ".join(ws[j : j + 3])))
        x += 120
        if x > 500:
            x, y = 30, y + 14
    return jpdf.encode([{"items": items}])


def scan_payload(text: str) -> bytes:
    """Scanned (rasterized) page — forces the OCR route."""
    return jpdf.encode([{"scan": text}])


MONTH_NAMES = ["January", "February", "March", "April", "May", "June", "July",
               "August", "September", "October", "November", "December"]


def rich_lead(doc_id: int) -> tuple[int, int, int, int, int]:
    """Deterministic (year, month, day, doc_number, amount) for the rich lead —
    the SAME arithmetic the SQL oracles replay (doc_id-derived)."""
    m = 1 + doc_id % 12
    d = 1 + doc_id % 27
    y = 2020 + doc_id % 6
    num = 1_000_000 + doc_id
    amt = 10 + doc_id % 4990
    return y, m, d, num, amt


def rich_html_payload(doc_id: int, text: str, org: str) -> bytes:
    """Article whose lead paragraph carries real filename/metadata signal
    (date + org + Statement number + amount) — exercises the P9/P13 derivation
    beyond the identity-fallback path."""
    y, m, d, num, amt = rich_lead(doc_id)
    lead = (f"Published {MONTH_NAMES[m - 1]} {d}, {y} by {org} "
            f"Statement Account No. {num} amount ${amt}.00. ")
    title = f"Document {doc_id} synthetic article"
    para = lead + text
    nav = f"<nav>{_link_soup(doc_id, 8)}</nav>"
    doc = (
        f"<!DOCTYPE html><html><head><title>{title}</title></head>"
        f"<body>{nav}<article><h1>{title}</h1><p>{para}</p></article></body></html>"
    )
    return doc.encode("utf-8")


def rich_pages_batch(batch: pa.Table) -> pa.Table:
    from janet_ray.stages.naming import ORG_VOCAB

    ids, texts, langs, tss = _common(batch)
    payloads = [rich_html_payload(i, t, ORG_VOCAB[i % len(ORG_VOCAB)])
                for i, t in zip(ids, texts)]
    return _pages_table(ids, tss, payloads, [""] * len(ids), langs)


def media_payload(doc_id: int, text: str) -> bytes:
    w, h = 8 + doc_id % 9, 6 + doc_id % 5
    body = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    body = np.resize(body, w * h).reshape(h, w)
    return encode_jimg(body)


def _pages_table(ids, tss, payloads, hints, langs) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([doc_url(i) for i in ids], pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(hints, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def _common(batch: pa.Table):
    ids = batch["doc_id"].to_pylist()
    texts = [t or "" for t in batch["text"].to_pylist()]
    langs = (
        [l or "" for l in batch["lang"].to_pylist()]
        if "lang" in batch.column_names else [""] * len(ids)
    )
    tss = [EPOCH + timedelta(seconds=int(i)) for i in ids]
    return ids, texts, langs, tss


def html_pages_batch(batch: pa.Table) -> pa.Table:
    ids, texts, langs, tss = _common(batch)
    return _pages_table(ids, tss, [html_payload(i, t) for i, t in zip(ids, texts)],
                        [""] * len(ids), langs)


def pdf_pages_batch(batch: pa.Table) -> pa.Table:
    ids, texts, langs, tss = _common(batch)
    return _pages_table(ids, tss, [pdf_payload(t) for t in texts], [""] * len(ids), langs)


def scan_pages_batch(batch: pa.Table) -> pa.Table:
    ids, texts, langs, tss = _common(batch)
    return _pages_table(ids, tss, [scan_payload(t) for t in texts], [""] * len(ids), langs)


def mixed_pages_batch(batch: pa.Table) -> pa.Table:
    """Route mix for router/metrics oracles: doc_id%10==0 → pdf, ==9 → error-row
    (empty payload + empty hint), else html."""
    ids, texts, langs, tss = _common(batch)
    payloads: list[bytes] = []
    for i, t in zip(ids, texts):
        m = i % 10
        payloads.append(pdf_payload(t) if m == 0 else b"" if m == 9 else html_payload(i, t))
    return _pages_table(ids, tss, payloads, [""] * len(ids), langs)


def media_batch(batch: pa.Table) -> pa.Table:
    ids, texts, _, _ = _common(batch)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "media": pa.array([media_payload(i, t) for i, t in zip(ids, texts)], pa.binary()),
    })
