"""P1 — the extraction router (SURVEY.md §2.2).

The reference routes per document: try native text extraction, fall back to OCR when
content is *empty* (de-facto semantics of apps/legacy/src/services/fileProcessor.ts:22-44
— the NoTextContentError branch at :36 is dead code; emptiness is the real trigger), and
errors become data rows (fileProcessor.ts:70-76), never exceptions.

Here the router is a vectorized magic-byte sniffer over the ``html: binary`` column:
only a 16-byte prefix per row is inspected (the payload itself stays zero-copy in the
Arrow block). Route values:

    pdf    payload starts with %PDF-            → PDF layout-parse path (native text or OCR)
    html   payload starts with an HTML-ish tag  → boilerplate-strip path
    text   payload empty/unknown but the ``text`` column is non-empty → passthrough
    error  nothing usable                       → error-as-data row

The pdf→ocr refinement (no text layer ⇒ OCR) happens inside the extract stage, where
page records are actually inspected — mirroring the reference's content-emptiness rule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ROUTE_PDF = "pdf"
ROUTE_HTML = "html"
ROUTE_TEXT = "text"
ROUTE_ERROR = "error"

_SNIFF_LEN = 16


def _sniff_one(prefix: bytes | None, text_nonempty: bool) -> str:
    if prefix:
        if prefix.startswith(b"%PDF-"):
            return ROUTE_PDF
        head = prefix.lstrip()[:9].lower()
        if head.startswith((b"<!doctype", b"<html", b"<body", b"<div", b"<p", b"<article")):
            return ROUTE_HTML
        if head.startswith(b"<") and len(head) > 1 and (
            chr(head[1]).isalpha() or head[1] in b"!/"
        ):
            return ROUTE_HTML
    if text_nonempty:
        return ROUTE_TEXT
    return ROUTE_ERROR


def sniff_routes(batch: pa.Table, custom_sniffers=None) -> pa.Table:
    """map_batches(batch_format="pyarrow") body: append a ``route`` column.

    Only ``binary_slice(html, 0, 16)`` is materialized to Python (16 B/row);
    the multi-MB payloads are untouched.

    ``custom_sniffers``: ordered ``[(route_name, predicate(prefix) -> bool)]``
    checked BEFORE the built-ins — the §2.10 router extension point (the
    analogue of the reference's plugin install hooks,
    apps/search/src/searchPlugin.tsx:38-48). Pair each custom route with an
    ExtractStage ``route_handlers`` entry; use ``make_sniffer`` to bind the
    list for a pipeline."""
    prefixes = pc.binary_slice(batch["html"], 0, _SNIFF_LEN).to_pylist()
    if "text" in batch.column_names:
        nonempty = pc.greater(
            pc.utf8_length(pc.coalesce(batch["text"], pa.scalar("", type=pa.string()))), 0
        ).to_pylist()
    else:
        nonempty = [False] * batch.num_rows
    if custom_sniffers:
        def route_one(p, t):
            if p:
                for name, pred in custom_sniffers:
                    if pred(p):
                        return name
            return _sniff_one(p, t)
        routes = [route_one(p, t) for p, t in zip(prefixes, nonempty)]
    else:
        routes = [_sniff_one(p, t) for p, t in zip(prefixes, nonempty)]
    return batch.append_column("route", pa.array(routes, type=pa.string()))


def make_sniffer(custom_sniffers):
    """Bind custom sniffers into a map_batches-ready function (closure-shipped
    to workers; predicates must be picklable module-level callables)."""
    def sniff(batch: pa.Table) -> pa.Table:
        return sniff_routes(batch, custom_sniffers)
    return sniff
