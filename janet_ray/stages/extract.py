"""The unified extraction stage — P1 routing consequences + P2/P3/P5 extraction.

One actor-pool ``map_batches`` stage processes every route in a single pass over the
batch (pages of a document stay together → spans are trivially consistent,
SURVEY.md §7.2 step 6). The actor holds the warm OCR engine (T1/T2 done right) and
the precompiled vocab/regex state (T6).

Error-as-data: any per-document failure becomes ``success=False, route="error",
error=<message>`` (fileProcessor.ts:70-76 / ocr.ts:79-84 semantics); a poison row
never kills the task.

Usage:
    ds.map_batches(ExtractStage, batch_format="pyarrow", batch_size=B,
                   concurrency=(min, max), num_cpus=1, zero_copy_batch=True)
"""

from __future__ import annotations

import pyarrow as pa

from janet_ray.formats import jpdf
from janet_ray.functions.text import url_host
from janet_ray.schemas import EXTRACTED_SCHEMA, SPAN_TYPE
from janet_ray.stages import ocr as ocr_mod
from janet_ray.stages.html_extract import extract_html
from janet_ray.stages.metadata import extract_metadata  # noqa: F401 (re-export for pipelines)
from janet_ray.stages.naming import derive_filename
from janet_ray.stages.pdf_extract import extract_pdf_text
from janet_ray.stages.router import ROUTE_ERROR, ROUTE_HTML, ROUTE_PDF, ROUTE_TEXT


class ExtractStage:
    """Callable class → Ray actor pool. Engine + vocab state built once per actor.

    ``deadline_s``: per-row wall-clock budget (SURVEY §4; the reference's 30 s
    pdftoppm kill / 60 s Vision cap) — a row that exceeds it becomes an error
    row, the actor and batch survive. ``strict_ocr``: A2 strict gate — any
    failed OCR page fails the document (ocr-controller.ts:120-131).

    ``route_handlers``: §2.10 extension surface — ``{route_name: handler}``
    where ``handler(payload: bytes, hint_text: str | None) -> (text, spans,
    n_pages)``; consulted BEFORE the built-in routes, paired with a custom
    sniffer (router.make_sniffer). Handler exceptions become error rows like
    any other route (error-as-data)."""

    def __init__(self, engine_factory=ocr_mod.GlyphGridEngine,
                 deadline_s: float | None = 30.0, strict_ocr: bool = False,
                 route_handlers: dict | None = None):
        self.engine = engine_factory()
        self.deadline_s = deadline_s
        self.strict_ocr = strict_ocr
        self.route_handlers = route_handlers or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from janet_ray.functions.deadline import RowDeadlineExceeded, row_deadline

        urls = batch["url"].to_pylist()
        routes = batch["route"].to_pylist()
        payloads = batch["html"].to_pylist()
        texts = batch["text"].to_pylist() if "text" in batch.column_names else [None] * len(urls)

        out = {k: [] for k in (
            "filename", "text", "spans", "route", "success", "error", "n_pages",
            "n_chars", "n_failed_pages", "ocr_confidence"
        )}
        for url, route, payload, hint_text in zip(urls, routes, payloads, texts):
            text: str | None = None
            spans: list[dict] = []
            n_pages = 0
            n_failed_pages = 0
            confidence: float | None = None
            err = ""
            final_route = route
            try:
                with row_deadline(self.deadline_s):
                    if route in self.route_handlers:
                        text, spans, n_pages = self.route_handlers[route](
                            payload, hint_text)
                        if not text:
                            final_route, err = ROUTE_ERROR, "handler produced no text"
                    elif route == ROUTE_HTML:
                        text, spans = extract_html(payload)
                        n_pages = 1
                        if not text:
                            final_route, err = ROUTE_ERROR, "no main content"
                    elif route == ROUTE_PDF:
                        text, spans, n_pages = extract_pdf_text(payload)
                        if text is None:
                            # content-emptiness OCR fallback (fileProcessor.ts:25,44)
                            pages = jpdf.parse(payload)
                            text, spans, n_pages, n_failed_pages, confidence = (
                                ocr_mod.ocr_document_stats(pages, self.engine,
                                                           strict=self.strict_ocr))
                            final_route = "ocr"
                            if not text:
                                final_route, err = ROUTE_ERROR, "ocr produced no text"
                    elif route == ROUTE_TEXT:
                        text = hint_text or ""
                        spans = [{"page": 0, "start": 0, "end": len(text), "kind": "text"}]
                        n_pages = 1
                        if not text:
                            final_route, err = ROUTE_ERROR, "empty text"
                    else:
                        err = "unrecognized payload"
                        final_route = ROUTE_ERROR
            except RowDeadlineExceeded as e:
                final_route, err, text, spans = ROUTE_ERROR, str(e), None, []
            except ocr_mod.OcrStrictError as e:
                final_route, err, text, spans = ROUTE_ERROR, f"strict gate: {e}", None, []
            except jpdf.JPdfError as e:
                final_route, err, text, spans = ROUTE_ERROR, f"malformed container: {e}", None, []
            except Exception as e:  # poison row → error row, never a task failure
                final_route, err, text, spans = ROUTE_ERROR, f"{type(e).__name__}: {e}", None, []

            success = final_route != ROUTE_ERROR
            text_out = text if success and text else ""
            out["filename"].append(
                derive_filename(url, text_out) if success else _identity(url)
            )
            out["text"].append(text_out)
            out["spans"].append(spans if success else [])
            out["route"].append(final_route)
            out["success"].append(success)
            out["error"].append(err)
            out["n_pages"].append(n_pages)
            out["n_chars"].append(len(text_out))
            out["n_failed_pages"].append(n_failed_pages)
            out["ocr_confidence"].append(confidence)

        hosts = [url_host(u) for u in urls]
        cols = {
            "url": batch["url"],
            "host": pa.array(hosts, type=pa.string()),
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"] if "lang" in batch.column_names
            else pa.nulls(len(urls), pa.string()),
            "filename": pa.array(out["filename"], type=pa.string()),
            "text": pa.array(out["text"], type=pa.string()),
            "spans": pa.array(out["spans"], type=pa.list_(SPAN_TYPE)),
            "route": pa.array(out["route"], type=pa.string()),
            "success": pa.array(out["success"], type=pa.bool_()),
            "error": pa.array(out["error"], type=pa.string()),
            "n_pages": pa.array(out["n_pages"], type=pa.int32()),
            "n_chars": pa.array(out["n_chars"], type=pa.int64()),
            "n_failed_pages": pa.array(out["n_failed_pages"], type=pa.int32()),
            "ocr_confidence": pa.array(out["ocr_confidence"], type=pa.float64()),
        }
        return pa.table(cols, schema=EXTRACTED_SCHEMA)


def _identity(url: str) -> str:
    from janet_ray.stages.naming import _identity_filename

    return _identity_filename(url)
