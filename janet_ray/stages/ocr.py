"""P5/T1/T2 — the stateful OCR engine (SURVEY.md §2.3).

The reference creates and terminates a Tesseract worker *per document*
(apps/legacy/src/services/ocr.ts:41,86-87 — pure overhead) while the Vision client is
a lazy module singleton (apps/ocr/src/lib/ocr-utils.ts:61-83 — the right intent). In
Ray Data the correct expression is an **actor pool**: the engine loads once in
``__init__`` and stays warm across batches
(``map_batches(ExtractStage, concurrency=(min,max), batch_size=B)``).

``GlyphGridEngine`` is the in-sandbox deterministic engine (decodes the jpdf glyph-grid
raster — see formats/jpdf.py). ``TesseractEngine`` is the production interface stub:
the sandbox has no raster libs (SURVEY.md §7.0), so it raises NotImplementedError with
the integration contract documented.

Pinned OCR text semantics: per-page decoded text, pages joined with "\\n\\n"
(apps/legacy/src/services/ocr.ts:60), document stripped.
"""

from __future__ import annotations

from janet_ray.formats import jpdf


class OcrStrictError(Exception):
    """A2 — strict gate: any failed page fails the document
    (apps/ocr/src/controllers/ocr-controller.ts:120-131)."""


class OcrEngine:
    """Interface: decode one raster page → text."""

    def decode_page(self, packed: bytes, width: int, height: int) -> str:
        raise NotImplementedError

    def decode_page_stats(self, packed: bytes, width: int, height: int) -> tuple[str, float]:
        """(text, confidence ∈ [0, 1]) — A5 per-page OCR confidence
        (apps/legacy/src/services/ocr.ts:58). Engines without native
        confidence report 1.0."""
        return self.decode_page(packed, width, height), 1.0


class GlyphGridEngine(OcrEngine):
    """Deterministic glyph-grid decoder. The reverse font table is the warm 'model'
    state, built once per actor (equivalent to the Vision client singleton intent,
    ocr-utils.ts:72-79)."""

    def __init__(self) -> None:
        # Force the font tables to be materialized in this process — the warm state.
        self._reverse = dict(jpdf.FONT_REVERSE)

    def decode_page(self, packed: bytes, width: int, height: int) -> str:
        return jpdf.decode_bitmap(packed, width, height)

    def decode_page_stats(self, packed: bytes, width: int, height: int) -> tuple[str, float]:
        text, n_glyphs, n_unknown = jpdf.decode_bitmap_stats(packed, width, height)
        conf = 1.0 if n_glyphs == 0 else (n_glyphs - n_unknown) / n_glyphs
        return text, conf


class TesseractEngine(OcrEngine):  # pragma: no cover - production stub
    """Production engine: pdfium page raster at 200 DPI (the reference's
    ``pdftoppm -jpeg -r 200``, ocr-utils.ts:167) + a warm Tesseract API handle.
    Unavailable in this sandbox (no pdfium/tesseract binaries)."""

    def __init__(self) -> None:
        raise NotImplementedError(
            "TesseractEngine requires pypdfium2 + pytesseract; wire them here and "
            "keep the handle on the actor (one init per actor, reused per batch)."
        )


def word_boxes_page(page_text: str) -> list[dict]:
    """P8 — text-layer geometry (ocr-utils.ts:227-274): per-word bounding boxes
    on the glyph grid plus the reference's font-size rule
    ``fontSize = max(0.8 * h, 8)`` (ocr-utils.ts:253).

    The glyph grid is deterministic (formats/jpdf.py): character (line i, col j)
    occupies the cell x∈[j·CELL_W, j·CELL_W+GLYPH_W), y∈[i·CELL_H, i·CELL_H+GLYPH_H),
    so a k-char word's box is exact — the analogue of Vision's 4-vertex
    boundingPoly (ocr-utils.ts:240-251)."""
    import re as _re

    out: list[dict] = []
    for line_idx, line in enumerate(page_text.split("\n")):
        for m in _re.finditer(r"\S+", line):
            x0 = m.start() * jpdf.CELL_W
            y0 = line_idx * jpdf.CELL_H
            w = (m.end() - m.start() - 1) * jpdf.CELL_W + jpdf.GLYPH_W
            h = jpdf.GLYPH_H
            out.append({
                "text": m.group(0),
                "x0": x0, "y0": y0, "x1": x0 + w, "y1": y0 + h,
                "font_size": max(0.8 * jpdf.CELL_H, 8.0),
            })
    return out


def ocr_word_boxes(pages: list[dict], engine: OcrEngine) -> list[list[dict]]:
    """Per-page word geometry for a parsed jpdf container — the data a
    searchable-PDF sink (S11, ocr-utils.ts:279-336) would lay under the image."""
    boxes: list[list[dict]] = []
    for page in pages:
        if page["kind"] == "scan":
            boxes.append(word_boxes_page(
                engine.decode_page(page["packed"], page["width"], page["height"])))
        else:
            items = sorted(page["items"], key=lambda it: (it[1], it[0]))
            boxes.append([
                {"text": t, "x0": float(x), "y0": float(y),
                 "x1": float(x) + 6.0 * len(t), "y1": float(y) + 8.0,
                 "font_size": 8.0}
                for x, y, t in items
            ])
    return boxes


class RetryingEngine(OcrEngine):
    """Wrap a flaky engine with the reference's retry policy (3 retries,
    exp backoff 1s·2^k + ≤1s jitter — ocr-utils.ts:107-151). Meant for
    production engines with transient failure modes (network OCR, subprocess
    raster); the deterministic glyph engine does not need it."""

    def __init__(self, inner: OcrEngine, *, retries: int = 3, base_s: float = 1.0,
                 max_jitter_s: float = 1.0, sleep=None, rng=None):
        from janet_ray.functions.retry import retry_with_backoff
        import time as _time

        self._inner = inner
        self._retry = lambda fn: retry_with_backoff(
            fn, retries=retries, base_s=base_s, max_jitter_s=max_jitter_s,
            sleep=sleep or _time.sleep, rng=rng)

    def decode_page(self, packed: bytes, width: int, height: int) -> str:
        return self._retry(lambda: self._inner.decode_page(packed, width, height))

    def decode_page_stats(self, packed: bytes, width: int, height: int):
        return self._retry(
            lambda: self._inner.decode_page_stats(packed, width, height))


class SearchableArtifactStage:
    """S11 — the searchable-artifact sink (ocr-utils.ts:279-336) as an actor-pool
    stage: jpdf payload → per-page raster + invisible positioned text layer,
    serialized with formats/textlayer. Engine state is warm per actor; malformed
    payloads become error rows (null artifact), never exceptions."""

    def __init__(self) -> None:
        self.engine = GlyphGridEngine()

    def __call__(self, batch):
        import pyarrow as pa

        from janet_ray.formats.textlayer import build_searchable_artifact

        urls, blobs, n_pages, n_words, errors = [], [], [], [], []
        for url, payload in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            urls.append(url)
            try:
                pages = jpdf.parse(payload)
                boxes = ocr_word_boxes(pages, self.engine)
                blobs.append(build_searchable_artifact(pages, boxes))
                n_pages.append(len(pages))
                n_words.append(sum(len(b) for b in boxes))
                errors.append(None)
            except (jpdf.JPdfError, ValueError) as e:
                blobs.append(None)
                n_pages.append(0)
                n_words.append(0)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "artifact": pa.array(blobs, pa.large_binary()),
            "n_pages": pa.array(n_pages, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


def ocr_document(pages: list[dict], engine: OcrEngine) -> tuple[str, list[dict], int]:
    """Decode all scan pages of a parsed jpdf container (stats discarded —
    see ocr_document_stats for the A2/A5 variant).

    Returns (text, spans, n_pages): per-page spans into the final text; pages joined
    with "\\n\\n"; text-layer pages inside a scanned doc contribute their native text
    (mixed docs keep page order)."""
    text, spans, n_pages, _, _ = ocr_document_stats(pages, engine)
    return text, spans, n_pages


def ocr_document_stats(
    pages: list[dict], engine: OcrEngine, *, strict: bool = False,
) -> tuple[str, list[dict], int, int, float | None]:
    """A2/A5 — ocr_document plus per-page failure accounting and confidence.

    Returns (text, spans, n_pages, n_failed_pages, confidence): a scan page
    whose decode raises contributes an empty page (order preserved) and counts
    as failed — the reference's ``pageCount - pageData.length``
    (ocr-controller.ts:120-124); ``confidence`` is the mean over successfully
    decoded scan pages (None when the doc has no scan pages). With
    ``strict=True`` any failed page raises OcrStrictError — the controller's
    throw at ocr-controller.ts:126-131."""
    page_texts: list[str] = []
    n_failed = 0
    confs: list[float] = []
    for page in pages:
        if page["kind"] == "scan":
            try:
                text, conf = engine.decode_page_stats(
                    page["packed"], page["width"], page["height"])
                page_texts.append(text)
                confs.append(conf)
            except Exception as e:
                # A row-level deadline is not a page failure — it must abort
                # the whole row (the stage converts it to an error row).
                from janet_ray.functions.deadline import RowDeadlineExceeded

                if isinstance(e, RowDeadlineExceeded):
                    raise
                n_failed += 1
                page_texts.append("")
        else:
            items = sorted(page["items"], key=lambda it: (it[1], it[0]))
            page_texts.append(" ".join(it[2] for it in items))
    if strict and n_failed:
        raise OcrStrictError(f"{n_failed} of {len(pages)} pages failed OCR")
    doc = "\n\n".join(page_texts)
    lead = len(doc) - len(doc.lstrip())
    doc = doc.strip()
    spans: list[dict] = []
    pos = -lead
    for i, t in enumerate(page_texts):
        if i > 0:
            pos += 2  # "\n\n" joiner
        start = max(0, pos)
        end = min(len(doc), pos + len(t))
        if end > start:
            spans.append({"page": i, "start": start, "end": end, "kind": "ocr"})
        pos += len(t)
    confidence = (sum(confs) / len(confs)) if confs else None
    return doc, spans, len(pages), n_failed, confidence
