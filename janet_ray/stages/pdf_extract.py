"""P2/P7 — native PDF text-layer extraction over the jpdf container.

Mirrors the reference's pdf.js extraction semantics
(apps/legacy/src/services/pdf.ts:146-171: per page
``getTextContent().items.map(i=>i.str).join(' ')``, document trimmed — and the flat
variant apps/ocr/src/lib/pdf-parse.ts:6-27). Pinned here (SURVEY.md §7.4 "byte-identical
text" hard part):

  * items within a page sort by (y, x) — reading order;
  * items join with a single space;
  * pages join with a single "\\n";
  * the final document text is .strip()'d.

Returns ``None`` text when the container has no text layer at all (only scan pages /
only empty PG pages) — the content-emptiness condition that routes the document to the
OCR path (fileProcessor.ts:25,44 de-facto semantics, see stages/router.py).
"""

from __future__ import annotations

from janet_ray.formats import jpdf


def extract_pdf_text(payload: bytes) -> tuple[str | None, list[dict], int]:
    """binary jpdf → (text | None-if-needs-OCR, spans, n_pages).

    Span per page: {page, start, end, kind="page"} with offsets into the final text.
    Raises jpdf.JPdfError on a malformed container (caller turns it into an
    error-as-data row)."""
    pages = jpdf.parse(payload)
    page_texts: list[str] = []
    any_text = False
    for page in pages:
        if page["kind"] == "text" and page["items"]:
            items = sorted(page["items"], key=lambda it: (it[1], it[0]))
            t = " ".join(it[2] for it in items)
            if t.strip():
                any_text = True
            page_texts.append(t)
        else:
            page_texts.append("")
    if not any_text:
        return None, [], len(pages)

    # Build final text + spans in one pass (spans must never be recomputed downstream)
    doc = "\n".join(page_texts)
    lead = len(doc) - len(doc.lstrip())
    doc = doc.strip()
    spans: list[dict] = []
    pos = -lead
    for i, t in enumerate(page_texts):
        if i > 0:
            pos += 1  # "\n" joiner
        start = max(0, pos)
        end = min(len(doc), pos + len(t))
        if end > start:
            spans.append({"page": i, "start": start, "end": end, "kind": "page"})
        pos += len(t)
    return doc, spans, len(pages)
