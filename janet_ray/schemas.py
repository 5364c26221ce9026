"""Arrow schemas (SURVEY.md §1.4 Ray Data / Arrow mapping).

Input (authoritative shape, BASELINE.json input_hint):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Extracted output (the analogue of the reference's ProcessResult/RenameMapping row,
apps/legacy/src/services/fileProcessor.ts:9-16 + types.ts:1-8, widened with spans and
route per SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        pa.field("page", pa.int32()),
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("kind", pa.string()),
    ]
)

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("filename", pa.string()),
        pa.field("text", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("route", pa.string()),
        pa.field("success", pa.bool_()),
        pa.field("error", pa.string()),
        pa.field("n_pages", pa.int32()),
        pa.field("n_chars", pa.int64()),
        # A2/A5: per-page failure count + mean OCR confidence (null for
        # non-OCR routes) — ocr-controller.ts:120-131, ocr.ts:58
        pa.field("n_failed_pages", pa.int32()),
        pa.field("ocr_confidence", pa.float64()),
    ]
)
