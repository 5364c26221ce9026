"""S11 — the searchable-artifact sink format (SURVEY.md §2.1 S11).

The reference's OCR service emits a "searchable PDF": each page is the raster
image with an INVISIBLE text layer laid on top — per word, positioned at the
word's bounding box with ``fontSize = max(0.8 * height, 8)``
(apps/ocr/src/lib/ocr-utils.ts:279-336, font rule :253; legacy variant
apps/legacy/src/services/ocr.ts:12-31).

This module is the artifact WRITER for our engine: a deterministic binary
container (``JTXL``) carrying, per page, the raster payload plus the
positioned word records — byte-golden-testable, and parseable back for the
round-trip invariant. A production build would swap this serializer for a real
PDF writer (pdf-lib in the reference) behind the same (pages, boxes) → bytes
signature; the Ray-side plumbing (actor stage, schema, batching) is identical.

Layout (little-endian):

    magic    b"JTXL1\\n"
    u32      n_pages
    per page:
      u32 width, u32 height        raster dimensions in px (0x0 for text pages)
      u32 raster_len + bytes       packed 1-bit bitmap (jpdf SC payload); empty
                                   for native-text pages (no raster to underlay)
      u32 n_words
      per word:
        i32 x0, y0, x1, y1         glyph-grid bounding box, px
        f32 font_size              max(0.8·h, 8) — the reference's rule
        u16 text_len + utf-8 bytes
"""

from __future__ import annotations

import struct

MAGIC = b"JTXL1\n"


class TextLayerError(ValueError):
    """Malformed artifact (truncated/bad magic) — error-as-data at the stage."""


def build_searchable_artifact(pages: list[dict], boxes: list[list[dict]]) -> bytes:
    """Serialize (parsed jpdf pages, per-page word boxes from
    ocr.ocr_word_boxes) into one artifact blob."""
    if len(pages) != len(boxes):
        raise ValueError(f"pages/boxes length mismatch: {len(pages)} != {len(boxes)}")
    parts = [MAGIC, struct.pack("<I", len(pages))]
    for page, words in zip(pages, boxes):
        if page["kind"] == "scan":
            raster = page["packed"]
            w, h = page["width"], page["height"]
        else:  # native text page: no raster underlay
            raster, w, h = b"", 0, 0
        parts.append(struct.pack("<III", w, h, len(raster)))
        parts.append(raster)
        parts.append(struct.pack("<I", len(words)))
        for wb in words:
            data = wb["text"].encode("utf-8")
            parts.append(struct.pack(
                "<iiiifH", int(wb["x0"]), int(wb["y0"]), int(wb["x1"]),
                int(wb["y1"]), float(wb["font_size"]), len(data)))
            parts.append(data)
    return b"".join(parts)


def parse_searchable_artifact(data: bytes) -> list[dict]:
    """Inverse of build_searchable_artifact — for round-trip tests and
    downstream consumers. Returns per page:
    {"width", "height", "raster": bytes, "words": [{"x0","y0","x1","y1",
    "font_size","text"}, ...]}."""
    if not data.startswith(MAGIC):
        raise TextLayerError("bad magic")
    pos = len(MAGIC)

    def need(k: int):
        nonlocal pos
        if pos + k > len(data):
            raise TextLayerError(f"truncated at {pos}+{k}")
        out = data[pos:pos + k]
        pos += k
        return out

    (n_pages,) = struct.unpack("<I", need(4))
    pages = []
    for _ in range(n_pages):
        w, h, raster_len = struct.unpack("<III", need(12))
        raster = need(raster_len)
        (n_words,) = struct.unpack("<I", need(4))
        words = []
        for _ in range(n_words):
            x0, y0, x1, y1, fs, tl = struct.unpack("<iiiifH", need(22))
            words.append({"x0": x0, "y0": y0, "x1": x1, "y1": y1,
                          "font_size": fs, "text": need(tl).decode("utf-8")})
        pages.append({"width": w, "height": h, "raster": raster, "words": words})
    if pos != len(data):
        raise TextLayerError(f"{len(data) - pos} trailing bytes")
    return pages
