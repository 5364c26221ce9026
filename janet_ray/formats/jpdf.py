"""jpdf — the constrained synthetic scanned-document container format.

The sandbox has no pdfium/poppler/tesseract (SURVEY.md §7.0), so the "PDF path" of
the engine parses this deterministic container instead. It reproduces the *shape* of
the reference's PDF handling (per-page text items with coordinates for the native
text layer — cf. pdf.js ``getTextContent().items`` used at
``apps/legacy/src/services/pdf.ts:146-171`` — and per-page raster images for the OCR
path — cf. ``apps/ocr/src/lib/ocr-utils.ts:162-180``), while being parseable and
OCR-able with pure numpy.

Layout (little-endian):

    magic   b"%PDF-1.7\\n%JRAY\\n"              (starts with %PDF- for the router's sniffer)
    pages   repeated records, one of:
              b"PG" u32 n_items  then per item: u16 x, u16 y, u16 nbytes, utf-8 bytes
              b"SC" u16 width u16 height        then ceil(width/8)*height bitmap bytes
                                                (rows bit-packed MSB-first, np.packbits)
    trailer b"%%EOF"

Glyph font: every character in CHARSET maps to a deterministic 5x7 bit pattern
derived from blake2b(char) — a *fake* font (the mandate allows a deterministic fake
OCR engine; the real engine would wrap pdfium+Tesseract behind the same interface).
A raster page is lines of <=LINE_WIDTH glyph cells (6px wide = 5 + 1 spacing, 8px
tall = 7 + 1 spacing). Space is the all-zero cell; trailing pad cells decode to
spaces and are stripped per line, so decode(raster(wrap(text))) == wrap(text).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"%PDF-1.7\n%JRAY\n"
TRAILER = b"%%EOF"
LINE_WIDTH = 40  # glyph cells per raster line
CELL_W, CELL_H = 6, 8  # glyph cell incl. 1px spacing
GLYPH_W, GLYPH_H = 5, 7

CHARSET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "0123456789"
    ".,:;-/()&$'#%!?\"+*=@_<>[]"
)


class JPdfError(ValueError):
    """Malformed container — surfaced as an error-as-data row, never an exception
    escaping a batch (reference precedent: apps/legacy/src/services/ocr.ts:79-84)."""


def _glyph_bits(ch: str) -> np.ndarray:
    """Deterministic 7x5 bool pattern for a character (space = all zeros)."""
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    digest = hashlib.blake2b(ch.encode("utf-8"), digest_size=5).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    pat = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    if not pat.any():  # must be distinguishable from space
        pat[0, 0] = True
    return pat


def _build_font() -> tuple[dict[str, np.ndarray], dict[bytes, str]]:
    font: dict[str, np.ndarray] = {}
    rev: dict[bytes, str] = {}
    for ch in " " + CHARSET:
        pat = _glyph_bits(ch)
        key = np.packbits(pat.flatten()).tobytes()
        if key in rev:  # pragma: no cover - guarded at import
            raise RuntimeError(f"glyph collision: {ch!r} vs {rev[key]!r}")
        font[ch] = pat
        rev[key] = ch
    return font, rev


FONT, FONT_REVERSE = _build_font()
_SPACE_KEY = np.packbits(np.zeros(GLYPH_H * GLYPH_W, dtype=bool)).tobytes()


def _build_lookup() -> tuple[np.ndarray, np.ndarray]:
    """Vectorized reverse-font lookup tables: 5-byte glyph keys packed into
    sorted uint64s + parallel char codes (decode = one searchsorted per page
    instead of one dict get per cell)."""
    items = sorted(
        (int.from_bytes(k, "big"), ord(ch)) for k, ch in FONT_REVERSE.items()
    )
    keys = np.array([k for k, _ in items], dtype=np.uint64)
    codes = np.array([c for _, c in items], dtype=np.uint32)
    return keys, codes


_LOOKUP_KEYS, _LOOKUP_CODES = _build_lookup()


def _build_raster_lookup() -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized forward-font tables: sorted char codes, stacked glyph
    patterns (N, GLYPH_H, GLYPH_W), and the index of the '?' fallback."""
    items = sorted((ord(ch), pat) for ch, pat in FONT.items())
    codes = np.array([c for c, _ in items], dtype=np.uint32)
    glyphs = np.stack([p for _, p in items])
    qm = int(np.searchsorted(codes, ord("?")))
    return codes, glyphs, qm


_RASTER_CODES, _RASTER_GLYPHS, _RASTER_QM = _build_raster_lookup()


def wrap_text(text: str, width: int = LINE_WIDTH) -> list[str]:
    """Greedy word-wrap used by the raster layout (and therefore by the OCR golden:
    the decoded text of a scanned page is exactly '\\n'.join(wrap_text(page_text)))."""
    lines: list[str] = []
    for para in text.split("\n"):
        words = para.split(" ")
        cur = ""
        for w in words:
            while len(w) > width:  # hard-split overlong tokens
                if cur:
                    lines.append(cur)
                    cur = ""
                lines.append(w[:width])
                w = w[width:]
            if not cur:
                cur = w
            elif len(cur) + 1 + len(w) <= width:
                cur = cur + " " + w
            else:
                lines.append(cur)
                cur = w
        lines.append(cur)
    return [ln.rstrip() for ln in lines]


def raster_page(text: str) -> tuple[bytes, int, int]:
    """Render page text to a packed 1-bit bitmap. Returns (packed_bytes, width,
    height). Vectorized per line: char codes → glyph indices (one searchsorted)
    → stacked gather → one contiguous block write."""
    lines = wrap_text(text)
    width = LINE_WIDTH * CELL_W
    height = len(lines) * CELL_H
    bitmap = np.zeros((height, width), dtype=bool)
    for r, line in enumerate(lines):
        line = line[:LINE_WIDTH]
        if not line:
            continue
        codes = np.frombuffer(line.encode("utf-32-le"), dtype="<u4")
        idx = np.searchsorted(_RASTER_CODES, codes).clip(0, len(_RASTER_CODES) - 1)
        idx = np.where(_RASTER_CODES[idx] == codes, idx, _RASTER_QM)
        glyphs = _RASTER_GLYPHS[idx]  # (L, GLYPH_H, GLYPH_W)
        n = len(codes)
        tile = np.zeros((GLYPH_H, n, CELL_W), dtype=bool)
        tile[:, :, :GLYPH_W] = glyphs.transpose(1, 0, 2)
        bitmap[r * CELL_H:r * CELL_H + GLYPH_H, :n * CELL_W] = (
            tile.reshape(GLYPH_H, n * CELL_W))
    packed = np.packbits(bitmap, axis=1).tobytes()
    return packed, width, height


def decode_bitmap_stats(packed: bytes, width: int, height: int) -> tuple[str, int, int]:
    """Invert raster_page with recognition stats: (text, n_glyph_cells,
    n_unknown). Fully vectorized cell extraction (the hot kernel of the OCR
    engine): reshape to (lines, cells, 7, 5) glyph blocks, pack each to a
    40-bit key, look up in the reverse font table.

    ``n_glyph_cells`` counts non-blank cells; ``n_unknown`` counts those whose
    key is not in the font table (decoded as '?') — the basis of the per-page
    OCR confidence (A5, apps/legacy/src/services/ocr.ts:58)."""
    row_bytes = (width + 7) // 8
    if len(packed) != row_bytes * height:
        raise JPdfError(
            f"bitmap size mismatch: {len(packed)} != {row_bytes}*{height}"
        )
    bits = np.unpackbits(
        np.frombuffer(packed, dtype=np.uint8).reshape(height, row_bytes), axis=1
    )[:, :width].astype(bool)
    n_lines = height // CELL_H
    n_cols = width // CELL_W
    # (lines, CELL_H, cols, CELL_W) → take the glyph area → (lines, cols, 7*5)
    cells = (
        bits[: n_lines * CELL_H, : n_cols * CELL_W]
        .reshape(n_lines, CELL_H, n_cols, CELL_W)[:, :GLYPH_H, :, :GLYPH_W]
        .transpose(0, 2, 1, 3)
        .reshape(n_lines, n_cols, GLYPH_H * GLYPH_W)
    )
    keys = np.packbits(cells, axis=2).reshape(-1, 5)  # (lines*cols, 5)
    # fully vectorized reverse-font lookup: pack each 5-byte key into a
    # uint64, binary-search the sorted table, decode misses as '?'
    k64 = (
        (keys[:, 0].astype(np.uint64) << np.uint64(32))
        | (keys[:, 1].astype(np.uint64) << np.uint64(24))
        | (keys[:, 2].astype(np.uint64) << np.uint64(16))
        | (keys[:, 3].astype(np.uint64) << np.uint64(8))
        | keys[:, 4].astype(np.uint64)
    )
    idx = np.searchsorted(_LOOKUP_KEYS, k64).clip(0, len(_LOOKUP_KEYS) - 1)
    found = _LOOKUP_KEYS[idx] == k64
    codes = np.where(found, _LOOKUP_CODES[idx], np.uint32(ord("?")))
    n_glyphs = int((k64 != 0).sum())  # blank (space) cell key is all-zero
    n_unknown = int((~found).sum())  # space IS in the table → never unknown
    text = codes.astype("<u4").tobytes().decode("utf-32-le")
    out_lines = [text[r * n_cols:(r + 1) * n_cols].rstrip()
                 for r in range(n_lines)]
    return "\n".join(out_lines), n_glyphs, n_unknown


def decode_bitmap(packed: bytes, width: int, height: int) -> str:
    """Invert raster_page: packed bitmap → text (stats discarded)."""
    return decode_bitmap_stats(packed, width, height)[0]


# ---------------------------------------------------------------- container I/O


def encode(pages: list[dict]) -> bytes:
    """Encode a document. Each page is {"items": [(x, y, text), ...]} (text layer)
    or {"scan": page_text} (rasterised — no text layer)."""
    parts = [MAGIC]
    for page in pages:
        if "items" in page:
            items = page["items"]
            parts.append(b"PG" + struct.pack("<I", len(items)))
            for x, y, txt in items:
                data = txt.encode("utf-8")
                parts.append(struct.pack("<HHH", x, y, len(data)) + data)
        elif "scan" in page:
            packed, w, h = raster_page(page["scan"])
            parts.append(b"SC" + struct.pack("<HH", w, h) + packed)
        else:  # pragma: no cover
            raise ValueError("page needs 'items' or 'scan'")
    parts.append(TRAILER)
    return b"".join(parts)


def parse(payload: bytes) -> list[dict]:
    """Parse container → list of pages:
    {"kind": "text", "items": [(x, y, str), ...]} or
    {"kind": "scan", "packed": bytes, "width": int, "height": int}.
    Raises JPdfError on malformed input (truncated records / missing trailer)."""
    if not payload.startswith(MAGIC):
        raise JPdfError("bad magic")
    pos = len(MAGIC)
    n = len(payload)
    pages: list[dict] = []
    while True:
        if pos + 2 > n:
            raise JPdfError("truncated: no trailer")
        tag = payload[pos : pos + 2]
        if tag == b"%%":
            if payload[pos : pos + 5] != TRAILER:
                raise JPdfError("bad trailer")
            break
        pos += 2
        if tag == b"PG":
            if pos + 4 > n:
                raise JPdfError("truncated PG header")
            (n_items,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            items = []
            for _ in range(n_items):
                if pos + 6 > n:
                    raise JPdfError("truncated item header")
                x, y, ln = struct.unpack_from("<HHH", payload, pos)
                pos += 6
                if pos + ln > n:
                    raise JPdfError("truncated item text")
                items.append((x, y, payload[pos : pos + ln].decode("utf-8")))
                pos += ln
            pages.append({"kind": "text", "items": items})
        elif tag == b"SC":
            if pos + 4 > n:
                raise JPdfError("truncated SC header")
            w, h = struct.unpack_from("<HH", payload, pos)
            pos += 4
            nbytes = ((w + 7) // 8) * h
            if pos + nbytes > n:
                raise JPdfError("truncated bitmap")
            pages.append(
                {
                    "kind": "scan",
                    "packed": payload[pos : pos + nbytes],
                    "width": w,
                    "height": h,
                }
            )
            pos += nbytes
        else:
            raise JPdfError(f"unknown page tag {tag!r}")
    return pages


def page_count(payload: bytes) -> int:
    """Header probe, analogue of the reference's `pdfinfo` page-count probe
    (apps/ocr/src/lib/ocr-utils.ts:46-58)."""
    return len(parse(payload))
