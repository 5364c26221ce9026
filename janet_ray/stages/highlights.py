"""A4/O4 — char→span-index map and highlight geometry (SURVEY.md §2.5/§2.6).

Reproduces the reference's text→source-geometry projection — the half of the
search plugin round 1 left unconnected:

  * char-index map: every character of a page's full text maps back to its
    source span ``{char, charIndexInSpan, spanIndex}``
    (apps/search/src/Highlights.tsx:273-294);
  * per-match grouping of matched chars by spanIndex (Highlights.tsx:199-207);
  * the single-whitespace-run drop ("Ignore the space between words",
    Highlights.tsx:209-211) and the wholeWords per-run ``slice(1,-1)`` trim
    (Highlights.tsx:212) — the trim is applied PER SPAN-RUN exactly as the
    reference does (a quirk: it is only lossless when the whole match lies in
    one span; replicated bug-compatibly and documented in tests);
  * %-of-page geometry: left/top/width/height as 100·px/pageDim
    (Highlights.tsx:136-139);
  * the (top, left) position sort (Highlights.tsx:44-60, applied at :228).

Layout model (the deterministic glyph grid of formats/jpdf.py): a page is the
document text line-wrapped at ``WRAP_COLS`` columns; char i sits at line
``i // WRAP_COLS``, col ``i % WRAP_COLS`` and occupies
x ∈ [col·CELL_W, col·CELL_W + GLYPH_W), y ∈ [line·CELL_H, line·CELL_H + GLYPH_H).
Spans are the PDF.js-text-layer analogue: maximal same-kind (space vs
non-space) char runs, additionally split at line starts — absolutely
positioned text-layer spans never wrap.

Because the grid is deterministic, the geometry has an ARITHMETIC SQL oracle:
for a literal case-sensitive keyword the space positions inside any matched
substring equal the keyword's own space positions, so the span-run structure
relative to the match start is a compile-time constant. ``highlights_sql``
renders that oracle from the SAME constants this module computes with (parity
by construction, like textstats). Overlapping self-matches would diverge
(regex finditer is non-overlapping, the SQL position scan is not) — callers
must use keywords with no proper border (prefix == suffix), asserted in
``highlights_sql``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from janet_ray.formats.jpdf import CELL_H, CELL_W, GLYPH_H, GLYPH_W
from janet_ray.stages.search import NormalizedKeyword, normalize_keyword

WRAP_COLS = 40  # page width in glyph cells for the wrapped-text layout model


def char_span_indexes(text: str, wrap_cols: int = WRAP_COLS) -> np.ndarray:
    """The charIndexes map (Highlights.tsx:273-294) for the wrapped glyph grid:
    span index per character. A new span starts at a space↔non-space boundary
    or at a line start."""
    n = len(text)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    codes = np.fromiter((1 if c.isspace() else 0 for c in text), dtype=np.int8, count=n)
    boundary = np.ones(n, dtype=bool)
    boundary[1:] = codes[1:] != codes[:-1]
    boundary[np.arange(0, n, wrap_cols)] = True
    return np.cumsum(boundary) - 1


def match_highlight_rects(
    text: str,
    kw: NormalizedKeyword,
    wrap_cols: int = WRAP_COLS,
) -> list[dict]:
    """All highlight rects for one document page, sorted by (top, left) —
    the output of Highlights.tsx `highlightAll` for our layout model."""
    if not text:
        return []
    span_idx = char_span_indexes(text, wrap_cols)
    page_w = wrap_cols * CELL_W
    n_lines = max(1, -(-len(text) // wrap_cols))
    page_h = n_lines * CELL_H
    rects: list[dict] = []
    for m in kw.regexp.finditer(text):
        start, end = m.start(), m.end()
        if end <= start:
            continue
        # group the match's chars by spanIndex (Highlights.tsx:199-207)
        runs: list[tuple[int, int]] = []
        run_start = start
        for i in range(start + 1, end):
            if span_idx[i] != span_idx[i - 1]:
                runs.append((run_start, i))
                run_start = i
        runs.append((run_start, end))
        for s, e in runs:
            # "Ignore the space between words" (Highlights.tsx:209-211)
            if e - s == 1 and text[s].isspace():
                continue
            if kw.whole_words:  # per-run slice(1,-1) (Highlights.tsx:212)
                s, e = s + 1, e - 1
                if e <= s:
                    continue
            line = s // wrap_cols  # runs never cross lines by construction
            col0, col1 = s - line * wrap_cols, (e - 1) - line * wrap_cols
            x0 = col0 * CELL_W
            x1 = col1 * CELL_W + GLYPH_W
            y0 = line * CELL_H
            y1 = y0 + GLYPH_H
            rects.append({
                "x0": x0, "y0": y0, "x1": x1, "y1": y1,
                "left_pct": (100.0 * x0) / page_w,
                "top_pct": (100.0 * y0) / page_h,
                "width_pct": (100.0 * (x1 - x0)) / page_w,
                "height_pct": (100.0 * (y1 - y0)) / page_h,
                "page_w": page_w, "page_h": page_h,
            })
    rects.sort(key=lambda r: (r["y0"], r["x0"]))  # sortHighlightPosition :44-60
    for rank, r in enumerate(rects, 1):
        r["hl_rank"] = rank
    return rects


def search_highlights(
    ds,
    keyword: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    match_case: bool = True,
    whole_words: bool = False,
    wrap_cols: int = WRAP_COLS,
):
    """Distributed highlight geometry: one output row per highlight rect.
    Stateless map_batches — regex compiled once per task via closure."""
    kw = normalize_keyword(keyword, match_case=match_case, whole_words=whole_words)

    def f(batch: pa.Table) -> pa.Table:
        ids, ranks = [], []
        x0s, y0s, x1s, y1s = [], [], [], []
        lp, tp, wp, hp, pws, phs = [], [], [], [], [], []
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for r in match_highlight_rects(text or "", kw, wrap_cols):
                ids.append(did); ranks.append(r["hl_rank"])
                x0s.append(r["x0"]); y0s.append(r["y0"])
                x1s.append(r["x1"]); y1s.append(r["y1"])
                lp.append(r["left_pct"]); tp.append(r["top_pct"])
                wp.append(r["width_pct"]); hp.append(r["height_pct"])
                pws.append(r["page_w"]); phs.append(r["page_h"])
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "hl_rank": pa.array(ranks, pa.int64()),
            "x0": pa.array(x0s, pa.int64()), "y0": pa.array(y0s, pa.int64()),
            "x1": pa.array(x1s, pa.int64()), "y1": pa.array(y1s, pa.int64()),
            "left_pct": pa.array(lp, pa.float64()),
            "top_pct": pa.array(tp, pa.float64()),
            "width_pct": pa.array(wp, pa.float64()),
            "height_pct": pa.array(hp, pa.float64()),
            "page_w": pa.array(pws, pa.int64()),
            "page_h": pa.array(phs, pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _keyword_runs(keyword: str) -> list[tuple[int, int]]:
    """Non-space char runs of a literal keyword — the span-run structure of any
    case-sensitive match, relative to the match start."""
    runs, start = [], None
    for i, c in enumerate(keyword):
        if c.isspace():
            if start is not None:
                runs.append((start, i))
                start = None
        elif start is None:
            start = i
    if start is not None:
        runs.append((start, len(keyword)))
    return runs


def highlights_sql(keyword: str, *, table: str = "documents",
                   text_col: str = "text", id_col: str = "doc_id",
                   wrap_cols: int = WRAP_COLS) -> str:
    """Arithmetic DuckDB oracle for search_highlights(match_case=True,
    whole_words=False), generated from the same grid constants."""
    # A keyword with a proper border (prefix == suffix) could self-overlap, and
    # the SQL position scan (unlike regex finditer) would count the overlap.
    for blen in range(1, len(keyword)):
        if keyword[:blen] == keyword[-blen:]:
            raise ValueError(f"keyword {keyword!r} can self-overlap (border len {blen})")
    if "'" in keyword:
        raise ValueError("keyword must not contain single quotes")
    if "  " in keyword or "\n" in keyword or "\t" in keyword:
        # A multi-char whitespace run survives the single-whitespace-run drop
        # (it would be a highlighted rect) but this generator only renders the
        # non-space runs — keep the two sides honest by rejecting the input.
        raise ValueError("oracle supports single-space-separated keywords only")
    runs = _keyword_runs(keyword)
    if not runs:
        raise ValueError("keyword has no non-space characters")
    values = ", ".join(f"({a}, {b})" for a, b in runs)
    klen = len(keyword)
    page_w = wrap_cols * CELL_W
    return f"""
WITH occ AS (
  SELECT d.{id_col} AS doc_id, p.p AS start, length(d.{text_col}) AS n
  FROM {table} d,
       LATERAL (SELECT unnest(range(0, greatest(length(d.{text_col}) - {klen - 1}, 0))) AS p) p
  WHERE substr(d.{text_col}, CAST(p.p AS INTEGER) + 1, {klen}) = '{keyword}'
), runs AS (
  SELECT * FROM (VALUES {values}) r(a, b)
), pieces AS (
  SELECT o.doc_id, o.n, l.L,
         greatest(o.start + r.a, l.L * {wrap_cols}) AS s,
         least(o.start + r.b, (l.L + 1) * {wrap_cols}) AS e
  FROM occ o CROSS JOIN runs r,
       LATERAL (SELECT unnest(range((o.start + r.a) // {wrap_cols},
                                    (o.start + r.b - 1) // {wrap_cols} + 1)) AS L) l
), rects AS (
  SELECT doc_id,
         CAST((s - L * {wrap_cols}) * {CELL_W} AS BIGINT) AS x0,
         CAST(L * {CELL_H} AS BIGINT) AS y0,
         CAST((e - 1 - L * {wrap_cols}) * {CELL_W} + {GLYPH_W} AS BIGINT) AS x1,
         CAST(L * {CELL_H} + {GLYPH_H} AS BIGINT) AS y1,
         CAST({page_w} AS BIGINT) AS page_w,
         CAST({CELL_H} * ((n + {wrap_cols - 1}) // {wrap_cols}) AS BIGINT) AS page_h
  FROM pieces
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY y0, x0) AS BIGINT) AS hl_rank,
       x0, y0, x1, y1,
       (100.0 * x0) / page_w AS left_pct,
       (100.0 * y0) / page_h AS top_pct,
       (100.0 * (x1 - x0)) / page_w AS width_pct,
       (100.0 * (y1 - y0)) / page_h AS height_pct,
       page_w, page_h
FROM rects
"""


# ------------------------------------------------------------ OCR-route rects

def page_match_rects(page_text: str, kw: NormalizedKeyword) -> list[dict]:
    """Highlight rects for one decoded OCR page (glyph grid, lines separated by
    '\\n') — connects match spans to the same geometry ocr.word_boxes_page
    emits. Newlines are whitespace: a run that is a lone separator is dropped
    by the same single-whitespace-run rule."""
    rects: list[dict] = []
    # char index -> (line, col); newline chars get col = -1 (never highlighted
    # alone: a '\n' is a single-whitespace run)
    line_of = np.empty(len(page_text), dtype=np.int64)
    col_of = np.empty(len(page_text), dtype=np.int64)
    li = col = 0
    for i, c in enumerate(page_text):
        if c == "\n":
            line_of[i], col_of[i] = li, -1
            li += 1
            col = 0
        else:
            line_of[i], col_of[i] = li, col
            col += 1
    for m in kw.regexp.finditer(page_text):
        start, end = m.start(), m.end()
        runs: list[tuple[int, int]] = []
        run_start = start
        for i in range(start + 1, end):
            # span boundary: kind change or line change
            if (page_text[i].isspace() != page_text[i - 1].isspace()
                    or line_of[i] != line_of[i - 1]):
                runs.append((run_start, i))
                run_start = i
        runs.append((run_start, end))
        for s, e in runs:
            if e - s == 1 and page_text[s].isspace():
                continue
            if kw.whole_words:
                s, e = s + 1, e - 1
                if e <= s:
                    continue
            rects.append({
                "x0": int(col_of[s]) * CELL_W,
                "y0": int(line_of[s]) * CELL_H,
                "x1": int(col_of[e - 1]) * CELL_W + GLYPH_W,
                "y1": int(line_of[s]) * CELL_H + GLYPH_H,
            })
    rects.sort(key=lambda r: (r["y0"], r["x0"]))
    return rects
