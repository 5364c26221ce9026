"""Mirrors SURVEY.md §5 layer 1+2: native-vs-OCR routing on content emptiness and
golden substring assertions for the Travelers anchor (pdf.test.ts:118-159 analogue)."""

import pytest

from janet_ray.formats import jpdf
from janet_ray.stages import ocr as ocr_mod
from janet_ray.stages.pdf_extract import extract_pdf_text
from janet_ray.synth import _TRAVELERS_PAGES


def test_text_layer_join_semantics():
    # items join with ' ' in (y, x) order; pages join with '\n'; doc stripped
    doc = jpdf.encode(
        [
            {"items": [(50, 10, "world"), (10, 10, "hello"), (10, 30, "below")]},
            {"items": [(0, 0, "page two")]},
        ]
    )
    text, spans, n_pages = extract_pdf_text(doc)
    assert text == "hello world below\npage two"
    assert n_pages == 2
    assert spans == [
        {"page": 0, "start": 0, "end": 17, "kind": "page"},
        {"page": 1, "start": 18, "end": 26, "kind": "page"},
    ]


def test_empty_text_layer_signals_ocr():
    doc = jpdf.encode([{"scan": "only raster"}])
    text, spans, n_pages = extract_pdf_text(doc)
    assert text is None and spans == [] and n_pages == 1


def test_blank_items_signal_ocr():
    doc = jpdf.encode([{"items": [(0, 0, " "), (5, 5, "")]}])
    text, _, _ = extract_pdf_text(doc)
    assert text is None


def test_ocr_document_pages_join_with_blank_line():
    engine = ocr_mod.GlyphGridEngine()
    pages = jpdf.parse(jpdf.encode([{"scan": "page one text"}, {"scan": "page two text"}]))
    text, spans, n = ocr_mod.ocr_document(pages, engine)
    assert text == "page one text\n\npage two text"
    assert [s["kind"] for s in spans] == ["ocr", "ocr"]
    assert n == 2


def test_ocr_mixed_pages_keep_order():
    engine = ocr_mod.GlyphGridEngine()
    pages = jpdf.parse(
        jpdf.encode([{"scan": "scanned first"}, {"items": [(0, 0, "typed second")]}])
    )
    text, _, _ = ocr_mod.ocr_document(pages, engine)
    assert text == "scanned first\n\ntyped second"


def test_travelers_golden_substrings():
    """The reference's golden-fixture oracle: expected substrings in extracted text
    (pdf.test.ts asserts 'Notice of Cancellation', 'TRAVELERS', policy number,
    date, and page markers)."""
    engine = ocr_mod.GlyphGridEngine()
    doc = jpdf.encode([{"scan": t} for t in _TRAVELERS_PAGES])
    text, spans, n = ocr_mod.ocr_document(jpdf.parse(doc), engine)
    flat = text.replace("\n", " ")
    for needle in ["Notice of Cancellation", "TRAVELERS", "612266004",
                   "FEBRUARY 25, 2024", "Page 1", "Page 2"]:
        assert needle in flat
    assert n == 2


def test_ocr_oracle_fixture_assumptions():
    """The extract_ocr_normalized SQL oracle (queries.py) is exact ONLY under
    two corpus properties (ADVICE r2): every whitespace-delimited token fits in
    one raster line (wrap_text hard-splits overlong tokens, inserting a
    mid-word break the SQL can't reproduce) and every non-whitespace char has a
    FONT glyph (the raster substitutes '?'). Assert both against the LIVE
    driver corpus so a fixture change breaks loudly here, not as a silent
    oracle mismatch."""
    import os

    import pyarrow.parquet as pq

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    col = pq.read_table(path, columns=["text"])["text"]
    for t in col.to_pylist():
        for tok in (t or "").split():
            assert len(tok) <= jpdf.LINE_WIDTH, f"overlong token {tok!r}"
            for ch in tok:
                assert ch in jpdf.FONT, f"char {ch!r} missing from FONT"


def test_tesseract_engine_is_a_documented_stub():
    with pytest.raises(NotImplementedError):
        ocr_mod.TesseractEngine()


def test_word_boxes_geometry():
    """P8: boxes align exactly with the glyph grid of the wrapped raster text."""
    from janet_ray.formats import jpdf
    from janet_ray.stages import ocr as ocr_mod

    text = "hello world this is a scanned page with several words to wrap"
    payload = jpdf.encode([{"scan": text}])
    pages = jpdf.parse(payload)
    engine = ocr_mod.GlyphGridEngine()
    boxes = ocr_mod.ocr_word_boxes(pages, engine)
    assert len(boxes) == 1
    decoded = engine.decode_page(pages[0]["packed"], pages[0]["width"], pages[0]["height"])
    words = decoded.split()
    assert [b["text"] for b in boxes[0]] == words
    lines = decoded.split("\n")
    for b in boxes[0]:
        line_idx = b["y0"] // jpdf.CELL_H
        col = b["x0"] // jpdf.CELL_W
        line = lines[int(line_idx)]
        assert line[int(col):int(col) + len(b["text"])] == b["text"]
        assert b["x1"] > b["x0"] and b["y1"] == b["y0"] + jpdf.GLYPH_H
        assert b["font_size"] == max(0.8 * jpdf.CELL_H, 8.0)


def test_corpus_wrap_preconditions_for_box_oracle():
    """The ocr_word_boxes SQL oracle's recursive wrap fold assumes the
    corpus never exercises wrap_text's hard-split / rstrip / paragraph
    branches: no newlines, no double spaces, every word <= LINE_WIDTH.
    Assert against the LIVE corpora the gate runs on."""
    import os

    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            pytest.skip("driver testdata not present")
        col = pq.read_table(path, columns=["text"])["text"]
        for t in col.to_pylist():
            t = t or ""
            assert "\n" not in t and "  " not in t, sf
            for tok in t.split(" "):
                assert 0 < len(tok) <= jpdf.LINE_WIDTH, (sf, tok)
