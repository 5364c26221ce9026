"""Paragraph-level dedup (stages/paradedup.py): first-occurrence rule,
round-trip of unique corpora, empty-paragraph handling, and equality of
the broadcast and cogroup (union) apply paths."""

import pyarrow as pa

from janet_ray.stages.paradedup import paragraph_dedup


def _run(ray, rows, **kw):
    ds = ray.data.from_items(rows)
    out = paragraph_dedup(ds, **kw).to_pandas()
    return {r.doc_id: (r.text, r.n_dropped) for r in out.itertuples()}


def _reference(rows, sep="\n"):
    seen = set()
    out = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        paras = r["text"].split(sep)
        kept = []
        dropped = 0
        for p in paras:
            if p in seen:
                dropped += 1
            else:
                seen.add(p)
                kept.append(p)
        out[r["doc_id"]] = (sep.join(kept), dropped)
    return out


ROWS = [
    {"doc_id": 1, "text": "alpha\nshared one\nbeta"},
    {"doc_id": 2, "text": "shared one\ngamma\nshared two"},
    {"doc_id": 3, "text": "shared two\nshared one\ndelta"},
    {"doc_id": 4, "text": "unique only"},
]


def test_first_occurrence_rule(ray_session):
    import ray

    got = _run(ray, ROWS)
    assert got == _reference(ROWS)
    # doc 1 keeps everything; docs 2/3 lose the shared paragraphs
    assert got[1] == ("alpha\nshared one\nbeta", 0)
    assert got[2] == ("gamma\nshared two", 1)
    assert got[3] == ("delta", 2)
    assert got[4] == ("unique only", 0)


def test_within_doc_duplicates(ray_session):
    import ray

    rows = [{"doc_id": 7, "text": "x\nx\ny"}]
    got = _run(ray, rows)
    assert got[7] == ("x\ny", 1)


def test_all_dropped_yields_empty(ray_session):
    import ray

    rows = [{"doc_id": 1, "text": "p"}, {"doc_id": 2, "text": "p"}]
    got = _run(ray, rows)
    assert got[2] == ("", 1)


def test_union_path_matches_broadcast_path(ray_session):
    import ray

    got_b = _run(ray, ROWS)
    got_u = _run(ray, ROWS, broadcast_limit=0)  # force the cogroup path
    assert got_b == got_u


def test_empty_paragraphs_are_paragraphs(ray_session):
    import ray

    # '\n\n' produces an empty paragraph; its first occurrence is kept,
    # later empties are dropped like any duplicate
    rows = [{"doc_id": 1, "text": "a\n\nb"}, {"doc_id": 2, "text": "c\n\nd"}]
    got = _run(ray, rows)
    assert got[1] == ("a\n\nb", 0)
    assert got[2] == ("c\nd", 1)


def test_union_path_string_ids(ray_session):
    import ray

    # the cogroup path must support non-integer ids like the broadcast path
    rows = [{"doc_id": "u-a", "text": "p\nq"}, {"doc_id": "u-b", "text": "p\nr"}]
    got_b = paragraph_dedup(ray.data.from_items(rows)).to_pandas()
    got_u = paragraph_dedup(ray.data.from_items(rows),
                            broadcast_limit=0).to_pandas()
    b = {r.doc_id: (r.text, r.n_dropped) for r in got_b.itertuples()}
    u = {r.doc_id: (r.text, r.n_dropped) for r in got_u.itertuples()}
    assert b == u
    assert b["u-a"] == ("p\nq", 0) and b["u-b"] == ("r", 1)


def test_empty_group_blocks_typed_from_part_schema():
    """Empty key-range groups must emit doc_id typed like the incoming part
    (ADVICE r03): an int64-pinned empty block on a string-id corpus mixes
    output schemas and breaks downstream concat."""
    import pyarrow as pa

    from janet_ray.stages.paradedup import _drop_rows

    str_part = pa.table({"part": pa.array([], pa.int32()),
                         "h": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.string()),
                         "idx": pa.array([], pa.int64())})
    out = _drop_rows(str_part)
    assert out.num_rows == 0
    assert out["doc_id"].type == pa.string()
    # schema-less empty block (no doc_id at all) falls back to int64
    out = _drop_rows(pa.table({}))
    assert out["doc_id"].type == pa.int64()
