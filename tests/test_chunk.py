"""Context-window chunking (stages/chunk.py): boundary arithmetic at every
edge case, coverage/overlap invariants, determinism, guards."""

import pytest

from janet_ray.stages.chunk import chunk_documents, chunk_plan


def _chunks(rows, window, stride):
    import ray

    df = chunk_documents(ray.data.from_items(rows), window=window,
                         stride=stride).to_pandas()
    return sorted(
        df.itertuples(index=False),
        key=lambda r: (r.doc_id, r.chunk_id))


def test_plan_arithmetic():
    assert chunk_plan(0, 10, 5) == 0
    assert chunk_plan(1, 10, 5) == 1
    assert chunk_plan(10, 10, 5) == 1      # exactly one window
    assert chunk_plan(11, 10, 5) == 2      # first window reaching the end
    assert chunk_plan(15, 10, 5) == 2
    assert chunk_plan(16, 10, 5) == 3
    assert chunk_plan(100, 10, 10) == 10   # disjoint windows


def test_chunks_cover_and_overlap(ray_session):
    text = " ".join(f"t{i}" for i in range(23))
    out = _chunks([{"doc_id": 1, "text": text}], window=10, stride=7)
    # n=23 → n_chunks = (23-10+6)//7 + 1 = 3
    assert [(r.start_tok, r.end_tok) for r in out] == [(0, 10), (7, 17),
                                                       (14, 23)]
    # every token covered; consecutive chunks overlap by window - stride
    assert out[0].chunk_text.split()[7:] == out[1].chunk_text.split()[:3]
    assert out[-1].end_tok == 23
    assert out[0].chunk_text == " ".join(f"t{i}" for i in range(10))


def test_short_and_empty_docs(ray_session):
    rows = [{"doc_id": 1, "text": "a b c"},
            {"doc_id": 2, "text": "   "},
            {"doc_id": 3, "text": ""}]
    out = _chunks(rows, window=10, stride=5)
    assert len(out) == 1  # whitespace-only and empty docs emit nothing
    r = out[0]
    assert (r.doc_id, r.chunk_id, r.start_tok, r.end_tok,
            r.n_chunk_tokens, r.chunk_text) == (1, 0, 0, 3, 3, "a b c")


def test_stride_guard():
    import ray

    with pytest.raises(ValueError, match="stride"):
        chunk_documents(ray.data.from_items([{"doc_id": 1, "text": "x"}]),
                        window=5, stride=6)


def test_repartition_invariance(ray_session):
    import ray

    rows = [{"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(i))}
            for i in range(40)]
    a = _chunks(rows, window=8, stride=6)
    import pandas as pd

    b = (chunk_documents(ray.data.from_items(rows).repartition(11),
                         window=8, stride=6).to_pandas())
    b = sorted(b.itertuples(index=False),
               key=lambda r: (r.doc_id, r.chunk_id))
    assert a == b
