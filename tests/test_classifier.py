"""Hashed linear classifier (stages/classifier.py): exact-int scoring
parity, threshold semantics, empty-doc handling, custom weights."""

import numpy as np

from janet_ray.stages.classifier import (classify, default_weights,
                                         score_text)


def test_score_text_exact():
    w = default_weights()
    # deterministic: same text always same score; bag-of-words counts dups
    s1 = score_text("alpha beta alpha", w)
    assert s1 == 2 * score_text("alpha", w) + score_text("beta", w)
    assert score_text("", w) == 0
    assert score_text(None, w) == 0


def test_classify_matches_reference(ray_session):
    import ray

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["the quick brown fox", "", "lorem ipsum dolor", "a a a a"])]
    out = (classify(ray.data.from_items(rows)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    w = default_weights()
    for r in rows:
        got = out[out.doc_id == r["doc_id"]].iloc[0]
        want = score_text(r["text"], w)
        assert got["score"] == want
        assert got["label"] == ("keep" if want > 0 else "drop")


def test_custom_weights_and_threshold(ray_session):
    import ray

    w = np.full(64, 1, dtype=np.int64)  # every token scores +1
    rows = [{"doc_id": 1, "text": "one two three"},
            {"doc_id": 2, "text": "one"}]
    out = (classify(ray.data.from_items(rows), weights=w, threshold=2)
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "score"] == 3 and out.loc[1, "label"] == "keep"
    assert out.loc[2, "score"] == 1 and out.loc[2, "label"] == "drop"
