"""LM-surprise quality scoring (stages/lm_quality.py) — distributed model ==
single-process reference; natural text scores lower surprise than gibberish."""

import math
import random
from collections import Counter

import pyarrow as pa
import pytest

from janet_ray.stages import lm_quality as lm


def _reference_model(texts):
    """Single-process ground truth for the two-pass distributed build."""
    bigrams = Counter()
    prev_totals = Counter()
    vocab = set()
    for t in texts:
        for prev, w in lm.doc_bigrams(t):
            bigrams[(prev, w)] += 1
            prev_totals[prev] += 1
            vocab.add(w)
    return {"bigrams": dict(bigrams), "prev_totals": dict(prev_totals),
            "vocab_size": len(vocab)}


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox sleeps under the old tree",
    "a quick brown fox and the lazy dog play",
    "the lazy dog jumps over a brown fox",
] * 3


def test_distributed_model_equals_reference(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))
    got = lm.build_bigram_model(ds, max_vocab=10_000)
    want = _reference_model(TEXTS)
    assert got["vocab_size"] == want["vocab_size"]
    assert got["prev_totals"] == want["prev_totals"]
    assert got["bigrams"] == want["bigrams"]  # max_vocab not hit → exact

    scored = lm.score_surprise(ds, got).to_pandas().set_index("doc_id")
    for i, t in enumerate(TEXTS[:4]):
        assert scored.loc[i, "surprise"] == pytest.approx(
            lm.surprise_of(t, want), rel=1e-12)


def test_max_vocab_truncates_numerators_only():
    texts = ["a b c d e f g h"] * 2 + ["x y"]
    model_full = _reference_model(texts)
    # emulate the cut: keep top-2 bigrams; denominators must stay exact
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    cut = lm.build_bigram_model(ds, max_vocab=2)
    assert len(cut["bigrams"]) == 2
    assert cut["prev_totals"] == model_full["prev_totals"]
    assert cut["vocab_size"] == model_full["vocab_size"]


def _reference_model_with_cut(texts, vocab_top):
    """Single-process ground truth for the vocab-frequency-cut path: top-k
    tokens by (count desc, token asc), everything else → <unk> before
    counting."""
    tok_counts = Counter()
    for t in texts:
        tok_counts.update(lm._tokens(t))
    top = sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_top]
    vocab = {w for w, _ in top}
    bigrams = Counter()
    prev_totals = Counter()
    wset = set()
    for t in texts:
        for prev, w in lm.doc_bigrams(t, vocab=vocab):
            bigrams[(prev, w)] += 1
            prev_totals[prev] += 1
            wset.add(w)
    return {"bigrams": dict(bigrams), "prev_totals": dict(prev_totals),
            "vocab_size": len(wset), "unk_vocab": vocab}


def test_vocab_cut_model_equals_reference(ray_session):
    """VERDICT r02 #2: the de-drivered build with the upstream token-frequency
    cut armed must equal the single-process reference — bounded distinct
    bigrams, identical scores."""
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))
    got = lm.build_bigram_model(ds, max_vocab=10_000, vocab_top=5)
    want = _reference_model_with_cut(TEXTS, 5)
    assert got["unk_vocab"] == want["unk_vocab"]
    assert got["vocab_size"] == want["vocab_size"]
    assert got["prev_totals"] == want["prev_totals"]
    assert got["bigrams"] == want["bigrams"]
    # distinct-bigram bound: every kept token is in vocab ∪ {UNK, BOS}
    allowed = want["unk_vocab"] | {lm.UNK, lm.BOS}
    assert all(p in allowed and w in allowed for p, w in got["bigrams"])
    # scoring applies the same UNK mapping at fit and score time
    for t in TEXTS[:4]:
        assert lm.surprise_of(t, got) == pytest.approx(
            lm.surprise_of(t, want), rel=1e-12)


def test_natural_text_scores_below_gibberish(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))
    model = lm.build_bigram_model(ds)
    natural = lm.surprise_of("the quick brown fox jumps over the lazy dog", model)
    rng = random.Random(3)
    words = "the quick brown fox jumps over lazy dog".split()
    shuffled = " ".join(rng.sample(words, len(words)))
    oov = "zzz qqq www eee rrr ttt yyy uuu"
    assert natural < lm.surprise_of(shuffled, model)
    assert natural < lm.surprise_of(oov, model)


def test_empty_and_single_token():
    model = _reference_model(TEXTS)
    assert lm.surprise_of("", model) is None
    s = lm.surprise_of("the", model)  # one bigram: (<s>, the)
    n = model["bigrams"].get(("<s>", "the"), 0) + 1
    d = model["prev_totals"]["<s>"] + model["vocab_size"] + 1
    assert s == pytest.approx(-math.log2(n / d))
