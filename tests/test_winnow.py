"""Winnowing fingerprints (stages/winnow.py): the SIGMOD'03 coverage
guarantee, window semantics, small-doc fallbacks, distributed == local."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.stages.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    _md5_u32,
    doc_fingerprints,
    winnow_fingerprints,
)


def _reference(text, k, w):
    """Straight-line winnowing: explicit per-window min loop."""
    import re

    toks = re.findall(r"[a-z0-9]+", text.lower())
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [_md5_u32(g) for g in grams]
    if not hs:
        return []
    if len(hs) < w:
        return [min(hs)]
    return sorted({min(hs[i:i + w]) for i in range(len(hs) - w + 1)})


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from("abc de fg1 23 xx yy zz ww qq".split()),
                max_size=30).map(" ".join),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=5))
def test_matches_reference_loop(text, k, w):
    assert doc_fingerprints(text, k=k, w=w) == _reference(text, k, w)


def test_small_docs():
    # < k tokens → nothing; >= k tokens but < w grams → min of all grams
    assert doc_fingerprints("a b c", k=4, w=4) == []
    assert doc_fingerprints("", k=4, w=4) == []
    fp = doc_fingerprints("a b c d e", k=4, w=4)  # 2 grams < w
    assert fp == [min(_md5_u32("a b c d"), _md5_u32("b c d e"))]


def test_coverage_guarantee():
    """Any shared run of >= k + w - 1 tokens yields >= 1 shared fingerprint."""
    shared = "the quick brown fox jumps over the lazy dog sentence"  # 10 tokens
    a = "intro words here " + shared + " tail alpha beta"
    b = "completely different opening " + shared + " other ending words"
    fa = set(doc_fingerprints(a))
    fb = set(doc_fingerprints(b))
    assert fa & fb, "winnowing coverage guarantee violated"
    # and unrelated docs share nothing
    c = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"
    assert not (set(doc_fingerprints(c)) & fa)


def test_density():
    """Expected fingerprint density ~ 2/(w+1) of grams (loose band)."""
    rng = np.random.RandomState(5)
    words = [f"w{rng.randint(10_000)}" for _ in range(5_000)]
    text = " ".join(words)
    n_grams = len(words) - DEFAULT_K + 1
    fps = doc_fingerprints(text)
    density = len(fps) / n_grams
    assert 0.2 < density < 0.6  # 2/(w+1) = 0.4 for w=4


def test_distributed_matches_local(ray_session):
    import ray

    texts = [f"doc {i} shared run of common tokens here plus unique{i} tail"
             for i in range(50)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(7)
    out = winnow_fingerprints(ds).to_pandas()
    got = {(r.doc_id, r.fp) for r in out.itertuples()}
    want = {(i, fp) for i, t in enumerate(texts) for fp in doc_fingerprints(t)}
    assert got == want
