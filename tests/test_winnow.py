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
    _pair_partials,
    doc_fingerprints,
    winnow_fingerprints,
    winnow_neardup_pairs,
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


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),   # doc_id
                          st.integers(min_value=0, max_value=20)),  # fp
                max_size=60).map(lambda ps: sorted(set(ps))),
       st.integers(min_value=1, max_value=6))
def test_pair_partials_matches_naive(postings, max_df):
    """The length-classed vectorized kernel == a naive per-fp double loop."""
    from collections import Counter, defaultdict

    # n is functionally dependent on doc_id (here: doc_id*7+1 stands in for
    # the doc's set size); the kernel must carry it through unchanged
    tbl = pa.table({"doc_id": pa.array([d for d, _ in postings], pa.int64()),
                    "fp": pa.array([f for _, f in postings], pa.int64()),
                    "n": pa.array([d * 7 + 1 for d, _ in postings], pa.int64())})
    got = Counter()
    out = _pair_partials(tbl, max_df)
    for r in out.to_pylist():
        got[(r["id_a"], r["id_b"])] += r["s"]
        assert r["n_a"] == r["id_a"] * 7 + 1
        assert r["n_b"] == r["id_b"] * 7 + 1
    by_fp = defaultdict(list)
    for d, f in postings:
        by_fp[f].append(d)
    want = Counter()
    for docs in by_fp.values():
        if len(docs) < 2 or len(docs) > max_df:
            continue
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                want[(min(a, b), max(a, b))] += 1
    assert got == want


def _jaccard_sets(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def test_neardup_pairs_exact_jaccard(ray_session):
    """Distributed pairs == per-doc fingerprint-set jaccard computed locally
    (no df cut hit: every fp here is shared by fewer docs than max_df)."""
    import ray

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "other animals watch from a distance in the tall summer grass")
    texts = []
    for i in range(12):
        if i % 3 == 0:
            texts.append(base + f" unique tail {i}")          # near-dup family
        else:
            texts.append(f"doc {i} " + " ".join(f"tok{i}x{j}" for j in range(30)))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    out = winnow_neardup_pairs(ds, threshold=0.3).to_pandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    fps = [set(doc_fingerprints(t)) for t in texts]
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            j = _jaccard_sets(fps[a], fps[b])
            if j >= 0.3:
                want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    assert want, "fixture must actually produce near-dup pairs"


def test_neardup_max_df_cut(ray_session):
    """A fingerprint shared by more than max_df docs contributes NOTHING to
    the shared count (conservative underestimate) — with max_df=2 and three
    identical docs, every pair's numerator is fully cut, so no pairs."""
    import ray

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([text] * 3, pa.string()),
    }))
    out = winnow_neardup_pairs(ds, threshold=0.5, max_df=2).to_pandas()
    assert len(out) == 0
    # at max_df=3 the same corpus yields all 3 identical pairs at jaccard 1.0
    out = winnow_neardup_pairs(ds, threshold=0.5, max_df=3).to_pandas()
    assert sorted(zip(out.id_a, out.id_b)) == [(0, 1), (0, 2), (1, 2)]
    assert (out.jaccard == 1.0).all()


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


def test_hash_bits_64_variant(ray_session):
    """Production hash_bits=64 (ADVICE r03): same selection semantics and
    pair results as 32-bit on a collision-free corpus, values int63-safe."""
    import ray

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fp32 = doc_fingerprints(text)
    fp64 = doc_fingerprints(text, hash_bits=64)
    assert fp32 != fp64  # different hash family actually engaged
    assert len(fp64) >= 1 and all(0 <= f < 2 ** 63 for f in fp64)
    # deterministic: same doc → same set
    assert doc_fingerprints(text, hash_bits=64) == fp64
    # end-to-end: near-dup pairs identical across hash widths on a small
    # (collision-free either way) corpus — semantics independent of the hash
    texts = [text, text + " extra tail words here", "completely different "
             "content with nothing shared at all in any window of tokens"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    p32 = winnow_neardup_pairs(ds, threshold=0.1).to_pandas()
    p64 = winnow_neardup_pairs(ds, threshold=0.1, hash_bits=64).to_pandas()
    assert sorted(zip(p32.id_a, p32.id_b)) == sorted(zip(p64.id_a, p64.id_b))
