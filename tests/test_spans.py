"""Exact shared token spans (stages/spans.py): maximal-run kernel vs a
brute-force reference, coverage via winnow candidates, broadcast guard."""

import numpy as np
import pytest

from janet_ray.stages.spans import maximal_shared_runs, shared_token_spans


def _brute_force(a, b, min_len):
    out = []
    for i in range(len(a)):
        for j in range(len(b)):
            # run starting at (i, j) that is NOT a continuation
            if a[i] != b[j]:
                continue
            if i > 0 and j > 0 and a[i - 1] == b[j - 1]:
                continue
            ln = 0
            while i + ln < len(a) and j + ln < len(b) and a[i + ln] == b[j + ln]:
                ln += 1
            if ln >= min_len:
                out.append((i, j, ln))
    return sorted(out)


def test_kernel_matches_brute_force_random():
    rng = np.random.RandomState(3)
    for _ in range(25):
        a = [f"t{x}" for x in rng.randint(0, 6, rng.randint(1, 40))]
        b = [f"t{x}" for x in rng.randint(0, 6, rng.randint(1, 40))]
        for min_len in (1, 2, 3):
            assert maximal_shared_runs(a, b, min_len) == \
                _brute_force(a, b, min_len)


def test_kernel_edges():
    assert maximal_shared_runs([], ["x"], 1) == []
    assert maximal_shared_runs(["x"], ["x"], 1) == [(0, 0, 1)]
    assert maximal_shared_runs(["x"], ["x"], 2) == []
    # repeated content: every diagonal alignment is a distinct maximal run
    assert maximal_shared_runs(["a", "a"], ["a", "a"], 1) == \
        [(0, 0, 2), (0, 1, 1), (1, 0, 1)]


def test_end_to_end_with_winnow_candidates(ray_session):
    import ray

    from janet_ray.stages.winnow import winnow_neardup_pairs

    shared = "common run of nine identical tokens right here now"
    rows = [
        {"doc_id": 1, "text": f"alpha beta {shared} tail one"},
        {"doc_id": 2, "text": f"{shared} completely different ending words"},
        {"doc_id": 3, "text": "nothing in common with the others at all"},
    ]
    ds = ray.data.from_items(rows)
    pairs = winnow_neardup_pairs(ds, k=3, w=1, threshold=0.2)
    out = shared_token_spans(ds, pairs, min_len=7).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.length == 9          # the shared run's token count
    assert r.a_start == 2 and r.b_start == 0


def test_over_limit_dispatches_to_sorted_gram(ray_session):
    """Above broadcast_limit the auto path must RUN (sorted-gram), not raise
    (the r03 'weak' ceiling is gone)."""
    import ray

    shared = "shared run of nine identical tokens goes right here"
    ds = ray.data.from_items([
        {"doc_id": 1, "text": f"prefix {shared}"},
        {"doc_id": 2, "text": f"{shared} suffix words"},
    ])
    pairs = ray.data.from_items([{"id_a": 1, "id_b": 2}])
    out = shared_token_spans(ds, pairs, min_len=7,
                             broadcast_limit=1).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b, r.length) == (1, 2, 9)
    assert r.a_start == 1 and r.b_start == 0


def _span_set(df):
    return {(r.id_a, r.id_b, r.a_start, r.b_start, r.length)
            for r in df.itertuples()}


def test_sorted_gram_parity_with_broadcast_kernel(ray_session):
    """The scale path must produce EXACTLY the broadcast kernel's spans —
    random corpora with planted shared runs, repeated tokens (multiple
    maximal runs per pair, several diagonals), and all-pairs candidates."""
    import ray

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(12)]
    shared_a = " ".join(rng.choice(vocab, 9))
    shared_b = " ".join(rng.choice(vocab, 7))
    texts = []
    for i in range(12):
        toks = list(rng.choice(vocab, rng.randint(5, 30)))
        if i % 3 == 0:
            toks[2:2] = shared_a.split()
        if i % 4 == 0:
            toks.extend(shared_b.split())
        texts.append(" ".join(toks))
    texts.append("a a a a a a a a a a")  # degenerate repeats
    texts.append("b b a a a a a a a a a a b")
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    n = len(texts)
    pairs = ray.data.from_items(
        [{"id_a": i, "id_b": j} for i in range(n) for j in range(i + 1, n)])
    for min_len in (4, 7):
        bc = shared_token_spans(ds, pairs, min_len=min_len,
                                method="broadcast").to_pandas()
        sg = shared_token_spans(ds, pairs, min_len=min_len,
                                method="sorted_gram").to_pandas()
        assert _span_set(bc) == _span_set(sg), min_len
        assert len(bc) > 0  # the parity is over a non-trivial span set


def test_sorted_gram_respects_candidate_pair_set(ray_session):
    """Docs sharing a run but NOT in the candidate pair set emit nothing."""
    import ray

    shared = "one two three four five six seven"
    ds = ray.data.from_items([
        {"doc_id": 1, "text": f"{shared} x"},
        {"doc_id": 2, "text": f"{shared} y"},
        {"doc_id": 3, "text": f"{shared} z"},
    ])
    pairs = ray.data.from_items([{"id_a": 1, "id_b": 3}])
    out = shared_token_spans(ds, pairs, min_len=7,
                             method="sorted_gram").to_pandas()
    assert _span_set(out) == {(1, 3, 0, 0, 7)}


def test_cut_duplicate_spans(ray_session):
    import ray

    from janet_ray.stages.spans import cut_duplicate_spans
    from janet_ray.stages.winnow import winnow_neardup_pairs

    shared = "one two three four five six seven eight nine"
    rows = [
        {"doc_id": 1, "text": f"keep {shared} alpha"},
        {"doc_id": 2, "text": f"{shared} bravo charlie delta echo fox"},
        {"doc_id": 3, "text": "totally unrelated text with no duplicates"},
    ]
    ds = ray.data.from_items(rows)
    pairs = winnow_neardup_pairs(ds, k=3, w=1, threshold=0.2)
    spans = shared_token_spans(ds, pairs, min_len=7)
    out = (cut_duplicate_spans(ray.data.from_items(rows), spans)
           .to_pandas().set_index("doc_id"))
    # lower doc keeps the span; higher doc loses exactly its 9 tokens
    assert out.loc[1, "text"] == f"keep {shared} alpha"
    assert out.loc[1, "n_tokens_removed"] == 0
    assert out.loc[2, "text"] == "bravo charlie delta echo fox"
    assert out.loc[2, "n_tokens_removed"] == 9
    # untouched docs round-trip (token join — text had single spaces already)
    assert out.loc[3, "text"] == rows[2]["text"]
    assert out.loc[3, "n_tokens_removed"] == 0


def test_cut_merges_overlapping_intervals(ray_session):
    import ray

    from janet_ray.stages.spans import cut_duplicate_spans

    # two overlapping cut intervals on doc 5: [1, 5) and [3, 7) -> union [1, 7)
    spans = ray.data.from_items([
        {"id_a": 1, "id_b": 5, "a_start": 0, "b_start": 1, "length": 4},
        {"id_a": 2, "id_b": 5, "a_start": 0, "b_start": 3, "length": 4},
    ])
    docs = ray.data.from_items(
        [{"doc_id": 5, "text": "t0 t1 t2 t3 t4 t5 t6 t7"}])
    out = cut_duplicate_spans(docs, spans).to_pandas().iloc[0]
    assert out["text"] == "t0 t7"
    assert out["n_tokens_removed"] == 6


def test_no_candidate_pairs_yields_empty(ray_session):
    import ray

    ds = ray.data.from_items([{"doc_id": 1, "text": "totally unique alpha"},
                              {"doc_id": 2, "text": "different words beta"}])
    pairs = ray.data.from_items([{"id_a": 1, "id_b": 2}]).filter(
        lambda r: False)  # empty pair set
    out = shared_token_spans(ds, pairs, min_len=3).to_pandas()
    assert len(out) == 0


def _brute_global(texts, min_len, max_tokens=4096):
    """Reference for substring_dedup_global: cut every token covered by a
    k-gram whose (doc, pos)-earliest occurrence is elsewhere."""
    import re

    tok = re.compile(r"[a-z0-9]+")
    toks = {i: tok.findall(t.lower()) for i, t in enumerate(texts)}
    first = {}
    occs = []
    for i in sorted(toks):
        tt = toks[i][:max_tokens]
        for p in range(len(tt) - min_len + 1):
            g = " ".join(tt[p:p + min_len])
            if g not in first:
                first[g] = (i, p)
            else:
                occs.append((i, p))
    cut = {}
    for i, p in occs:
        cut.setdefault(i, set()).update(range(p, p + min_len))
    out = {}
    for i in sorted(toks):
        kept = [w for j, w in enumerate(toks[i]) if j not in cut.get(i, set())]
        out[i] = (" ".join(kept), len(toks[i]) - len(kept))
    return out


def test_global_substring_dedup_matches_bruteforce(ray_session):
    import ray

    from janet_ray.stages.spans import substring_dedup_global

    shared = "common boilerplate of nine identical tokens right here now"
    rng = np.random.RandomState(5)
    vocab = [f"v{i}" for i in range(15)]
    texts = []
    for i in range(10):
        toks = list(rng.choice(vocab, rng.randint(6, 25)))
        if i % 2 == 0:
            toks[1:1] = shared.split()
        texts.append(" ".join(toks))
    texts.append("a a a a a a a a a a")   # self-duplicating grams
    texts.append(shared + " " + shared)    # intra-doc duplicate
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    for min_len in (4, 7):
        got = substring_dedup_global(ds, min_len=min_len).to_pandas()
        got_map = {r.doc_id: (r.text, r.n_tokens_removed)
                   for r in got.itertuples()}
        assert got_map == _brute_global(texts, min_len), min_len


def test_global_substring_dedup_matches_sql_twin(ray_session):
    import duckdb
    import pandas as pd
    import ray

    from janet_ray.stages.spans import (substring_dedup_global,
                                        substring_dedup_global_sql)

    texts = ["the quick brown fox jumps over the lazy dog today",
             "prefix the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy dog again yes",
             "nothing shared here at all in any seven gram window"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = substring_dedup_global(ds, min_len=7).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(substring_dedup_global_sql(min_len=7)).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
        check_dtype=True, check_exact=True)


def test_cut_apply_union_path_matches_broadcast(ray_session):
    """Above the interval broadcast_limit the apply must switch to the
    cogroup-via-union path and produce identical output (not raise)."""
    import ray

    from janet_ray.stages.spans import cut_duplicate_spans

    spans = ray.data.from_items([
        {"id_a": 1, "id_b": 5, "a_start": 0, "b_start": 1, "length": 4},
        {"id_a": 2, "id_b": 5, "a_start": 0, "b_start": 3, "length": 4},
        {"id_a": 1, "id_b": 6, "a_start": 0, "b_start": 0, "length": 2},
    ])
    docs = ray.data.from_items([
        {"doc_id": 5, "text": "t0 t1 t2 t3 t4 t5 t6 t7"},
        {"doc_id": 6, "text": "x0 x1 x2 x3"},
        {"doc_id": 7, "text": "untouched words here"},
    ])
    bc = cut_duplicate_spans(docs, spans).to_pandas()
    un = cut_duplicate_spans(docs, spans, broadcast_limit=0).to_pandas()
    key = lambda df: sorted(
        zip(df.doc_id, df.text, df.n_tokens_removed))
    assert key(bc) == key(un)
    got = {r.doc_id: (r.text, r.n_tokens_removed) for r in un.itertuples()}
    assert got[5] == ("t0 t7", 6)
    assert got[6] == ("x2 x3", 2)
    assert got[7] == ("untouched words here", 0)


def test_global_dedup_union_apply_matches_broadcast(ray_session):
    import ray

    from janet_ray.stages.spans import substring_dedup_global

    shared = "nine identical tokens in a row right here now"
    texts = [f"doc{i} " + shared + f" tail{i}" for i in range(6)]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    bc = substring_dedup_global(ds, min_len=7).to_pandas()
    un = substring_dedup_global(ds, min_len=7, broadcast_limit=0).to_pandas()
    key = lambda df: sorted(zip(df.doc_id, df.text, df.n_tokens_removed))
    assert key(bc) == key(un)
