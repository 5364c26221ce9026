"""PMI collocations (stages/collocations.py): brute-force parity, the
IEEE-exact score chain vs DuckDB, partition invariance, edge cases."""

import re
from collections import Counter

import pyarrow as pa

from janet_ray.stages.collocations import pmi_collocations, pmi_sql


def _brute(texts, top_k, min_count):
    tok = re.compile(r"[a-z0-9]+")
    uni, big = Counter(), Counter()
    for t in texts:
        ws = tok.findall(t.lower())
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    tu, tb = sum(uni.values()), sum(big.values())
    rows = []
    for (w1, w2), cab in big.items():
        if cab < min_count:
            continue
        score = float(cab) * tu / uni[w1] * tu / uni[w2] / tb
        rows.append((w1, w2, cab, score))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:top_k]


def _ds(texts):
    import ray

    return ray.data.from_items([{"text": t} for t in texts])


def test_matches_bruteforce(ray_session):
    texts = ["the quick brown fox", "quick brown fox again and again",
             "new york city and new york state", "san francisco and new york",
             "a b a b a b a b c"] * 4
    got = pmi_collocations(_ds(texts), top_k=8, min_count=3).to_pandas()
    want = _brute(texts, 8, 3)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_matches_duckdb_bit_exact(ray_session):
    """The float score column must value-hash against the SQL twin — the
    op-order contract the module docstring pins."""
    import duckdb
    import pandas as pd

    texts = [f"token{i % 7} token{(i + 1) % 5} filler word pair here"
             for i in range(60)]
    got = pmi_collocations(_ds(texts), top_k=20, min_count=4).to_pandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    want = con.execute(pmi_sql(top_k=20, min_count=4)).df()
    pd.testing.assert_frame_equal(
        got.sort_values(list(got.columns)).reset_index(drop=True),
        want.sort_values(list(want.columns)).reset_index(drop=True),
        check_exact=True)


def test_partition_invariance(ray_session):
    import ray

    texts = [f"alpha beta gamma{i % 3} alpha beta" for i in range(40)]
    a = pmi_collocations(_ds(texts).repartition(2), min_count=2).to_pandas()
    b = pmi_collocations(_ds(texts).repartition(19), min_count=2).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_bigrams_do_not_cross_documents(ray_session):
    # "end start" only ever appears across the doc boundary -> count 0
    texts = ["words end", "start words"] * 10
    got = pmi_collocations(_ds(texts), min_count=1).to_pandas()
    pairs = set(zip(got.w1, got.w2))
    assert ("end", "start") not in pairs
    assert ("words", "end") in pairs and ("start", "words") in pairs


def test_empty_and_below_min_count(ray_session):
    import ray

    got = pmi_collocations(
        ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())})),
        min_count=1).to_pandas()
    assert len(got) == 0
    got = pmi_collocations(_ds(["one two"]), min_count=5).to_pandas()
    assert len(got) == 0


def test_dispatch_paths_parity(ray_session):
    """Forced driver-side attach and distributed-joins attach must produce
    identical rows INCLUDING the float score (same IEEE op chain)."""
    texts = ["the quick brown fox", "quick brown fox again and again",
             "new york city and new york state", "san francisco and new york",
             "a b a b a b a b c"] * 4
    a = pmi_collocations(_ds(texts), top_k=12, min_count=3,
                         force_dispatch="small").to_pandas()
    b = pmi_collocations(_ds(texts), top_k=12, min_count=3,
                         force_dispatch="joins").to_pandas()
    assert a.values.tolist() == b.values.tolist()
