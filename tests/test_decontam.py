"""Decontamination (stages/decontam.py): gram-hash semantics, edge cases,
SQL-twin parity on real data, and the broadcast membership kernel."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from janet_ray.stages.decontam import (
    benchmark_gram_set,
    decontam_sql,
    decontaminate,
    doc_gram_hashes,
)

SF = "/root/testdata/sf0.001"


def test_doc_gram_hashes_edges():
    assert doc_gram_hashes("", k=3).size == 0
    assert doc_gram_hashes(None, k=3).size == 0
    assert doc_gram_hashes("a b", k=3).size == 0          # < k tokens
    one = doc_gram_hashes("a b c", k=3)
    assert one.size == 1
    # distinct: repeated gram collapses
    rep = doc_gram_hashes("a b c a b c a b c", k=3)
    # grams: 'a b c','b c a','c a b' repeating -> 3 distinct
    assert rep.size == 3
    # sorted
    assert np.all(np.diff(rep) > 0)


def test_tokenizer_contract():
    # case-fold + [a-z0-9]+ runs: punctuation splits, digits kept
    a = doc_gram_hashes("Foo, BAR baz-42", k=2)
    b = doc_gram_hashes("foo bar baz 42", k=2)
    assert np.array_equal(a, b)


def test_membership_counts(ray_session):
    import ray

    corpus = ray.data.from_items([
        {"doc_id": 1, "text": "alpha beta gamma delta"},     # shares 2 grams
        {"doc_id": 2, "text": "zz yy xx ww"},                # clean
        {"doc_id": 3, "text": "a"},                          # < k tokens
    ])
    bench = ray.data.from_items([
        {"doc_id": 99, "text": "alpha beta gamma delta epsilon"},
    ])
    out = (decontaminate(corpus, bench, k=3).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 1 grams: 'alpha beta gamma','beta gamma delta' — both in bench
    assert out.loc[1, "n_hits"] == 2 and bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_hits"] == 0 and not bool(out.loc[2, "contaminated"])
    assert out.loc[3, "n_hits"] == 0 and not bool(out.loc[3, "contaminated"])


def test_empty_benchmark(ray_session):
    import ray

    corpus = ray.data.from_items([{"doc_id": 1, "text": "a b c d"}])
    bench = ray.data.from_items(
        [{"doc_id": 9, "text": "x"}])  # < k tokens -> empty gram set
    assert benchmark_gram_set(bench, k=3).size == 0
    out = decontaminate(corpus, bench, k=3).to_pandas()
    assert out["n_hits"].tolist() == [0]


def test_sql_parity_on_corpus(ray_session):
    import ray

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])

    def side(want_bench):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((ids % 7 == 0) == want_bench))
        return docs.map_batches(f, batch_format="pyarrow",
                                zero_copy_batch=True)

    mine = (decontaminate(side(False), side(True), k=4).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(decontam_sql(k=4, corpus_pred="doc_id % 7 != 0",
                                     bench_pred="doc_id % 7 = 0")).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, want, check_dtype=True)
    # the fixture must exercise both branches for this test to mean anything
    assert mine["contaminated"].any() and not mine["contaminated"].all()
