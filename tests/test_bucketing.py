"""Quantile bucketing (stages/bucketing.py): pinned tie/edge semantics and
SQL-twin parity on real data."""

import duckdb
import pandas as pd
import pytest

from janet_ray.stages.bucketing import quantile_buckets, quantile_buckets_sql

SF = "/root/testdata/sf0.001"


def test_ties_go_to_lower_bucket(ray_session):
    import ray

    # values 1..9: terciles cut at disc-quantile(1/3)=3, (2/3)=6
    ds = ray.data.from_items(
        [{"doc_id": i, "v": i} for i in range(1, 10)])
    out = (quantile_buckets(ds, col="v").to_pandas()
           .set_index("doc_id").sort_index())
    # v == 3 (the cutpoint itself) sits in the LOWER bucket
    assert out.loc[3, "bucket"] == 0 and out.loc[3, "bucket_label"] == "head"
    assert out.loc[4, "bucket"] == 1
    assert out.loc[6, "bucket"] == 1 and out.loc[6, "bucket_label"] == "middle"
    assert out.loc[7, "bucket"] == 2 and out.loc[7, "bucket_label"] == "tail"


def test_constant_column_single_bucket(ray_session):
    import ray

    ds = ray.data.from_items([{"doc_id": i, "v": 5} for i in range(4)])
    out = quantile_buckets(ds, col="v").to_pandas()
    # every value equals every cutpoint -> everything in bucket 0
    assert set(out["bucket"]) == {0}


def test_label_arity_checked(ray_session):
    import ray

    ds = ray.data.from_items([{"doc_id": 1, "v": 1}])
    with pytest.raises(ValueError):
        quantile_buckets(ds, col="v", qs=(0.5,), labels=("a", "b", "c"))


def test_sql_parity_quartiles(ray_session):
    import ray

    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    from janet_ray.stages.textstats import add_token_count, token_count_sql

    vals = ds.map_batches(
        lambda b: add_token_count(b).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow", zero_copy_batch=True)
    qs = (0.25, 0.5, 0.75)
    labels = ("q1", "q2", "q3", "q4")
    mine = (quantile_buckets(vals, col="n_tokens", qs=qs, labels=labels)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(quantile_buckets_sql(
        col_expr=token_count_sql("text"), out_col="n_tokens",
        qs=qs, labels=labels)).df()
        .sort_values("doc_id").reset_index(drop=True))
    mine, want = mine[sorted(mine.columns)], want[sorted(want.columns)]
    pd.testing.assert_frame_equal(mine, want, check_dtype=True,
                                  check_exact=True)
    assert mine["bucket"].nunique() == 4
