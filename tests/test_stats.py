"""Distributed quantiles / distinct count (stages/stats.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(ray, vals, col="x"):
    return ray.data.from_arrow(pa.table({col: pa.array(vals, pa.int64())}))


def test_quantiles_match_duckdb_rule(ray_session):
    import duckdb
    import ray

    from janet_ray.stages.stats import distributed_quantiles

    rng = np.random.RandomState(11)
    vals = rng.randint(1, 20, size=5000).tolist()
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = distributed_quantiles(_ds(ray, vals), "x", qs)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals])
    for q, v in zip(got["q"], got["value"]):
        want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert v == want, q


def test_quantiles_rank_boundaries(ray_session):
    import ray

    from janet_ray.stages.stats import distributed_quantiles

    # [1,2,3]: rank rule ceil(q*n) → q=0.75 → rank 3 → value 3
    got = distributed_quantiles(_ds(ray, [3, 1, 2]), "x", [0.75, 1.0, 0.01])
    as_map = dict(zip(got["q"], got["value"]))
    assert as_map[0.75] == 3 and as_map[1.0] == 3 and as_map[0.01] == 1


def test_distinct_count_exact(ray_session):
    import ray

    from janet_ray.stages.stats import distinct_count

    vals = [1, 2, 2, 3, 3, 3, 9] * 100
    got = distinct_count(_ds(ray, vals), "x")
    assert got["n_distinct"].tolist() == [4]


def test_distinct_count_strings(ray_session):
    import ray

    from janet_ray.stages.stats import distinct_count

    t = pa.table({"s": pa.array(["a", "b", "a", "c", "b"], pa.string())})
    got = distinct_count(ray.data.from_arrow(t), "s")
    assert got["n_distinct"].tolist() == [3]


def test_nulls_follow_sql_semantics(ray_session):
    """COUNT(DISTINCT) never counts the null group; quantiles ignore nulls
    (review r2b findings 1-2)."""
    import ray

    from janet_ray.stages.stats import distinct_count, distributed_quantiles

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, None, 2], pa.int64())}))
    assert distinct_count(ds, "x")["n_distinct"].tolist() == [2]
    got = distributed_quantiles(ds, "x", [0.5])
    assert got["value"].tolist() == [2]  # nulls dropped before ranking
