"""Per-group top-k operator (stages/rank.py) — determinism, ranks, ties."""

import numpy as np
import pyarrow as pa

from janet_ray.stages.rank import group_topk


def _ds(ray, t):
    return ray.data.from_arrow(t)


def test_group_topk_basic(ray_session):
    import ray

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "score": pa.array([10, 30, 20, 5, 7], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = group_topk(_ds(ray, t), ["g"], "score", 2,
                     tiebreak_cols=["id"]).to_pandas() \
        .sort_values(["g", "rank"]).reset_index(drop=True)
    assert out[["g", "score", "rank"]].values.tolist() == [
        ["a", 30, 1], ["a", 20, 2], ["b", 7, 1], ["b", 5, 2]]


def test_group_topk_ties_deterministic(ray_session):
    import ray

    t = pa.table({
        "g": pa.array(["x"] * 4, pa.string()),
        "score": pa.array([5, 5, 5, 5], pa.int64()),
        "id": pa.array([40, 10, 30, 20], pa.int64()),
    })
    out = group_topk(_ds(ray, t), ["g"], "score", 3,
                     tiebreak_cols=["id"]).to_pandas().sort_values("rank")
    assert out["id"].tolist() == [10, 20, 30]  # ties broken by id ascending


def test_group_topk_many_groups_vectorized(ray_session):
    """1000 groups across coarse partitions — ranks correct everywhere."""
    import ray

    rng = np.random.RandomState(3)
    n = 20_000
    g = rng.randint(0, 1000, n)
    score = rng.randint(0, 10_000, n)
    t = pa.table({
        "g": pa.array(g, pa.int64()),
        "score": pa.array(score, pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    out = group_topk(_ds(ray, t), ["g"], "score", 5,
                     tiebreak_cols=["id"]).to_pandas()
    assert (out.groupby("g").size() <= 5).all()
    # cross-check a few groups against pandas
    import pandas as pd

    df = t.to_pandas()
    for gid in (0, 1, 999):
        want = df[df["g"] == gid].sort_values(
            ["score", "id"], ascending=[False, True]).head(5)
        got = out[out["g"] == gid].sort_values("rank")
        assert got["id"].tolist() == want["id"].tolist()


def test_group_topk_ascending(ray_session):
    import ray

    t = pa.table({
        "g": pa.array([1, 1, 1], pa.int64()),
        "score": pa.array([9, 1, 5], pa.int64()),
        "id": pa.array([1, 2, 3], pa.int64()),
    })
    out = group_topk(_ds(ray, t), ["g"], "score", 1, descending=False,
                     tiebreak_cols=["id"]).to_pandas()
    assert out["score"].tolist() == [1]


# ----------------------------------------------------------- global_rank

def _rank_reference(vals):
    return {v: 1 + sum(1 for w in vals if w < v) for v in set(vals)}


def test_global_rank_matches_sql_rank(ray_session):
    import ray

    from janet_ray.stages.stats import global_rank

    vals = [5, -3, 5, 0, 12, -3, -3, 7, 0, 100, 5]
    rows = [{"doc_id": i, "score": v} for i, v in enumerate(vals)]
    df = global_rank(ray.data.from_items(rows), "score",
                     out_col="score_rank").to_pandas()
    ref = _rank_reference(vals)
    assert len(df) == len(vals)  # all rows pass through
    for r in df.itertuples():
        assert r.score_rank == ref[r.score], (r.score, r.score_rank)
    assert set(df.columns) == {"doc_id", "score", "score_rank"}


def test_global_rank_repartition_invariance(ray_session):
    import ray

    from janet_ray.stages.stats import global_rank

    rows = [{"doc_id": i, "score": (i * 37) % 11 - 5} for i in range(300)]
    a = global_rank(ray.data.from_items(rows), "score").to_pandas()
    b = global_rank(ray.data.from_items(rows).repartition(23),
                    "score").to_pandas()
    key = lambda df: sorted(zip(df["doc_id"], df["rank"]))
    assert key(a) == key(b)


def test_global_rank_guards(ray_session):
    import pytest
    import ray

    from janet_ray.stages.stats import global_rank

    with pytest.raises(Exception, match="nulls"):
        global_rank(ray.data.from_items(
            [{"s": 1}, {"s": None}, {"s": 1}]).repartition(1),
            "s").to_pandas()
    with pytest.raises(Exception, match="integer"):
        global_rank(ray.data.from_items([{"s": 1.5}]), "s").to_pandas()
    with pytest.raises(ValueError, match="distinct"):
        global_rank(ray.data.from_items(
            [{"s": i} for i in range(10)]), "s", max_distinct=3).to_pandas()
