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
