"""Table profiling (stages/profile.py) + duplication profile
(dedup.dup_profile): reference parity, null handling, native-domain
min/max reduction, unsupported-type guard."""

import pyarrow as pa
import pytest

from janet_ray.stages.profile import table_profile


def _rows():
    # ints chosen so STRING order ('10' < '2') differs from numeric order —
    # the native-domain lane is what keeps min/max correct
    return [
        {"k": 2, "s": "beta", "maybe": None},
        {"k": 10, "s": "alpha", "maybe": 7},
        {"k": 100, "s": "gamma", "maybe": 3},
        {"k": -5, "s": "delta", "maybe": None},
    ]


def test_profile_reference(ray_session):
    import ray

    df = table_profile(ray.data.from_items(_rows()),
                       ["k", "s", "maybe"]).to_pandas()
    got = {r.col_name: (r.n_rows, r.n_nulls, r.min_val, r.max_val)
           for r in df.itertuples()}
    assert got == {
        "k": (4, 0, "-5", "100"),       # numeric order, not '10' < '2'
        "s": (4, 0, "alpha", "gamma"),
        "maybe": (4, 2, "3", "7"),      # nulls counted, skipped in min/max
    }


def test_all_null_column(ray_session):
    import ray

    rows = [{"x": None, "y": "a"} for _ in range(5)]
    tbl = pa.table({"x": pa.array([None] * 5, pa.int64()),
                    "y": pa.array(["a"] * 5, pa.string())})
    df = table_profile(ray.data.from_arrow(tbl), ["x", "y"]).to_pandas()
    got = {r.col_name: (r.n_rows, r.n_nulls, r.min_val, r.max_val)
           for r in df.itertuples()}
    assert got["x"] == (5, 5, None, None)
    assert got["y"] == (5, 0, "a", "a")


def test_unsupported_type_raises(ray_session):
    import ray

    ds = ray.data.from_items([{"f": 1.5}])
    with pytest.raises(Exception, match="pinned VARCHAR rendering"):
        table_profile(ds, ["f"]).to_pandas()


def test_repartition_invariance(ray_session):
    import ray

    rows = [{"k": i * 7 % 113, "s": f"v{i:03d}", "maybe": i if i % 3 else None}
            for i in range(200)]
    a = table_profile(ray.data.from_items(rows),
                      ["k", "s", "maybe"]).to_pandas()
    b = table_profile(ray.data.from_items(rows).repartition(17),
                      ["k", "s", "maybe"]).to_pandas()
    key = lambda df: sorted(map(tuple, df.values.tolist()))
    assert key(a) == key(b)


def test_dup_profile_histogram(ray_session):
    import ray

    from janet_ray.stages.dedup import dup_profile

    # clusters: {0,1,2} rep 0; {5,6} rep 5; {9} rep 9; {11} rep 11
    assign = [{"doc_id": 0, "cluster_rep": 0}, {"doc_id": 1, "cluster_rep": 0},
              {"doc_id": 2, "cluster_rep": 0}, {"doc_id": 5, "cluster_rep": 5},
              {"doc_id": 6, "cluster_rep": 5}, {"doc_id": 9, "cluster_rep": 9},
              {"doc_id": 11, "cluster_rep": 11}]
    df = dup_profile(ray.data.from_items(assign)).to_pandas()
    got = {r.cluster_size: (r.n_clusters, r.n_docs) for r in df.itertuples()}
    assert got == {3: (1, 3), 2: (1, 2), 1: (2, 2)}
