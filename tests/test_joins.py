"""broadcast semi-join + as-of join vs straightforward in-memory references."""
from datetime import datetime

import pyarrow as pa
import pytest

from janet_ray.stages import joins


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_broadcast_semi_join(ray_session):
    import ray.data

    t = pa.table({"k": [1, 2, 3, 4, 5, 2, 9], "v": list(range(7))})
    ds = ray.data.from_arrow(t)
    out = joins.broadcast_semi_join(ds, "k", [2, 5, 7]).take_all()
    assert sorted((r["k"], r["v"]) for r in out) == [(2, 1), (2, 5), (5, 4)]
    # empty key set → empty result
    assert joins.broadcast_semi_join(ds, "k", []).count() == 0


def test_asof_join_latest(ray_session):
    import ray.data

    left = pa.table({
        "id": [1, 2, 3, 4, 5],
        "key": [10, 10, 10, 20, 30],
        "ts": [_ts(5), _ts(2), _ts(1), _ts(9), _ts(4)],
    })
    right = pa.table({
        "rkey": [10, 10, 20, 20, 40],
        "rts": [_ts(1, 12), _ts(4), _ts(3), _ts(9), _ts(1)],
    })
    lds = ray.data.from_arrow(left)
    rds = ray.data.from_arrow(right)
    out = joins.asof_join_latest(lds, rds, left_key="key", right_key="rkey",
                                 left_ts="ts", right_ts="rts", n_parts=4).take_all()
    got = {r["id"]: r["matched_ts"] for r in out}
    assert got[1] == _ts(4)        # latest rts <= Jan 5 for key 10
    assert got[2] == _ts(1, 12)    # Jan 2 → Jan 1 12:00
    assert got[3] is None          # Jan 1 00:00 precedes all right rows
    assert got[4] == _ts(9)        # boundary: rts == ts is included
    assert got[5] is None          # key 30 has no right rows
    assert len(got) == 5           # left join: every left row survives


def test_asof_join_keys_split_across_parts(ray_session):
    """Keys hashing to different coarse partitions must not interfere."""
    import ray.data

    n = 50
    left = pa.table({
        "id": list(range(n)),
        "key": [i % 7 for i in range(n)],
        "ts": [_ts(1 + i % 25) for i in range(n)],
    })
    right = pa.table({
        "rkey": [i % 7 for i in range(21)],
        "rts": [_ts(1 + (i * 3) % 25) for i in range(21)],
    })
    out = joins.asof_join_latest(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        left_key="key", right_key="rkey", left_ts="ts", right_ts="rts",
        n_parts=3).take_all()
    # reference: per-row max(rts <= ts) among same key
    rk = right["rkey"].to_pylist()
    rt = right["rts"].to_pylist()
    got = {r["id"]: r["matched_ts"] for r in out}
    for i, k, t in zip(left["id"].to_pylist(), left["key"].to_pylist(),
                       left["ts"].to_pylist()):
        cands = [x for kk, x in zip(rk, rt) if kk == k and x <= t]
        assert got[i] == (max(cands) if cands else None), i


def test_broadcast_semi_join_string_keys(ray_session):
    import pyarrow as pa
    import ray.data

    t = pa.table({"k": ["a", "b", "c", "b"], "v": [1, 2, 3, 4]})
    out = joins.broadcast_semi_join(ray.data.from_arrow(t), "k", ["b", "z"]).take_all()
    assert sorted((r["k"], r["v"]) for r in out) == [("b", 2), ("b", 4)]


def test_asof_join_rejects_reserved_columns(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data
    from datetime import datetime

    t = pa.table({"id": [1], "key": [1], "ts": [datetime(2024, 1, 1)],
                  "part": [0]})
    with pytest.raises(ValueError, match="collides"):
        joins.asof_join_latest(ray.data.from_arrow(t), ray.data.from_arrow(t),
                               left_key="key", right_key="key",
                               left_ts="ts", right_ts="ts")


def test_interval_join_count_window_semantics(ray_session):
    """[ts-before, ts+after) per key: self excluded at after=0; cross-key
    never counted; hand-computed fixture."""
    import ray.data

    from janet_ray.stages.joins import interval_join_count

    def evs(rows):
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }))

    MIN = 60_000_000
    rows = [
        (0, 1, 0),            # nothing before
        (1, 1, 10 * MIN),     # sees event 0 (within 30m)
        (2, 1, 35 * MIN),     # sees event 1 only (event 0 is 35m back)
        (3, 2, 35 * MIN),     # other user: sees nothing
        (4, 1, 35 * MIN),     # simultaneous with 2, same user: excluded both ways
    ]
    out = interval_join_count(
        evs(rows), evs(rows), left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        before_us=30 * MIN, after_us=0, out_col="n").to_pandas() \
        .set_index("event_id")["n"]
    assert out.to_dict() == {0: 0, 1: 1, 2: 1, 3: 0, 4: 1}

    # symmetric window (after > 0) counts both directions but never self/simultaneous? 
    # with after>0 the right-open bound still excludes nothing at equal ts+after edge;
    # equal-ts rows ARE in [ts-b, ts+a) when a>0 — verify that too
    out2 = interval_join_count(
        evs(rows), evs(rows), left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        before_us=30 * MIN, after_us=1, out_col="n").to_pandas() \
        .set_index("event_id")["n"]
    # each row now also counts itself (its own ts is inside the window)
    assert out2.to_dict() == {0: 1, 1: 2, 2: 3, 3: 1, 4: 3}  # 2,4: self+evt1+each other


def test_interval_join_int32_key_and_out_col_guard(ray_session):
    """Non-int64 keys keep one block schema through the union (right side cast
    to the left key dtype) and an out_col colliding with a left column raises
    (review r2b findings 4,6)."""
    import ray.data

    from janet_ray.stages.joins import interval_join_count

    t = pa.table({"k": pa.array([1, 1, 2], pa.int32()),
                  "ts": pa.array([0, 50, 60], pa.timestamp("us"))})
    ds = ray.data.from_arrow(t)
    out = interval_join_count(ds, ds, left_key="k", right_key="k",
                              left_ts="ts", right_ts="ts",
                              before_us=100, after_us=0).to_pandas()
    assert sorted(out["n_in_window"]) == [0, 0, 1]
    assert str(out.dtypes["k"]) == "int32"  # left dtype preserved
    with pytest.raises(ValueError, match="collides"):
        interval_join_count(ds, ds, left_key="k", right_key="k",
                            left_ts="ts", right_ts="ts",
                            before_us=1, after_us=0, out_col="ts")


def test_drop_empty_blocks_join_guard(ray_session):
    """Ray 2.49 defect repro guard: a typed EMPTY block dispatched first into
    Dataset.join skips the schema broadcast and rowless join partitions crash
    in finalize. drop_empty_blocks removes the hazard without copying data."""
    import ray.data

    from janet_ray.stages.joins import drop_empty_blocks

    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    t1 = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "v": pa.array([10, 20], pa.int64())})
    left = drop_empty_blocks(ray.data.from_arrow([empty, t1]))
    # all surviving blocks are non-empty
    assert left.count() == 2
    right = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                          "w": pa.array([7, 8, 9], pa.int64())}))
    # 16 partitions over 2 keys guarantees rowless partitions — the exact
    # shape that crashes unguarded (ArrowInvalid: No match for FieldRef 'k')
    out = left.join(right, "inner", 16, on=("k",)).take_all()
    assert sorted((r["k"], r["v"], r["w"]) for r in out) == \
        [(1, 10, 7), (2, 20, 8)]


def test_drop_empty_blocks_all_empty_keeps_schema(ray_session):
    import ray.data

    from janet_ray.stages.joins import drop_empty_blocks

    empty = pa.table({"k": pa.array([], pa.int64())})
    ds = drop_empty_blocks(ray.data.from_arrow([empty, empty]))
    assert ds.count() == 0
    assert ds.schema().names == ["k"]


def test_dup_clusters_lp_zero_edges(ray_session):
    """With no dup pairs every doc is its own component (and the join against
    an entirely-empty edge side is short-circuited, not crashed)."""
    import ray.data

    from janet_ray.stages.dedup import dup_clusters_distributed

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 7], pa.int64()),
        "text": pa.array(["a", "b", "c"], pa.string()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }))
    out = dup_clusters_distributed(docs, pairs).to_pandas()
    assert sorted(zip(out.doc_id, out.cluster_rep)) == [(1, 1), (3, 3), (7, 7)]


# ------------------------------------------------- broadcast_lookup_join

def test_lookup_join_inner_and_left(ray_session):
    import ray

    from janet_ray.stages.joins import broadcast_lookup_join

    big = ray.data.from_items([
        {"k": 1, "x": "a"}, {"k": 2, "x": "b"},
        {"k": 9, "x": "miss"}, {"k": 1, "x": "c"}])
    dim = ray.data.from_items([
        {"k": 1, "name": "one", "grp": "odd"},
        {"k": 2, "name": "two", "grp": "even"}])
    inner = broadcast_lookup_join(big, "k", dim).to_pandas()
    assert sorted(zip(inner.k, inner.x, inner.name, inner.grp)) == [
        (1, "a", "one", "odd"), (1, "c", "one", "odd"),
        (2, "b", "two", "even")]
    left = broadcast_lookup_join(big, "k", dim, how="left").to_pandas()
    assert len(left) == 4
    miss = left[left.k == 9]
    assert miss.name.isna().all() and miss.grp.isna().all()


def test_lookup_join_guards(ray_session):
    import pytest
    import ray

    from janet_ray.stages.joins import broadcast_lookup_join

    big = ray.data.from_items([{"k": 1, "x": 0}])
    dup = ray.data.from_items([{"k": 1, "v": 1}, {"k": 1, "v": 2}])
    with pytest.raises(ValueError, match="not unique"):
        broadcast_lookup_join(big, "k", dup).to_pandas()
    dim = ray.data.from_items([{"k": i, "v": i} for i in range(10)])
    with pytest.raises(ValueError, match="broadcast_limit"):
        broadcast_lookup_join(big, "k", dim, broadcast_limit=3).to_pandas()
    clash = ray.data.from_items([{"k": 1, "x": 5}])
    with pytest.raises(Exception, match="already exists"):
        broadcast_lookup_join(big, "k", clash).to_pandas()
    # ADVICE r04: a null dimension key would let null big-side keys match
    # (diverging from SQL equi-join, where null never equals null) — reject
    import pyarrow as pa

    nulldim = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None], pa.int64()), "v": [1, 2]}))
    with pytest.raises(ValueError, match="contains null"):
        broadcast_lookup_join(big, "k", nulldim).to_pandas()


def test_lookup_join_string_keys_and_subset_cols(ray_session):
    import ray

    from janet_ray.stages.joins import broadcast_lookup_join

    big = ray.data.from_items([{"host": "a.example", "n": 1},
                               {"host": "b.example", "n": 2}])
    dim = ray.data.from_items([
        {"host": "a.example", "tier": "good", "junk": "x"},
        {"host": "b.example", "tier": "bad", "junk": "y"}])
    out = broadcast_lookup_join(big, "host", dim,
                                attach_cols=["tier"]).to_pandas()
    assert sorted(zip(out.host, out.n, out.tier)) == [
        ("a.example", 1, "good"), ("b.example", 2, "bad")]
    assert "junk" not in out.columns
