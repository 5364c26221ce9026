"""Per-key quota sampling (stages/quota.py): reference parity, determinism
under repartitioning, map-side combiner correctness, skew bound."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from janet_ray.stages.quota import quota_sample


def _md5_rank(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def _reference(rows, key, idc, quota):
    by_key = {}
    for r in rows:
        by_key.setdefault(r[key], []).append(r)
    out = []
    for k, rs in by_key.items():
        rs.sort(key=lambda r: (_md5_rank(r[idc]), r[idc]))
        out.extend(rs[:quota])
    return {(r[key], r[idc]) for r in out}


def _rows(n, n_keys, seed=7):
    rng = np.random.RandomState(seed)
    return [{"host": f"h{rng.randint(n_keys)}.example", "doc_id": int(i),
             "payload": f"text-{i}"} for i in range(n)]


def test_matches_reference(ray_session):
    import ray

    rows = _rows(500, 9)
    for quota in (1, 3, 10, 1000):
        got = quota_sample(ray.data.from_items(rows), key_col="host",
                           quota=quota).to_pandas()
        assert {(r.host, r.doc_id) for r in got.itertuples()} == \
            _reference(rows, "host", "doc_id", quota), quota
        # all columns pass through
        assert set(got.columns) == {"host", "doc_id", "payload"}


def test_deterministic_under_repartition(ray_session):
    import ray

    rows = _rows(400, 5, seed=13)
    a = quota_sample(ray.data.from_items(rows).repartition(2),
                     key_col="host", quota=4).to_pandas()
    b = quota_sample(ray.data.from_items(rows).repartition(17),
                     key_col="host", quota=4).to_pandas()
    key = lambda df: sorted(zip(df.host, df.doc_id))
    assert key(a) == key(b)
    assert key(a) == sorted(_reference(rows, "host", "doc_id", 4))


def test_hot_key_combiner_bounds_shuffle(ray_session):
    """One host owning 95% of rows: the output is exactly quota rows for it,
    and the map-side precut means the shuffle never carries its full volume
    (asserted indirectly: tiny quota over many batches still exact)."""
    import ray

    rows = ([{"host": "hot.example", "doc_id": i} for i in range(1900)]
            + [{"host": f"h{i}.example", "doc_id": 10_000 + i}
               for i in range(100)])
    got = quota_sample(ray.data.from_items(rows).repartition(23),
                       key_col="host", quota=5).to_pandas()
    assert (got.host == "hot.example").sum() == 5
    assert len(got) == 5 + 100
    assert {(r.host, r.doc_id) for r in got.itertuples()} == \
        _reference(rows, "host", "doc_id", 5)


def test_with_rank_and_string_ids(ray_session):
    import ray

    rows = [{"host": "a", "doc_id": f"u-{i}"} for i in range(20)]
    got = quota_sample(ray.data.from_items(rows), key_col="host", quota=6,
                       with_rank=True).to_pandas().sort_values("qrank")
    assert list(got.qrank) == list(range(6))
    want = sorted(rows, key=lambda r: (_md5_rank(r["doc_id"]), r["doc_id"]))
    assert list(got.doc_id) == [r["doc_id"] for r in want[:6]]


def test_quota_validation(ray_session):
    import ray

    with pytest.raises(ValueError):
        quota_sample(ray.data.from_items([{"host": "a", "doc_id": 1}]),
                     key_col="host", quota=0)


def test_dispatch_paths_parity(ray_session):
    """Forced small-path (single-task final cut) and shuffle-path outputs
    must be identical (the engine's scale-adaptive dispatch rule)."""
    import ray

    rows = _rows(600, 11, seed=3)
    ds = ray.data.from_items(rows).repartition(9)
    a = quota_sample(ds, key_col="host", quota=4,
                     force_dispatch="small").to_pandas()
    b = quota_sample(ds, key_col="host", quota=4,
                     force_dispatch="shuffle").to_pandas()
    key = lambda df: sorted(zip(df.host, df.doc_id))
    assert key(a) == key(b) == sorted(_reference(rows, "host", "doc_id", 4))
