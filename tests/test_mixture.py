"""Domain-mixture sampling (stages/mixture.py): Hamilton apportionment,
deterministic hash-rank draws, shortfall and zero-weight semantics."""

import hashlib

import pyarrow as pa

from janet_ray.stages.mixture import mixture_quotas, mixture_sample


def test_quotas_largest_remainder():
    q = mixture_quotas({"a": 0.5, "b": 0.3, "c": 0.2}, 10)
    assert q == {"a": 5, "b": 3, "c": 2}
    # 7 units over thirds: floors 2/2/2, remainder 1 → tie on fraction,
    # name-ascending tie-break hands it to 'a'
    q = mixture_quotas({"a": 1, "b": 1, "c": 1}, 7)
    assert q == {"a": 3, "b": 2, "c": 2} and sum(q.values()) == 7
    assert mixture_quotas({}, 5) == {}
    assert mixture_quotas({"a": 1.0}, 0) == {"a": 0}
    # un-normalized weights normalize
    assert mixture_quotas({"a": 2, "b": 2}, 4) == {"a": 2, "b": 2}


def _rank_order(ids):
    return sorted(ids, key=lambda i: (
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i))


def test_mixture_sample(ray_session):
    import ray

    rows = [{"g": g, "doc_id": i + off, }
            for g, off, n in (("a", 0, 20), ("b", 100, 20), ("c", 200, 3))
            for i in range(n)]
    ds = ray.data.from_items(rows).repartition(4)
    quotas = {"a": 5, "b": 2, "c": 10}          # c is short (3 < 10)
    out = mixture_sample(ds, "g", quotas).to_pandas()
    by_g = {g: sorted(d["doc_id"]) for g, d in out.groupby("g")}
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 2
    assert len(by_g["c"]) == 3                  # shortfall: all rows, no refill
    # the draw is the content-addressed rank order
    assert by_g["a"] == sorted(_rank_order(range(20))[:5])
    assert by_g["b"] == sorted(_rank_order(range(100, 120))[:2])
    # ranks are 1-based within group
    assert set(out[out["g"] == "b"]["rank"]) == {1, 2}
    # unweighted group drops
    out2 = mixture_sample(ds, "g", {"a": 1}).to_pandas()
    assert set(out2["g"]) == {"a"} and len(out2) == 1


def test_mixture_sample_zero(ray_session):
    import ray

    ds = ray.data.from_items([{"g": "a", "doc_id": 1}])
    assert mixture_sample(ds, "g", {}).count() == 0
    assert mixture_sample(ds, "g", {"a": 0}).count() == 0
