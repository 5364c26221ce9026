"""Count-Min sketch (stages/cms.py): overestimate-only guarantee, error
bound, determinism under repartitioning, merge linearity."""

import numpy as np

from janet_ray.stages.cms import (cms_build, cms_params, cms_query,
                                  _key_u64, _row_indexes)


def _local_build(keys, d, w):
    acc = np.zeros((d, w), dtype=np.int64)
    idx = _row_indexes(_key_u64(keys), d, w)
    for r in range(d):
        np.add.at(acc[r], idx[r], 1)
    return acc


def test_params():
    d, w = cms_params(0.001, 0.01)
    assert d == 5 and w == 2719


def test_never_underestimates_and_bounded():
    rng = np.random.RandomState(5)
    # zipf-ish key stream
    keys = [f"k{int(z)}" for z in rng.zipf(1.5, 50000)]
    d, w = cms_params(0.001, 0.01)
    sk = _local_build(keys, d, w)
    from collections import Counter

    truth = Counter(keys)
    qs = list(truth)[:200]
    est = cms_query(sk, qs)
    n = len(keys)
    for k, e in zip(qs, est):
        assert e >= truth[k]                      # overestimate only
        assert e - truth[k] <= 0.002 * n          # 2x the eps bound slack


def test_distributed_matches_local(ray_session):
    import ray

    keys = [f"t{i % 300}" for i in range(20000)]
    ds1 = ray.data.from_items([{"k": k} for k in keys])
    sk1 = cms_build(ds1, "k", eps=0.001)
    sk2 = cms_build(ds1.repartition(3), "k", eps=0.001)
    assert np.array_equal(sk1, sk2)               # partition-invariant
    d, w = cms_params(0.001)
    assert np.array_equal(sk1, _local_build(keys, d, w))
    est = cms_query(sk1, ["t0", "t299", "missing"])
    assert est[0] >= 67 and est[1] >= 66
    assert est[2] <= 0.002 * 20000                # absent key stays small


def test_empty(ray_session):
    import ray

    ds = ray.data.from_items([{"k": "x"}]).filter(lambda r: False)
    sk = cms_build(ds, "k")
    assert sk.sum() == 0
    assert cms_query(sk, []).size == 0


def test_base_hash_is_64_bit():
    # these two tokens collide on the 32-bit md5 prefix; a 32-bit base hash
    # would alias them in EVERY row and min-over-rows could never separate
    # them (the review's reproduced guarantee break)
    import hashlib

    a, b = "tok94533", "tok129055"
    assert hashlib.md5(a.encode()).hexdigest()[:8] == \
        hashlib.md5(b.encode()).hexdigest()[:8]
    ka, kb = _key_u64([a]), _key_u64([b])
    assert ka[0] != kb[0]
    d, w = cms_params(0.001, 0.01)
    sk = _local_build([a] * 100, d, w)
    assert cms_query(sk, [b])[0] < 100  # no longer fully aliased


# --- Misra-Gries + CMS heavy-hitter protocol ------------------------------

def _zipf_keys(n=30000, seed=7):
    rng = np.random.RandomState(seed)
    return [f"k{int(z)}" for z in rng.zipf(1.3, n)]


def test_mg_prune_local_bound():
    from collections import Counter

    from janet_ray.stages.cms import _mg_prune

    keys = _zipf_keys()
    truth = Counter(keys)
    words = np.asarray(list(truth), dtype=object)
    counts = np.asarray([truth[w] for w in words], dtype=np.int64)
    m = 50
    pw, pct = _mg_prune(words, counts, m)
    assert len(pw) <= m
    kept = dict(zip(pw.tolist(), pct.tolist()))
    n = len(keys)
    for w, c in truth.items():
        got = kept.get(w, 0)
        assert got <= c                      # never overcounts
        assert c - got <= n / (m + 1)        # MG error bound
        if c > n / (m + 1):
            assert w in kept                 # recall guarantee


def test_mg_summary_distributed(ray_session):
    from collections import Counter

    import ray

    from janet_ray.stages.cms import mg_summary

    keys = _zipf_keys()
    truth = Counter(keys)
    n = len(keys)
    m = 64
    ds = ray.data.from_items([{"k": k} for k in keys])
    for parts in (2, 7):
        tbl = mg_summary(ds.repartition(parts), "k", m=m)
        got = dict(zip(tbl["key"].to_pylist(), tbl["n_mg"].to_pylist()))
        assert len(got) <= m
        for w, c in truth.items():
            g = got.get(w, 0)
            assert g <= c
            assert c - g <= n / (m + 1)      # bound holds under any merge order
            if c > n / (m + 1):
                assert w in got


def test_heavy_hitters_sandwich(ray_session):
    from collections import Counter

    import ray

    from janet_ray.stages.cms import heavy_hitters

    keys = _zipf_keys()
    truth = Counter(keys)
    ds = ray.data.from_items([{"k": k} for k in keys]).repartition(4)
    k = 10
    hh = heavy_hitters(ds, "k", k, m=256, eps=0.001)
    assert hh.num_rows == k
    assert hh["n_stream"][0].as_py() == len(keys)
    exact_top = sorted(truth, key=lambda w: (-truth[w], w))[:k]
    got_keys = hh["key"].to_pylist()
    assert set(exact_top) <= set(got_keys)   # candidates recover the true top-k
    for w, lo, hi in zip(got_keys, hh["n_mg"].to_pylist(), hh["n_cms"].to_pylist()):
        assert lo <= truth[w] <= hi          # the sandwich


def test_heavy_hitters_empty(ray_session):
    import ray

    from janet_ray.stages.cms import heavy_hitters, mg_summary

    ds = ray.data.from_items([{"k": "x"}]).filter(lambda r: False)
    assert mg_summary(ds, "k", m=8).num_rows == 0
    hh = heavy_hitters(ds, "k", 5)
    assert hh.num_rows == 0
