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
