"""Deterministic shuffle-shards: permutation validity, rerun/partitioning
invariance, seed independence, string ids, pass-through columns."""
import hashlib

import numpy as np
import pyarrow as pa

from janet_ray.stages import shards


def _table(n=120, ids=None):
    ids = list(range(n)) if ids is None else ids
    return pa.table({"doc_id": ids, "payload": [f"p{i}" for i in ids]})


def _expected(ids, n_shards, seed):
    h = {i: int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
         for i in ids}
    out = {}
    for s in range(n_shards):
        members = sorted((i for i in ids if h[i] % n_shards == s),
                         key=lambda i: (h[i], i))
        for pos, i in enumerate(members):
            out[i] = (s, pos)
    return out


def test_permutation_exact(ray_session):
    import ray.data

    t = _table(200)
    out = shards.shuffle_shards(ray.data.from_arrow(t).repartition(7),
                                n_shards=8, seed=0).take_all()
    want = _expected(list(range(200)), 8, 0)
    assert len(out) == 200
    for r in out:
        assert (r["shard"], r["pos"]) == want[r["doc_id"]], r
        assert r["payload"] == f"p{r['doc_id']}"  # columns pass through
    # every shard's positions are exactly 0..len-1 (a valid permutation)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 200
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s


def test_partitioning_and_rerun_invariance(ray_session):
    import ray.data

    t = _table(150)
    a = shards.shuffle_shards(ray.data.from_arrow(t), n_shards=4, seed=3).take_all()
    b = shards.shuffle_shards(ray.data.from_arrow(t).repartition(13),
                              n_shards=4, seed=3).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_seed_changes_permutation(ray_session):
    import ray.data

    t = _table(300)
    a = shards.shuffle_shards(ray.data.from_arrow(t), n_shards=8, seed=0).take_all()
    b = shards.shuffle_shards(ray.data.from_arrow(t), n_shards=8, seed=1).take_all()
    pa_ = {r["doc_id"]: (r["shard"], r["pos"]) for r in a}
    pb = {r["doc_id"]: (r["shard"], r["pos"]) for r in b}
    assert sum(pa_[i] != pb[i] for i in pa_) > 200  # epochs differ broadly


def test_string_ids(ray_session):
    import ray.data

    ids = [f"doc-{i:03d}" for i in range(60)]
    t = pa.table({"doc_id": ids})
    out = shards.shuffle_shards(ray.data.from_arrow(t), n_shards=3, seed=7).take_all()
    want = _expected(ids, 3, 7)
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in out} == want


def test_shard_balance(ray_session):
    """md5 avalanche keeps shards near-uniform — the skew property that makes
    shard files loader-safe."""
    import ray.data

    t = _table(4000)
    out = shards.shuffle_shards(ray.data.from_arrow(t), n_shards=8, seed=0).take_all()
    sizes = np.bincount([r["shard"] for r in out], minlength=8)
    assert sizes.min() > 0.8 * 4000 / 8 and sizes.max() < 1.2 * 4000 / 8, sizes
