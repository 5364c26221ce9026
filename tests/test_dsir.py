"""DSIR importance resampling (stages/dsir.py): exact distributed feature
counts (partition-invariant), reference score parity, deterministic
content-addressed Gumbel-top-k selection."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from janet_ray.stages.dsir import (_batch_bucket_counts, _gumbel, _md5_u32,
                                   doc_features, dsir_select, feature_counts,
                                   log_ratio_weights, score)

TARGET = ["the quick brown fox jumps over the lazy dog",
          "a stitch in time saves nine said the tailor",
          "the rain in spain stays mainly on the plain"]
JUNK = ["zzz qqq xxx www zzz qqq", "buy now click here buy now",
        "qqq www zzz xxx qqq www zzz"]
RAW = TARGET[:1] + JUNK + ["the quick dog jumps over the brown fox again"]


def _local_counts(docs, nb):
    acc = np.zeros(nb, dtype=np.int64)
    cnt = Counter()
    for t in docs:
        cnt.update(doc_features(t))
    for f, c in cnt.items():
        acc[_md5_u32(f) % nb] += c
    return acc


def test_doc_features():
    assert doc_features("Ab, cd!") == ["ab", "cd", "ab cd"]
    assert doc_features("") == []
    assert doc_features(None) == []
    assert doc_features("one") == ["one"]


def test_feature_counts_distributed_matches_local(ray_session):
    import ray

    nb = 128
    ds = ray.data.from_items([{"text": t} for t in TARGET * 20])
    c1 = feature_counts(ds, n_buckets=nb)
    c2 = feature_counts(ds.repartition(5), n_buckets=nb)
    assert np.array_equal(c1, c2)                       # partition-invariant
    assert np.array_equal(c1, _local_counts(TARGET * 20, nb))
    # total features = tokens + bigrams = 2·tokens − 1 per doc
    n_tok = sum(len(t.split()) for t in TARGET) * 20
    assert c1.sum() == 2 * n_tok - 20 * len(TARGET)


def test_log_ratio_direction():
    nb = 64
    t = _local_counts(TARGET * 10, nb)
    r = _local_counts(TARGET + JUNK * 10, nb)
    lam = log_ratio_weights(t, r)
    b_target = _md5_u32("quick") % nb
    b_junk = _md5_u32("zzz") % nb
    assert lam[b_target] > lam[b_junk]


def test_score_parity(ray_session):
    import ray

    nb = 128
    lam = log_ratio_weights(_local_counts(TARGET, nb),
                            _local_counts(RAW, nb))
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(RAW)]).repartition(3)
    got = {r["doc_id"]: r["logw"]
           for r in score(ds, lam).iter_rows()}
    for i, t in enumerate(RAW):
        want = sum(lam[_md5_u32(f) % nb] for f in doc_features(t))
        assert math.isclose(got[i], want, rel_tol=0, abs_tol=1e-9)


def test_select_prefers_target_like(ray_session):
    import ray

    nb = 256
    lam = log_ratio_weights(_local_counts(TARGET * 5, nb),
                            _local_counts(RAW * 5, nb))
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(RAW)]).repartition(2)
    top = dsir_select(ds, lam, 2, gumbel=False).to_pandas()
    texts = {RAW[i] for i in top["doc_id"]}
    assert texts <= set(TARGET[:1] + [RAW[-1]])         # target-like docs win
    # keys are sorted descending, deterministic tie-break on doc_id
    assert list(top["key"]) == sorted(top["key"], reverse=True)


def test_select_gumbel_deterministic(ray_session):
    import ray

    nb = 64
    lam = np.zeros(nb)                                  # pure Gumbel ordering
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(RAW * 3)])
    a = dsir_select(ds, lam, 4, seed=7).to_pandas()
    b = dsir_select(ds, lam, 4, seed=7).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])       # reproducible
    want = sorted(range(len(RAW * 3)),
                  key=lambda d: (-_gumbel(d, 7), d))[:4]
    assert list(a["doc_id"]) == want                    # content-addressed


def test_empty(ray_session):
    import ray

    ds = ray.data.from_items([{"doc_id": 1, "text": "x"}]).filter(
        lambda r: False)
    assert feature_counts(ds, n_buckets=16).sum() == 0
    lam = np.zeros(16)
    assert dsir_select(ds, lam, 3).count() == 0
