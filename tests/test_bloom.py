"""Bloom-filter dedup (stages/bloom.py): the no-false-negative guarantee,
the bounded false-positive rate, sizing math, and the distributed
build/filter round trip."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.stages.bloom import (
    _probe_indexes,
    _set_bits,
    _test_bits,
    bloom_filter_new,
    bloom_params,
    build_bloom,
)


def test_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m & (m - 1) == 0          # power of two
    assert m >= 9585                  # textbook bits for n=1000, p=1%
    assert 1 <= k <= 20
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_no_false_negatives_local(keys):
    m, k = bloom_params(max(len(keys), 16), 0.01)
    bm = np.zeros(m >> 6, dtype=np.uint64)
    arr = np.array(keys, dtype=np.int64)
    _set_bits(bm, _probe_indexes(arr, m, k))
    assert _test_bits(bm, _probe_indexes(arr, m, k)).all()


def test_fp_rate_bounded():
    rng_n = 20_000
    seen = np.arange(rng_n, dtype=np.int64)
    fresh = np.arange(rng_n, 2 * rng_n, dtype=np.int64)
    m, k = bloom_params(rng_n, 0.01)
    bm = np.zeros(m >> 6, dtype=np.uint64)
    _set_bits(bm, _probe_indexes(seen, m, k))
    fp = _test_bits(bm, _probe_indexes(fresh, m, k)).mean()
    assert fp < 0.03  # 3x headroom over the 1% design point


def test_distributed_build_and_filter(ray_session):
    import ray

    seen = ray.data.from_items(
        [{"fp": i} for i in range(0, 5000, 2)])          # evens are seen
    new = ray.data.from_items(
        [{"fp": i} for i in range(0, 5000)])             # evens + odds
    out = bloom_filter_new(new, seen, col="fp", n_expected=2500,
                           fp_rate=0.01).to_pandas()
    kept = set(out["fp"])
    # no false negatives: every seen (even) key was dropped
    assert not any(f % 2 == 0 for f in kept)
    # bounded FP loss: most odd keys survive
    assert len(kept) > 2500 * 0.95


def test_empty_seen_set(ray_session):
    import ray

    seen = ray.data.from_items([{"fp": 1}]).filter(lambda r: False)
    new = ray.data.from_items([{"fp": i} for i in range(10)])
    bm = build_bloom(seen, "fp", n_expected=16)
    assert bm.sum() == 0
    out = bloom_filter_new(new, seen, col="fp", n_expected=16).to_pandas()
    assert len(out) == 10
