"""HyperLogLog sketch (stages/sketch.py): determinism / partition
invariance, error bounds at several cardinalities, merge semantics."""

import numpy as np
import pytest

from janet_ray.stages.sketch import _ranks, hll_build, hll_distinct, hll_estimate


def _reference_regs(keys, p):
    regs = np.zeros(1 << p, dtype=np.uint8)
    idx, rank = _ranks(np.asarray(keys, dtype=np.int64), p)
    np.maximum.at(regs, idx, rank)
    return regs


def test_rank_kernel_properties():
    keys = np.arange(100000, dtype=np.int64)
    idx, rank = _ranks(keys, 14)
    assert idx.min() >= 0 and idx.max() < (1 << 14)
    assert rank.min() >= 1 and rank.max() <= 64 - 14 + 1
    # geometric distribution sanity: about half the ranks are 1
    assert 0.4 < float(np.mean(rank == 1)) < 0.6


@pytest.mark.parametrize("n", [100, 5000, 200000])
def test_error_bound(n):
    regs = _reference_regs(np.arange(n, dtype=np.int64) * 7919 + 13, 14)
    est = hll_estimate(regs)
    # ~0.8% std error at p=14; allow 5 sigma
    assert abs(est - n) / n < 0.05


def test_distributed_matches_reference(ray_session):
    import ray

    keys = (np.arange(30000, dtype=np.int64) % 9000) * 104729
    ds = ray.data.from_items([{"k": int(k)} for k in keys])
    regs = hll_build(ds, "k", p=12)
    want = _reference_regs(keys, 12)
    # register-exact parity: max is order/partition independent
    assert np.array_equal(regs, want)
    est = hll_distinct(ds, "k", p=12)
    assert abs(est - 9000) / 9000 < 0.1


def test_empty_dataset(ray_session):
    import ray

    ds = ray.data.from_items([{"k": 1}]).filter(lambda r: False)
    assert hll_distinct(ds, "k") == 0


def test_null_keys_ignored(ray_session):
    import pyarrow as pa
    import ray

    t = pa.table({"k": pa.array([1, 2, None, 2, None], pa.int64())})
    ds = ray.data.from_arrow(t)
    # nulls must not mint a phantom distinct value
    assert hll_distinct(ds, "k", p=12) == 2
