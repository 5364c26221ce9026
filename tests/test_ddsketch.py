"""DDSketch quantiles (stages/ddsketch.py): α relative-error bound vs
exact, determinism under repartitioning, merge additivity, sign/zero
handling."""

import numpy as np
import pytest

from janet_ray.stages.ddsketch import (_bins, _gamma, dd_build, dd_quantile,
                                       dd_quantiles)

QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _exact_q(vals, q):
    vals = np.sort(np.asarray(vals, dtype=np.float64))
    rank = max(1, int(np.ceil(q * len(vals))))
    return vals[rank - 1]


def _local_sketch(vals, alpha):
    return _bins(np.asarray(vals, dtype=np.float64), _gamma(alpha))


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "ints"])
def test_alpha_bound_local(dist):
    rng = np.random.RandomState(7)
    vals = {"uniform": rng.uniform(1, 1000, 20000),
            "lognormal": rng.lognormal(3, 2, 20000),
            "ints": rng.randint(1, 10**6, 20000).astype(float)}[dist]
    alpha = 0.01
    sk = _local_sketch(vals, alpha)
    for q in QS:
        want = _exact_q(vals, q)
        got = dd_quantile(sk, q, alpha=alpha)
        assert abs(got - want) <= alpha * 1.01 * abs(want)


def test_signs_and_zero():
    vals = [-100.0, -1.0, 0.0, 0.0, 1.0, 100.0]
    sk = _local_sketch(vals, 0.01)
    assert dd_quantile(sk, 0.01, alpha=0.01) == pytest.approx(-100, rel=0.02)
    assert dd_quantile(sk, 0.5, alpha=0.01) == 0.0
    assert dd_quantile(sk, 1.0, alpha=0.01) == pytest.approx(100, rel=0.02)


def test_distributed_deterministic_and_bounded(ray_session):
    import ray

    rng = np.random.RandomState(11)
    vals = rng.lognormal(4, 1.5, 30000)
    # two different partitionings must give the IDENTICAL sketch
    ds1 = ray.data.from_items([{"v": float(v)} for v in vals])
    ds2 = ds1.repartition(3)
    sk1 = dd_build(ds1, "v")
    sk2 = dd_build(ds2, "v")
    assert sk1 == sk2
    assert sum(sk1.values()) == 30000
    for q in QS:
        want = _exact_q(vals, q)
        got = dd_quantile(sk1, q)
        assert abs(got - want) <= 0.0101 * abs(want)


def test_merge_additivity():
    a = _local_sketch([1.0, 2.0, 3.0], 0.01)
    b = _local_sketch([4.0, 5.0], 0.01)
    whole = _local_sketch([1.0, 2.0, 3.0, 4.0, 5.0], 0.01)
    merged = dict(a)
    for k, n in b.items():
        merged[k] = merged.get(k, 0) + n
    assert merged == whole


def test_empty(ray_session):
    import ray

    ds = ray.data.from_items([{"v": 1.0}]).filter(lambda r: False)
    assert dd_build(ds, "v") == {}
    assert np.isnan(dd_quantile({}, 0.5))
    assert dd_quantiles(ds, "v", [0.5]) and np.isnan(
        dd_quantiles(ds, "v", [0.5])[0])


def test_nonfinite_values_dropped(ray_session):
    import ray

    vals = [1.0, float("inf"), 2.0, float("-inf"), float("nan"), 3.0]
    ds = ray.data.from_items([{"v": v} for v in vals])
    sk = dd_build(ds, "v")
    assert sum(sk.values()) == 3  # only the finite values count
    assert dd_quantile(sk, 0.0) == pytest.approx(1.0, rel=0.02)
    assert dd_quantile(sk, 1.0) == pytest.approx(3.0, rel=0.02)
