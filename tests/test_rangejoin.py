"""Range join: brute-force parity (keyed + unkeyed), half-open boundaries,
bin-straddling intervals, partitioning invariance, skew guard, empty sides."""
import numpy as np
import pyarrow as pa

from janet_ray.stages.rangejoin import range_join


def _datasets(n_iv=40, n_pt=300, seed=3, keyed=True):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, 1000, n_iv).astype(np.int64)
    length = rng.randint(1, 120, n_iv).astype(np.int64)
    iv = pa.table({
        "iv_id": list(range(n_iv)),
        "k": (rng.randint(0, 5, n_iv).astype(np.int64) if keyed
              else np.zeros(n_iv, dtype=np.int64)),
        "start": s, "end": s + length,
    })
    pt = pa.table({
        "pt_id": list(range(n_pt)),
        "k": (rng.randint(0, 5, n_pt).astype(np.int64) if keyed
              else np.zeros(n_pt, dtype=np.int64)),
        "ts": rng.randint(0, 1100, n_pt).astype(np.int64),
    })
    return iv, pt


def _brute(iv: pa.Table, pt: pa.Table, keyed=True):
    out = set()
    for i in range(iv.num_rows):
        s, e = iv["start"][i].as_py(), iv["end"][i].as_py()
        ik, iid = iv["k"][i].as_py(), iv["iv_id"][i].as_py()
        for j in range(pt.num_rows):
            if keyed and pt["k"][j].as_py() != ik:
                continue
            if s <= pt["ts"][j].as_py() < e:
                out.add((iid, pt["pt_id"][j].as_py()))
    return out


def _run(iv, pt, *, keyed=True, bin_width=64, reparts=(1, 1)):
    import ray.data

    ivd = ray.data.from_arrow(iv).repartition(reparts[0])
    ptd = ray.data.from_arrow(pt).repartition(reparts[1])
    res = range_join(ivd, ptd, start_col="start", end_col="end", ts_col="ts",
                     key_col="k" if keyed else None, bin_width=bin_width,
                     left_cols=["iv_id"], right_cols=["pt_id"])
    return {(r["iv_id"], r["pt_id"]) for r in res.take_all()}


def test_keyed_parity(ray_session):
    iv, pt = _datasets()
    assert _run(iv, pt) == _brute(iv, pt)


def test_unkeyed_parity(ray_session):
    iv, pt = _datasets(keyed=False)
    assert _run(iv, pt, keyed=False) == _brute(iv, pt, keyed=False)


def test_half_open_and_bin_straddle(ray_session):
    # interval exactly on bin boundaries; point at start (in) and end (out)
    iv = pa.table({"iv_id": [0, 1], "k": [1, 1],
                   "start": pa.array([64, 100], pa.int64()),
                   "end": pa.array([128, 260], pa.int64())})
    pt = pa.table({"pt_id": [0, 1, 2, 3, 4], "k": [1, 1, 1, 1, 2],
                   "ts": pa.array([64, 127, 128, 259, 110], pa.int64())})
    got = _run(iv, pt, bin_width=64)
    # ts=end excluded; k=2 never matches; ts=127 is inside BOTH intervals
    assert got == {(0, 0), (0, 1), (1, 1), (1, 2), (1, 3)}


def test_partitioning_invariance(ray_session):
    iv, pt = _datasets(seed=9)
    a = _run(iv, pt, reparts=(1, 1), bin_width=32)
    b = _run(iv, pt, reparts=(7, 11), bin_width=256)
    assert a == b == _brute(iv, pt)


def test_timestamp_columns(ray_session):
    import ray.data

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hour = np.timedelta64(3_600_000_000, "us")
    iv = pa.table({"iv_id": [0], "k": [7],
                   "start": pa.array(np.array([base + hour])),
                   "end": pa.array(np.array([base + 3 * hour]))})
    pt = pa.table({"pt_id": [0, 1, 2], "k": [7, 7, 7],
                   "ts": pa.array(np.array([base, base + hour,
                                            base + 2 * hour]))})
    hour = 3_600_000_000
    res = range_join(ray.data.from_arrow(iv), ray.data.from_arrow(pt),
                     start_col="start", end_col="end", ts_col="ts",
                     key_col="k", bin_width=hour,
                     left_cols=["iv_id"], right_cols=["pt_id"])
    assert {(r["iv_id"], r["pt_id"]) for r in res.take_all()} == {(0, 1), (0, 2)}


def test_skew_guard_raises(ray_session):
    import ray.data

    iv = pa.table({"iv_id": [0], "k": [0],
                   "start": pa.array([0], pa.int64()),
                   "end": pa.array([10_000_000], pa.int64())})
    pt = pa.table({"pt_id": [0], "k": [0], "ts": pa.array([5], pa.int64())})
    try:
        range_join(ray.data.from_arrow(iv), ray.data.from_arrow(pt),
                   start_col="start", end_col="end", ts_col="ts",
                   bin_width=1, left_cols=["iv_id"],
                   right_cols=["pt_id"]).take_all()
        assert False, "expected the bins-per-interval guard"
    except Exception as exc:  # Ray wraps the worker ValueError
        assert "max_bins_per_interval" in str(exc)


def test_projection_overlap_raises(ray_session):
    import ray.data

    iv, pt = _datasets(n_iv=2, n_pt=2)
    try:
        range_join(ray.data.from_arrow(iv), ray.data.from_arrow(pt),
                   start_col="start", end_col="end", ts_col="ts",
                   key_col="k", bin_width=10)
        # defaults put k on the left only — no overlap, so force one:
        range_join(ray.data.from_arrow(iv), ray.data.from_arrow(pt),
                   start_col="start", end_col="end", ts_col="ts",
                   key_col="k", bin_width=10,
                   left_cols=["iv_id", "k"], right_cols=["pt_id", "k"])
        assert False
    except ValueError as exc:
        assert "overlap" in str(exc)
