"""Crawl-snapshot diff (stages/snapshot.py): reference parity on all four
outcomes, O(delta) output, duplicate-key min-fp pin, int-key cast,
repartition invariance."""

import pyarrow as pa

from janet_ray.stages.snapshot import snapshot_diff


def _ds(rows):
    import ray

    return ray.data.from_items(rows)


def _got(old_rows, new_rows, **kw):
    df = snapshot_diff(_ds(old_rows), _ds(new_rows), **kw).to_pandas()
    return {(r.url, r.status, r.old_fp, r.new_fp) for r in df.itertuples()}


def test_all_statuses(ray_session):
    old = [{"url": "a", "fp": "1"}, {"url": "b", "fp": "2"},
           {"url": "c", "fp": "3"}, {"url": "d", "fp": "4"}]
    new = [{"url": "a", "fp": "1"},            # unchanged → dropped
           {"url": "b", "fp": "2x"},           # changed
           {"url": "d", "fp": "4"},            # unchanged
           {"url": "e", "fp": "5"}]            # added; c removed
    assert _got(old, new) == {
        ("b", "changed", "2", "2x"),
        ("c", "removed", "3", None),
        ("e", "added", None, "5"),
    }


def test_identical_snapshots_empty_delta(ray_session):
    rows = [{"url": f"u{i}", "fp": f"f{i}"} for i in range(50)]
    assert _got(rows, list(rows)) == set()


def test_duplicate_keys_pin_min_fp(ray_session):
    # within one side, a duplicated key resolves to the MIN fingerprint
    old = [{"url": "a", "fp": "9"}, {"url": "a", "fp": "3"}]
    new = [{"url": "a", "fp": "5"}]
    assert _got(old, new) == {("a", "changed", "3", "5")}
    # min picks the same fp on both sides → unchanged → empty
    assert _got(old, [{"url": "a", "fp": "3"}, {"url": "a", "fp": "7"}]) \
        == set()


def test_int_keys_cast_to_string(ray_session):
    old = [{"url": 1, "fp": "x"}, {"url": 2, "fp": "y"}]
    new = [{"url": 2, "fp": "y2"}]
    assert _got(old, new) == {("1", "removed", "x", None),
                              ("2", "changed", "y", "y2")}


def test_repartition_invariance(ray_session):
    old = [{"url": f"u{i}", "fp": f"f{i}"} for i in range(200)]
    new = ([{"url": f"u{i}", "fp": f"f{i}"} for i in range(0, 200, 2)]
           + [{"url": f"u{i}", "fp": "mod"} for i in range(1, 200, 4)]
           + [{"url": f"n{i}", "fp": "nf"} for i in range(7)])
    a = _got(old, new)
    b = snapshot_diff(_ds(old).repartition(13), _ds(new).repartition(3),
                      n_parts=5).to_pandas()
    assert a == {(r.url, r.status, r.old_fp, r.new_fp)
                 for r in b.itertuples()}
    # O(delta): every unchanged url (half the corpus) is absent
    assert len(a) == 50 + 50 + 7  # changed(i%4==1) + removed(i%4==3) + added
