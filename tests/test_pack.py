"""Sequence packing (stages/pack.py): kernel vs a plain next-fit reference,
distributed == single-process, determinism under batch boundaries."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.stages.pack import pack_kernel, pack_sequences


def _next_fit_reference(counts, budget):
    """The obvious sequential next-fit loop (the CTE oracle's semantics)."""
    bins, b, running = [], 0, 0
    for i, n in enumerate(counts):
        if i > 0 and running + n > budget:
            b += 1
            running = 0
        running += n
        bins.append(b)
    return bins


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=300),
       st.integers(min_value=1, max_value=600))
def test_kernel_matches_next_fit_reference(counts, budget):
    order = np.arange(len(counts), dtype=np.int64)
    perm, bins = pack_kernel(order, np.array(counts, dtype=np.int64), budget)
    assert list(order[perm]) == list(order)  # already sorted input
    assert list(bins) == _next_fit_reference(counts, budget)


def test_kernel_sorts_by_order_key():
    order = np.array([30, 10, 20], dtype=np.int64)
    counts = np.array([5, 5, 5], dtype=np.int64)
    perm, bins = pack_kernel(order, counts, budget=10)
    assert list(order[perm]) == [10, 20, 30]
    assert list(bins) == [0, 0, 1]


def test_oversized_doc_gets_own_bin():
    counts = np.array([100, 9999, 100], dtype=np.int64)
    _, bins = pack_kernel(np.arange(3, dtype=np.int64), counts, budget=512)
    assert list(bins) == [0, 1, 2]
    # oversized FIRST doc also packs alone
    _, bins = pack_kernel(np.arange(2, dtype=np.int64),
                          np.array([9999, 1], dtype=np.int64), budget=512)
    assert list(bins) == [0, 1]


def test_bin_totals_respect_budget():
    rng = np.random.RandomState(7)
    counts = rng.randint(1, 300, size=500).astype(np.int64)
    _, bins = pack_kernel(np.arange(500, dtype=np.int64), counts, budget=512)
    for b in np.unique(bins):
        total = counts[bins == b].sum()
        assert total <= 512 or (bins == b).sum() == 1  # only oversized exceed


def test_distributed_matches_kernel(ray_session):
    import ray

    rng = np.random.RandomState(11)
    ids = np.arange(2500, dtype=np.int64)
    counts = rng.randint(0, 200, size=2500).astype(np.int64)
    t = pa.table({"doc_id": ids, "n_tokens": counts})
    # many small blocks → partitions straddle batch boundaries
    out = pack_sequences(ray.data.from_arrow(t).repartition(13),
                         budget=512, part_range=400).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 2500
    for part in sorted(out["part"].unique()):
        sel = out[out["part"] == part]
        lo, hi = part * 400, (part + 1) * 400
        assert ((sel["doc_id"] >= lo) & (sel["doc_id"] < hi)).all()
        want = _next_fit_reference(
            counts[sel["doc_id"].to_numpy()], 512)
        assert list(sel.sort_values("doc_id")["bin"]) == want


def test_empty_counts_pack_together(ray_session):
    # zero-token docs cost nothing and share bins
    _, bins = pack_kernel(np.arange(5, dtype=np.int64),
                          np.zeros(5, dtype=np.int64), budget=1)
    assert list(bins) == [0] * 5
