"""Sequence packing — greedy fixed-token-budget bin packing for training
batches (SURVEY §2.11 family; no reference analogue — this is the step a
training-data pipeline runs right before tokenized examples are written:
concatenate documents into budget-sized sequences with no padding waste).

Semantics (exactly reproducible in SQL, so the query is oracle-checked):
documents are processed in ``order_col`` order; each bin is the maximal
prefix of remaining documents whose token total stays ≤ ``budget``; a single
document larger than the budget gets its own bin (the caller chunks or drops
oversized docs upstream — quality_filter already bounds doc length). This is
classic next-fit: deterministic, single-pass, and — unlike best-fit — stable
under streaming.

Scale shape: packing is inherently sequential, so the corpus is partitioned
into deterministic ``order_col`` ranges (``part = order // part_range`` — a
pure function of the row, independent of cluster size, same contract as the
resume partition ids) and each range packs independently after ONE coarse
hash shuffle. Bin ids are (part, bin) pairs — globally unique without any
cross-partition coordination. The within-partition kernel is O(#bins · log n)
via searchsorted over the token cumsum (not a per-row Python loop): each
step gallops to the last document that still fits the open bin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_kernel(order: np.ndarray, counts: np.ndarray, budget: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """(sorted order keys, token counts) → (sort permutation, bin ids).

    Returns the permutation that sorts by ``order`` and the 0-based bin id per
    (sorted) row. O(#bins · log n): one searchsorted per bin."""
    perm = np.argsort(order, kind="stable")
    c = counts[perm]
    cum = np.cumsum(c)
    n = len(c)
    bins = np.empty(n, dtype=np.int64)
    start = 0
    b = 0
    while start < n:
        base = cum[start - 1] if start else 0
        # last index with cum ≤ base + budget → maximal prefix fitting the bin
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end <= start:  # oversized document: its own bin
            end = start + 1
        bins[start:end] = b
        b += 1
        start = end
    return perm, bins


def pack_sequences(
    ds,
    *,
    count_col: str = "n_tokens",
    order_col: str = "doc_id",
    budget: int = 512,
    part_range: int = 1000,
    bin_col: str = "bin",
    part_col: str = "part",
):
    """Assign each row a (part, bin) packing id. ``order_col`` must be an
    integer key; partition boundaries are ``order_col // part_range`` so the
    assignment is a pure function of the row (deterministic resume, and the
    SQL oracle can replay it)."""

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.divide(batch[order_col], pa.scalar(part_range, pa.int64())),
            pa.int64())
        return batch.append_column(part_col, part)

    def pack_group(group: pa.Table) -> pa.Table:
        order = group[order_col].to_numpy(zero_copy_only=False)
        counts = group[count_col].to_numpy(zero_copy_only=False)
        perm, bins = pack_kernel(order, counts, budget)
        t = group.take(pa.array(perm))
        return t.append_column(bin_col, pa.array(bins, pa.int64()))

    withp = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return withp.groupby(part_col).map_groups(pack_group, batch_format="pyarrow")


def pack_sql(*, budget: int, part_range: int, count_expr: str,
             source: str = "documents", order_col: str = "doc_id") -> str:
    """The recursive-CTE oracle of the SAME next-fit semantics (generated from
    the same constants — parity by construction). The recursion advances all
    partitions breadth-first, one document per step within each partition."""
    return f"""
WITH RECURSIVE docs AS (
  SELECT {order_col} AS doc_id,
         CAST({count_expr} AS BIGINT) AS n,
         CAST({order_col} // {part_range} AS BIGINT) AS part,
         row_number() OVER (PARTITION BY {order_col} // {part_range}
                            ORDER BY {order_col}) AS rn
  FROM {source}
), packed AS (
  SELECT part, rn, doc_id, n, CAST(0 AS BIGINT) AS bin, n AS running
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.part, d.rn, d.doc_id, d.n,
         CASE WHEN p.running + d.n > {budget} THEN p.bin + 1 ELSE p.bin END,
         CASE WHEN p.running + d.n > {budget} THEN d.n ELSE p.running + d.n END
  FROM docs d JOIN packed p ON d.part = p.part AND d.rn = p.rn + 1
)
SELECT doc_id, n AS n_tokens, part, bin FROM packed
"""
