"""Per-group ranking / top-k operators (training-data pipelines, SURVEY §2.11).

``group_topk`` is the distributed "top N rows per key" primitive (best k
documents per domain, latest k orders per customer, hardest k examples per
class) built under the engine's shuffle rule: ONE coarse hash shuffle on the
group key, then a single vectorized kernel per partition (sort + run-boundary
rank), never a Python call per group and never a global sort.

Scale shape: the shuffle carries only the projected columns; a partition holds
~n_groups/64 groups whose kernel is O(rows log rows) locally. Skewed group
sizes are bounded by k at the OUTPUT, and the input-side hot-group risk is the
same class the salted dedupe handles (pipelines/extract.py) — a hot group can
be pre-reduced with a salted local top-k because top-k is an idempotent
reducer (top-k of a union = top-k of per-part top-ks)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from janet_ray.functions.partitioning import N_PARTS_DEFAULT, with_part


def group_topk(
    ds,
    group_cols: list[str],
    sort_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
    n_parts: int = N_PARTS_DEFAULT,
    rank_col: str = "rank",
):
    """Top-k rows per group with a 1-based ``rank`` column.

    Deterministic: ties on ``sort_col`` are broken by ``tiebreak_cols``
    (ascending) so the emitted set and ranks match a SQL
    ``row_number() OVER (PARTITION BY g ORDER BY s DESC, t)`` oracle exactly."""
    tiebreak_cols = tiebreak_cols or []

    def add_part(batch: pa.Table) -> pa.Table:
        return with_part(batch, group_cols, n_parts=n_parts)

    def topk_kernel(part: pa.Table) -> pa.Table:
        return group_topk_kernel(part.drop_columns(["part"]), group_cols,
                                 sort_col, k, descending=descending,
                                 tiebreak_cols=tiebreak_cols, rank_col=rank_col)

    withp = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return withp.groupby("part").map_groups(topk_kernel, batch_format="pyarrow")


def group_topk_kernel(part: pa.Table, group_cols: list[str], sort_col: str,
                      k: int, *, descending: bool = True,
                      tiebreak_cols: list[str] | None = None,
                      rank_col: str = "rank") -> pa.Table:
    """The within-partition kernel (module-level so tests can drive it
    directly): sort once, detect group boundaries vectorized, rank = position
    since the last boundary, keep rank ≤ k."""
    tiebreak_cols = tiebreak_cols or []
    order = "descending" if descending else "ascending"
    if part.num_rows == 0:
        return part.append_column(rank_col, pa.array([], pa.int64()))
    keys = ([(c, "ascending") for c in group_cols]
            + [(sort_col, order)]
            + [(c, "ascending") for c in tiebreak_cols])
    t = part.take(pc.sort_indices(part, sort_keys=keys))
    gcols = [t[c].to_numpy(zero_copy_only=False) for c in group_cols]
    n = t.num_rows
    boundary = np.zeros(n, dtype=bool)
    boundary[0] = True
    for g in gcols:
        boundary[1:] |= g[1:] != g[:-1]
    idx = np.arange(n, dtype=np.int64)
    group_start = np.maximum.accumulate(np.where(boundary, idx, 0))
    rank = idx - group_start + 1
    keep = rank <= k
    return t.filter(pa.array(keep)).append_column(
        rank_col, pa.array(rank[keep], pa.int64()))
