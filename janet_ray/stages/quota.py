"""Per-key quota sampling — keep at most ``quota`` rows per key, selected by
the engine's content-addressed md5 rank (the same hash family as
train_test_split / orders_group_sample, rendered identically in SQL).

The Common-Crawl curation step this implements: domain-level quotas ("at most
N documents per host") bound the influence of any single site on the training
mix — RefinedWeb/C4-style pipelines apply it right after host-level stats
(the reference-side analogue is the per-host grouping the rename flow's A6
dedupe performs; here the group is CAPPED, not deduped). Selection must be
deterministic and content-addressed so reruns and resumes keep the SAME
documents, never a different random subset.

Scale shape (two stages, one shuffle, skew-proof):

  1. **map-side combiner** — each input batch is cut to its per-key top
     ``quota`` BEFORE the shuffle. Correct for the same reason every top-k
     combiner is: the global top-``quota`` rows of a key, ranked by
     (md5_u32(id), id) ascending, are each in their own batch's per-key
     top-``quota``. A hot key (one host with 10⁹ pages) therefore ships at
     most ``quota`` rows PER INPUT BATCH instead of all its rows — the hot
     key's shuffle volume is bounded by quota × n_batches, not corpus size.
  2. **one coarse hash shuffle on the key** (the engine-wide ``with_part``
     rule) → per-partition re-rank and final cut, emitting the surviving
     rows with their rank. All columns pass through; rows only get dropped.

SQL twin: ``row_number() OVER (PARTITION BY key ORDER BY md5_u32(id), id)
<= quota`` with the engine's exact md5 arithmetic — value-hash parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from janet_ray.functions.partitioning import with_part

_N_PARTS = 64


def _md5_u32_arr(vals: list) -> np.ndarray:
    return np.asarray(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) for v in vals],
        dtype=np.int64)


def _rank_cut(t: pa.Table, key_col: str, quota: int,
              h: np.ndarray) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Sort by (key, h, id) and keep each key's first ``quota`` rows.
    Returns (cut table, its h, its within-key rank). Vectorized: dictionary
    codes for the key, run detection, run-relative cumcount."""
    ids = t["__qid"].to_numpy(zero_copy_only=False)
    codes_arr = pc.dictionary_encode(
        t[key_col].combine_chunks() if isinstance(t[key_col], pa.ChunkedArray)
        else t[key_col])
    if isinstance(codes_arr, pa.ChunkedArray):
        codes = np.concatenate(
            [c.indices.to_numpy(zero_copy_only=False) for c in codes_arr.chunks]
        ).astype(np.int64)
    else:
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, h, codes))
    sc = codes[order]
    n = len(sc)
    starts = np.zeros(n, dtype=bool)
    if n:
        starts[0] = True
        starts[1:] = sc[1:] != sc[:-1]
    run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
    rank = np.arange(n) - run_start
    keep = rank < quota
    sel = order[keep]
    return (t.take(pa.array(sel, pa.int64())), h[order][keep],
            rank[keep].astype(np.int64))


def quota_sample(ds, *, key_col: str, id_col: str = "doc_id",
                 quota: int, n_parts: int = _N_PARTS,
                 with_rank: bool = False,
                 small_limit: int = 2_000_000,
                 force_dispatch: str | None = None):
    """At most ``quota`` rows per distinct ``key_col`` value, chosen by
    ascending (md5_u32(id), id) — deterministic, content-addressed, rerun-
    stable. All input columns pass through; ``with_rank=True`` appends the
    within-key rank (0-based) as ``qrank``.

    Scale-adaptive final cut (the engine's standard dispatch, parity-pinned
    in tests): the map-side combiner already reduces the stream to ≤ quota
    rows per key per input batch, so when the combined volume is at most
    ``small_limit`` rows the final cut runs in ONE task (repartition(1))
    and skips the key-hash sort shuffle — measured ~4 s of pure shuffle
    barrier on a 50k-row input whose reduced stream is a few thousand rows.
    Larger reduced volumes take the coarse key-hash shuffle as before.
    ``force_dispatch`` ∈ {"small", "shuffle"} pins a path for tests."""
    if quota < 1:
        raise ValueError("quota must be >= 1")

    def precut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return with_part(
                batch.append_column("__h", pa.array([], pa.int64()))
                .append_column("__qid", pa.array([], batch[id_col].type
                                                 if id_col in batch.column_names
                                                 else pa.int64())),
                [key_col], n_parts=n_parts)
        h = _md5_u32_arr(batch[id_col].to_pylist())
        t = batch.append_column("__qid", batch[id_col])
        cut, hc, _ = _rank_cut(t, key_col, quota, h)
        cut = cut.append_column("__h", pa.array(hc, pa.int64()))
        return with_part(cut, [key_col], n_parts=n_parts)

    def finalcut(part: pa.Table) -> pa.Table:
        base = [c for c in part.column_names
                if c not in ("part", "__h", "__qid")]
        if part.num_rows == 0 or "__h" not in part.column_names:
            out = (part.select(base) if base
                   else pa.table({key_col: pa.array([], pa.string())}))
            return (out.append_column("qrank", pa.array([], pa.int64()))
                    if with_rank else out)
        h = part["__h"].to_numpy(zero_copy_only=False)
        cut, _, rank = _rank_cut(part, key_col, quota, h)
        out = cut.select(base)
        if with_rank:
            out = out.append_column("qrank", pa.array(rank, pa.int64()))
        return out

    pre = ds.map_batches(precut, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    small = pre.count() <= small_limit
    if force_dispatch == "small":
        small = True
    elif force_dispatch == "shuffle":
        small = False
    if small:
        return pre.repartition(1).map_batches(finalcut,
                                              batch_format="pyarrow",
                                              batch_size=None)
    return pre.groupby("part").map_groups(finalcut, batch_format="pyarrow")
