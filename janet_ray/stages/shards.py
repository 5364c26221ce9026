"""Deterministic global shuffle → training shards (SURVEY.md §2.11).

The last step of every training-data pipeline: a reproducible global
permutation of the corpus, cut into ``n_shards`` shard files a data loader
streams in order. ``Dataset.random_shuffle()`` is the wrong tool at 100 TB —
it is a full all-to-all materialization AND its assignment is not
rerun-stable, so a resumed run would emit a DIFFERENT corpus order and break
training determinism. Here the permutation is content-addressed, the same
trick the engine's train_test_split / quota / mixture samplers use:

    h     = md5_u32(f"{seed}:{doc_id}")       # the shuffle key
    shard = h % n_shards                      # which shard file
    pos   = rank of (h, doc_id) within shard  # order inside the shard

md5 avalanche makes (shard, pos) a high-quality pseudo-random permutation;
``seed`` picks a fresh permutation per epoch with ZERO state; reruns and
resumes reproduce it bit-for-bit. Scale shape: one coarse hash shuffle on the
shard id (whole shards co-locate, the ``with_part`` rule), then a vectorized
per-partition sort + run-relative cumcount gives ``pos``. Size ``n_shards``
so one shard fits a worker task — that is the same grain as the shard FILES
the loader wants (10^12 docs / 10^5 shards = 10^7 docs per file), so the
constraint is the contract, not a limit. Rows pass through; only (shard, pos)
are appended — write with ``partition_cols=["shard"]`` for resumable output.

SQL twin (exact-int, value-hash strict): the engine's md5_u32 rendering +
``row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1``.

Reference anchor: the reference processes documents in directory-listing
order (apps/legacy/rename.ts:77-90, a sequential per-file loop) — order
determinism there is the filesystem's; here it must be engineered.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from janet_ray.functions.partitioning import N_PARTS_DEFAULT


def _md5_u32_seeded(vals, seed: int) -> np.ndarray:
    pre = f"{seed}:".encode()
    return np.fromiter(
        (int(hashlib.md5(pre + str(v).encode()).hexdigest()[:8], 16)
         for v in vals),
        dtype=np.int64, count=len(vals))


def shuffle_shards(ds, *, id_col: str = "doc_id", n_shards: int = 8,
                   seed: int = 0, n_parts: int = N_PARTS_DEFAULT):
    """→ input columns + (shard int32, pos int64): a deterministic global
    permutation cut into ``n_shards`` contiguous shards. Epoch e = new seed."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    n_parts = min(n_parts, n_shards)

    def tag(batch: pa.Table) -> pa.Table:
        h = _md5_u32_seeded(batch[id_col].to_pylist(), seed)
        shard = (h % n_shards).astype(np.int32)
        return (batch.append_column("__h", pa.array(h, pa.int64()))
                .append_column("shard", pa.array(shard, pa.int32()))
                .append_column("part", pa.array(
                    (shard % n_parts).astype(np.int32))))

    def rank_part(part_t: pa.Table) -> pa.Table:
        t = part_t.drop(["part"])
        if t.num_rows == 0:
            return (t.drop(["__h"])
                    .append_column("pos", pa.array([], pa.int64())))
        h = t["__h"].to_numpy(zero_copy_only=False)
        shard = t["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_pylist()
        # within-shard rank by (h, id): lexsort + run-relative cumcount
        order = np.lexsort((np.asarray(ids, dtype=object)
                            if not isinstance(ids[0], (int, np.integer))
                            else np.asarray(ids, dtype=np.int64), h, shard))
        ss = shard[order]
        n = len(ss)
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        starts[1:] = ss[1:] != ss[:-1]
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        pos = np.arange(n) - run_start
        out = t.take(pa.array(order, pa.int64())).drop(["__h"])
        return out.append_column("pos", pa.array(pos, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("part").map_groups(rank_part, batch_format="pyarrow")
