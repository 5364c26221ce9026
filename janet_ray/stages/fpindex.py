"""Persisted exact-fingerprint dedup index — the EXACT complement to the
Bloom incremental dedup (`bloom.py`, which is memory-cheap but admits false
positives that silently DROP genuinely-new documents): the corpus's
exact-dedup fingerprints (`textstats.fingerprint`, md5 of normalized text)
live on disk as sorted per-bucket parquet inside atomically-committed
Lucene-style segments (the `lshindex` discipline), and an ingest batch asks
"which of my documents has the corpus NEVER seen" with zero false
positives/negatives.

Scale shape of a probe:

  1. the NEW side's (fp, part) rows co-partition on the engine's stable
     bucket hash — ONE shuffle of the ingest batch's ~35-byte rows, the
     corpus never shuffles;
  2. each partition reads ITS bucket file from each segment (pruned IO:
     a probe touches only the buckets the ingest hashes into) and answers
     membership by ``searchsorted`` over the file's sorted fingerprints;
  3. unseen fps come back distinct; the caller keeps ingest rows via a
     broadcast semi-join on fp (the ingest batch is the small side by
     contract).

At crawl scale the composition is bloom-then-exact: the Bloom filter's
"definitely new" fast path skips the disk probe for most documents, and
this index settles the "maybe seen" remainder exactly — each structure
covering the other's weakness.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from janet_ray.functions.arrays import in_sorted
from janet_ray.functions.partitioning import with_part

META_FILE = "_fp_meta.json"


def fp_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def segment_dirs(index_dir: str) -> list[str]:
    # a crashed append leaves segment-NNNNNN.tmp — absent until os.replace
    return sorted(d for d in glob.glob(os.path.join(index_dir, "segment-*"))
                  if os.path.isdir(d) and not d.endswith(".tmp"))


def _fp_rows(ds, *, fp_col: str, num_buckets: int):
    def f(batch: pa.Table) -> pa.Table:
        fps = pc.cast(pc.drop_null(batch[fp_col]), pa.string())
        return with_part(pa.table({"fp": fps}), ["fp"],
                         n_parts=num_buckets)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def build_fp_index(ds, index_dir: str, *, fp_col: str = "fp",
                   num_buckets: int = 32) -> dict:
    """Create the index with one initial segment over ``ds`` (rows carrying
    a fingerprint column)."""
    if os.path.exists(os.path.join(index_dir, META_FILE)):
        raise FileExistsError(f"fp index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    meta = {"num_buckets": num_buckets, "n_fp_rows": 0}
    tmp_meta = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(index_dir, META_FILE))
    return append_fp_index(ds, index_dir, fp_col=fp_col)


def append_fp_index(ds, index_dir: str, *, fp_col: str = "fp") -> dict:
    """Add one atomically-committed segment of sorted distinct fingerprints
    (bucket geometry comes from meta — appends cannot drift)."""
    meta = fp_meta(index_dir)
    nb = meta["num_buckets"]
    seg = os.path.join(index_dir,
                       f"segment-{len(segment_dirs(index_dir)):06d}")
    tmp = seg + ".tmp"
    # a crashed earlier append may have left this tmp with bucket files the
    # retry's dataset won't rewrite — committing them would inject foreign
    # fingerprints (false "seen" hits silently dropping genuinely-new docs)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    def write_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "part" not in group.column_names:
            return pa.table({"n": pa.array([], pa.int64())})
        bucket = int(group["part"][0].as_py())
        fps = pc.unique(group["fp"].combine_chunks())
        fps = fps.take(pc.sort_indices(fps))
        pq.write_table(pa.table({"fp": fps}),
                       os.path.join(tmp, f"bucket-{bucket:05d}.parquet"),
                       row_group_size=65536)
        return pa.table({"n": pa.array([len(fps)], pa.int64())})

    manifest = (_fp_rows(ds, fp_col=fp_col, num_buckets=nb)
                .groupby("part").map_groups(write_bucket,
                                            batch_format="pyarrow")
                .take_all())  # ≤ num_buckets rows
    os.replace(tmp, seg)  # atomic: a segment is absent or complete
    # n_fp_rows = Σ per-segment DISTINCT counts — an upper bound on the
    # global distinct-fingerprint count (a fp present in two segments is
    # counted twice; an exact global distinct would cost a full index pass)
    meta["n_fp_rows"] = (int(meta["n_fp_rows"])
                         + int(sum(r["n"] for r in manifest)))
    tmp_meta = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(index_dir, META_FILE))
    return meta


def unseen_fingerprints(new_ds, index_dir: str, *, fp_col: str = "fp"):
    """DISTINCT fingerprints of ``new_ds`` absent from every index segment.
    One shuffle of the new side; each partition reads only its bucket file
    per segment."""
    meta = fp_meta(index_dir)
    nb = meta["num_buckets"]
    segs = segment_dirs(index_dir)

    def probe_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table({fp_col: pa.array([], pa.string())})
        if group.num_rows == 0 or "part" not in group.column_names:
            return empty
        bucket = int(group["part"][0].as_py())
        mine = pc.unique(group["fp"].combine_chunks())
        arr = mine.to_numpy(zero_copy_only=False)
        unseen = np.ones(len(arr), dtype=bool)
        for seg in segs:
            path = os.path.join(seg, f"bucket-{bucket:05d}.parquet")
            if not os.path.exists(path):
                continue
            seen = pq.read_table(path)["fp"].to_numpy(zero_copy_only=False)
            unseen &= ~in_sorted(seen, arr)
        return pa.table({fp_col: pa.array(arr[unseen], pa.string())})

    return (_fp_rows(new_ds, fp_col=fp_col, num_buckets=nb)
            .groupby("part").map_groups(probe_bucket,
                                        batch_format="pyarrow"))


def exact_new_docs(new_ds, index_dir: str, *, fp_col: str = "fp"):
    """Rows of ``new_ds`` whose fingerprint the corpus has never seen —
    zero false positives/negatives (the bloom.py contract without the FP
    caveat). The unseen fp set is broadcast for the final semi-join: the
    ingest batch is the small side by contract."""
    from janet_ray.stages.joins import broadcast_semi_join

    unseen = unseen_fingerprints(new_ds, index_dir, fp_col=fp_col)
    fps = [r[fp_col] for r in unseen.take_all()]  # bounded: ≤ ingest size
    return broadcast_semi_join(new_ds, fp_col, fps)
