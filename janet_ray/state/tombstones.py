"""Shared tombstone-delete mechanics for the on-disk index family
(inverted index, LSH band index): deletions are tiny atomically-committed
id files next to the index, SEGMENT-SCOPED — each records how many segments
existed when the delete was issued, and masks only those, so a document
re-added in a later segment is live again (the Lucene delete-then-reindex
update flow; a global id mask would silently lose the new version). One
implementation of the file format and the coverage rule, consumed by
`stages/index.py` and `stages/lshindex.py`.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def tombstone_files(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "tombstone-*.parquet")))


def write_tombstone(index_dir: str, doc_ids, covered: int) -> dict:
    """One atomically-committed tombstone file (sorted unique int64 ids +
    the segment-coverage bound). Empty id set is a no-op."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if ids.size == 0:
        return {"n_deleted": 0, "file": None}
    n = len(tombstone_files(index_dir))
    final = os.path.join(index_dir, f"tombstone-{n:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "covered": pa.array(np.full(ids.size, covered, dtype=np.int32)),
    }), tmp)
    os.replace(tmp, final)  # atomic: a tombstone is absent or complete
    return {"n_deleted": int(ids.size), "file": final, "covered": covered}


def tombstone_sets(index_dir: str) -> list[tuple[int, np.ndarray]]:
    """One (covered_segments, sorted unique ids) pair per tombstone file."""
    out = []
    for f in tombstone_files(index_dir):
        t = pq.read_table(f)
        ids = np.unique(t["doc_id"].to_numpy(zero_copy_only=False))
        covered = int(t["covered"][0].as_py()) if t.num_rows else 0
        out.append((covered, ids))
    return out


def dead_mask(ids: np.ndarray, ordinal: int, dead_sets) -> np.ndarray:
    """Boolean mask over ``ids`` (rows read from the segment at ``ordinal``):
    True where a tombstone covering that segment names the id."""
    from janet_ray.functions.arrays import in_sorted

    mask = np.zeros(len(ids), dtype=bool)
    for covered, dead in dead_sets or ():
        if ordinal < covered:
            mask |= in_sorted(dead, ids)
    return mask
