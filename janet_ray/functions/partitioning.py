"""The engine-wide coarse-hash-partition helper (the shuffle rule: NEVER one
Python call per fine-grained key — shuffle on a small stable partition id and
detect key runs vectorized inside each partition).

One implementation shared by every grouped reducer (url dedupe, events
last-wins, sessionization, LSH buckets) so the stable-hash requirement —
builtin ``hash()`` is salted per process and would scatter one key over
several partitions — is encoded exactly once.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

N_PARTS_DEFAULT = 64


def stable_hash_column(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Process-stable int64 hash of one or more key columns (crc32 for strings,
    identity-mix for ints)."""
    acc = np.zeros(batch.num_rows, dtype=np.int64)
    for c in cols:
        col = batch[c]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            v = np.fromiter((zlib.crc32(str(x).encode()) for x in col.to_pylist()),
                            dtype=np.int64, count=batch.num_rows)
        with np.errstate(over="ignore"):
            acc = acc * np.int64(1000003) + v
    return np.abs(acc)


def with_part(batch: pa.Table, cols: list[str],
              n_parts: int = N_PARTS_DEFAULT, out_col: str = "part") -> pa.Table:
    """Append the coarse partition id column for ``groupby(out_col)``."""
    part = (stable_hash_column(batch, cols) % n_parts).astype(np.int32)
    return batch.append_column(out_col, pa.array(part))
