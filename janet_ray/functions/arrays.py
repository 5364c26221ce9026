"""Small shared numpy/Arrow array kernels.

``in_sorted`` is the engine's one implementation of sorted-array membership
(searchsorted + clamp + equality) — previously copy-pasted across the index
tombstone mask, the fingerprint-index probe, and the segment merge; the
clamp-to-0 edge case (needle above the last haystack element) lives in
exactly one place now.

``list_parents`` / ``sorted_string_ids`` are the flattened-list plumbing the
vectorized text kernels (gopher/c4) share: map every element of a flattened
Arrow ListArray back to its parent row, and factorize a string array into
int ids whose ORDER equals the lexicographic order of the strings (so
tie-breaks that the reference kernels express as ``min(string)`` become
``min(id)`` — valid whenever downstream joins use a separator smaller than
every payload character, e.g. space vs [a-z0-9])."""

from __future__ import annotations

import numpy as np


def in_sorted(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``needles`` occur in the SORTED ``haystack``."""
    if haystack.size == 0 or needles.size == 0:
        return np.zeros(needles.size, dtype=bool)
    idx = np.searchsorted(haystack, needles)
    idx[idx >= haystack.size] = 0
    return haystack[idx] == needles


def list_parents(offsets: np.ndarray) -> np.ndarray:
    """Parent-row index for every element of a flattened ListArray."""
    return np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                     np.diff(offsets))


def sorted_string_ids(flat):
    """Factorize an Arrow string array into int64 ids whose numeric order
    equals the lexicographic order of the strings.

    Returns ``(ids, udict)`` where ``udict`` is the sorted unique strings
    and ``udict[ids[i]] == flat[i]``. Built on ``dictionary_encode`` (one
    C++ hash pass) + a rank permutation of the (small) dictionary."""
    import pyarrow as pa
    import pyarrow.compute as pc

    de = flat.dictionary_encode()
    dictionary, indices = de.dictionary, de.indices
    order = pc.array_sort_indices(dictionary).to_numpy(zero_copy_only=False)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    idx = indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return rank[idx], dictionary.take(pa.array(order))


_ALNUM_LUT = np.zeros(256, dtype=bool)
for _c in b"abcdefghijklmnopqrstuvwxyz0123456789":
    _ALNUM_LUT[_c] = True


def ascii_alnum_run_counts(arr) -> np.ndarray:
    """Per-string count of ``[a-z0-9]+`` runs over an Arrow string array —
    byte-exact twin of ``pc.count_substring_regex(arr, '[a-z0-9]+')`` for
    LOWERCASE input (~2× faster: one LUT pass + one cumsum instead of RE2).
    Works at the byte level: every byte of a multibyte UTF-8 char is
    ≥ 0x80, i.e. a separator, so char-level and byte-level runs agree."""
    import pyarrow as pa

    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    width = 8 if pa.types.is_large_string(arr.type) else 4
    dt = np.int64 if width == 8 else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=dt, count=len(arr) + 1,
                        offset=arr.offset * width).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lo = off[0]
    seg = data[lo:off[-1]]
    off = off - lo
    al = _ALNUM_LUT[seg]
    starts = al.copy()
    starts[1:] &= ~al[:-1]
    # a run never spans two strings: position off[i] starts one iff alnum
    b = off[:-1][off[:-1] < len(seg)]
    starts[b] = al[b]
    cs = np.zeros(len(seg) + 1, dtype=np.int64)
    np.cumsum(starts, out=cs[1:])
    return cs[off[1:]] - cs[off[:-1]]
