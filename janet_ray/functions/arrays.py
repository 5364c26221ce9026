"""Small shared numpy array kernels.

``in_sorted`` is the engine's one implementation of sorted-array membership
(searchsorted + clamp + equality) — previously copy-pasted across the index
tombstone mask, the fingerprint-index probe, and the segment merge; the
clamp-to-0 edge case (needle above the last haystack element) lives in
exactly one place now.
"""

from __future__ import annotations

import numpy as np


def in_sorted(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``needles`` occur in the SORTED ``haystack``."""
    if haystack.size == 0 or needles.size == 0:
        return np.zeros(needles.size, dtype=bool)
    idx = np.searchsorted(haystack, needles)
    idx[idx >= haystack.size] = 0
    return haystack[idx] == needles
