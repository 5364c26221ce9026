"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
unbounded-cardinality path for corpus statistics. The engine's EXACT
distinct count (`events_distinct_users`) shuffles every distinct value and
is scale-safe only for bounded-cardinality columns (its documented
contract); at web scale (distinct urls, shingles, users) the sketch
replaces the shuffle with a fixed 2^p-byte register array that Ray's
aggregation tree merges — the driver receives ONE sketch, never values.

Pinned semantics (deterministic: same input multiset → same estimate,
regardless of partitioning or order — register max is commutative):

  * hash = splitmix64 of the int64 key (the engine's bloom hash family);
  * register index = low ``p`` bits; rank = leading-zero count of the
    remaining 64−p bits + 1 (capped at 64−p+1);
  * estimate = the classic alpha_m · m² / Σ 2^(−M[j]) with the standard
    small-range (linear counting when E ≤ 2.5m and zero registers exist)
    and large-range corrections.

Standard error ≈ 1.04/√m — p=14 (16 KB) gives ~0.8%. BUILD mirrors
stages/bloom.py: a custom ``AggregateFn`` whose accumulator IS the register
array (per-block vectorized ``np.maximum.at``; merge = elementwise max).

Not SQL-expressible as a value oracle (the estimate is a hash artifact);
pinned by exact single-process parity (determinism) + error-bound property
tests; the registered query is rows-only by declaration and ALSO returns
the exact count side-by-side so the driver run itself evidences the bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from janet_ray.stages.bloom import _splitmix64

DEFAULT_P = 14


def _ranks(keys: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per key — vectorized."""
    h = _splitmix64(keys.astype(np.uint64))
    idx = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    rest = (h >> np.uint64(p)).astype(np.uint64)
    width = 64 - p
    # leading-zero count of the width-bit value `rest`: bit_length via log2
    # is float-unsafe; use a vectorized bit scan over the fixed width
    rank = np.full(len(rest), width + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        r = rest[nz]
        # position of highest set bit (0-based from LSB)
        hi = np.zeros(len(r), dtype=np.int64)
        v = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            hi[big] += shift
            v[big] >>= np.uint64(shift)
        rank[nz] = (width - 1 - hi + 1).astype(np.uint8)
    return idx, rank


def hll_build(ds, col: str, *, p: int = DEFAULT_P) -> np.ndarray:
    """Distributed HLL build over ds[col] (int64 keys); returns the final
    2^p-byte register array. Combining happens in Ray's aggregate tree —
    the sketch, not the value set, is what moves."""
    from ray.data.aggregate import AggregateFn

    m = 1 << p

    def accumulate(regs, block):
        if regs is None:
            regs = np.zeros(m, dtype=np.uint8)
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        # drop nulls explicitly: a null int64 column round-trips through
        # numpy as NaN and the int64 cast would mint a phantom distinct
        # value (INT64_MIN); COUNT(DISTINCT) never counts the null group
        import pyarrow.compute as _pc

        keys = _pc.drop_null(tbl[col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if keys.size:
            idx, rank = _ranks(keys, p)
            np.maximum.at(regs, idx, rank)
        return regs

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return np.maximum(a, b)

    agg = AggregateFn(init=lambda _: None, merge=merge, name="hll",
                      accumulate_block=accumulate, finalize=lambda a: a)
    out = ds.aggregate(agg)
    regs = out["hll"] if isinstance(out, dict) else out
    if regs is None:
        regs = np.zeros(m, dtype=np.uint8)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the standard small/large-range corrections."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    inv_sum = np.sum(np.float64(2.0) ** (-regs.astype(np.float64)))
    e = alpha * m * m / inv_sum
    if e <= 2.5 * m:
        zeros = int(np.sum(regs == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    two64 = 2.0 ** 64
    if e > two64 / 30.0:
        return -two64 * np.log(1.0 - e / two64)
    return float(e)


def hll_distinct(ds, col: str, *, p: int = DEFAULT_P) -> int:
    """Approximate distinct count of ds[col] — one streaming pass, no
    shuffle, O(2^p) driver state."""
    return int(round(hll_estimate(hll_build(ds, col, p=p))))
