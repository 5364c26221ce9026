"""DDSketch-style quantile sketch (Masson/Rim/Lee, VLDB 2019) — the
unbounded-cardinality path for quantiles, pairing with stages/sketch.py's
HLL the way the exact kernels pair: the engine's EXACT quantiles
(`quantity_quantiles`) shuffle (value, count) partials and are scale-safe
only when the column's DISTINCT count is bounded (their documented
contract); the sketch replaces that with log-spaced bins whose counts
merge by addition.

Why DDSketch and not t-digest: t-digest's centroid compression depends on
merge ORDER, so a Ray aggregation tree gives run-to-run different
estimates; DDSketch's bin index is a PURE FUNCTION of the value
(``ceil(log_γ x)``), so the sketch is deterministic and partition/order
invariant — the same invariance contract every other operator here pins.

Pinned semantics:

  * γ = (1+α)/(1−α); bin(x) = ceil(log_γ(x)) for x > 0; zero and negative
    values get a dedicated zero bin and a mirrored negative store;
  * estimate(q) walks cumulative bin counts to rank ⌈q·n⌉ (n>0; the SAME
    discrete rank rule as the exact kernel / SQL quantile_disc) and returns
    the bin midpoint 2γ^i/(γ+1);
  * guarantee: relative error ≤ α on the VALUE at every quantile.

BUILD mirrors bloom/HLL: a custom ``AggregateFn`` whose accumulator is a
(2, n) int64 ndarray — row 0 the sparse bin keys, row 1 their counts
(~⌈log_γ(max/min)⌉ entries, a few hundred at α=1%) — merged by
concatenate + unique-sum in Ray's aggregation tree. numpy, NOT a
{int bin: count} dict: Ray tries to build an Arrow column from each
accumulator and a dict with int keys throws ``ArrowTypeError`` per block,
silently falling back to pickled objects (per-merge tracebacks + slow
serialization in the hot aggregation tree — VERDICT r03). Not
SQL-expressible as a value oracle (bin midpoints are sketch
artifacts); pinned by the α-bound property test against exact quantiles,
determinism-under-repartition, and merge associativity; the registered
query returns sketch estimates NEXT TO the exact values so the driver run
evidences the bound live."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

DEFAULT_ALPHA = 0.01


def _gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def _bins(vals: np.ndarray, gamma: float) -> dict[int, int]:
    """Sparse {bin: count} of one value array (vectorized)."""
    out: dict[int, int] = {}
    pos = vals[vals > 0]
    if pos.size:
        idx = np.ceil(np.log(pos) / math.log(gamma)).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        for b, n in zip(u.tolist(), c.tolist()):
            out[b] = out.get(b, 0) + int(n)
    nzero = int((vals == 0).sum())
    if nzero:
        out[_ZERO_BIN] = out.get(_ZERO_BIN, 0) + nzero
    neg = vals[vals < 0]
    if neg.size:
        idx = np.ceil(np.log(-neg) / math.log(gamma)).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        for b, n in zip(u.tolist(), c.tolist()):
            key = _NEG_BASE - int(b)  # mirrored store, order-reversed
            out[key] = out.get(key, 0) + int(n)
    return out


# negative bins are encoded below _NEG_BASE so plain integer ordering of the
# encoded keys equals value ordering: negatives (most negative first) < zero
# bin < positives
_NEG_BASE = -(1 << 40)
_ZERO_BIN = -(1 << 30)


def _pack(bins: dict[int, int]) -> np.ndarray:
    """dict → sorted-key (2, n) int64 array (row 0 keys, row 1 counts)."""
    if not bins:
        return np.zeros((2, 0), dtype=np.int64)
    keys = np.fromiter(bins.keys(), dtype=np.int64, count=len(bins))
    cnts = np.fromiter(bins.values(), dtype=np.int64, count=len(bins))
    order = np.argsort(keys)
    return np.vstack([keys[order], cnts[order]])


def _merge_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two packed sketches with per-key count addition."""
    keys = np.concatenate([a[0], b[0]])
    cnts = np.concatenate([a[1], b[1]])
    u, inv = np.unique(keys, return_inverse=True)
    summed = np.zeros(len(u), dtype=np.int64)
    np.add.at(summed, inv, cnts)
    return np.vstack([u, summed])


def dd_build(ds, col: str, *, alpha: float = DEFAULT_ALPHA) -> dict[int, int]:
    """Distributed sketch build over ds[col]; returns the final sparse bin
    map. Combining happens in Ray's aggregation tree — packed (2, n) int64
    bin arrays, never values, move (Arrow-native, no pickle fallback)."""
    from ray.data.aggregate import AggregateFn

    gamma = _gamma(alpha)

    def accumulate(acc, block):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        vals = tbl[col].to_numpy(zero_copy_only=False).astype(np.float64)
        # drop NaN AND ±inf: an infinite value's ceil(log) wraps through the
        # int64 cast into the mirrored-store key range, corrupting bin order
        vals = vals[np.isfinite(vals)]
        packed = _pack(_bins(vals, gamma))
        return packed if acc is None else _merge_packed(acc, packed)

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return _merge_packed(a, b)

    agg = AggregateFn(init=lambda _: None, merge=merge, name="dd",
                      accumulate_block=accumulate, finalize=lambda a: a)
    out = ds.aggregate(agg)
    acc = out["dd"] if isinstance(out, dict) and "dd" in out else out
    if acc is None or (isinstance(acc, np.ndarray) and acc.shape[1] == 0):
        return {}
    return dict(zip(acc[0].tolist(), acc[1].tolist()))


def dd_quantile(sketch: dict[int, int], q: float,
                *, alpha: float = DEFAULT_ALPHA) -> float:
    """Value estimate at quantile q (discrete rank ⌈q·n⌉, the exact
    kernel's rule; q=0 → minimum bin)."""
    if not sketch:
        return float("nan")
    gamma = _gamma(alpha)
    n = sum(sketch.values())
    rank = max(1, math.ceil(q * n))
    cum = 0
    for b in sorted(sketch):
        cum += sketch[b]
        if cum >= rank:
            if b == _ZERO_BIN:
                return 0.0
            if b < _ZERO_BIN:  # negative store
                i = _NEG_BASE - b
                return -2.0 * gamma ** i / (gamma + 1.0)
            return 2.0 * gamma ** b / (gamma + 1.0)
    raise AssertionError("rank walk exhausted bins")  # unreachable


def dd_quantiles(ds, col: str, qs: list[float],
                 *, alpha: float = DEFAULT_ALPHA) -> list[float]:
    """Estimates for several quantiles from ONE streaming pass."""
    sk = dd_build(ds, col, alpha=alpha)
    return [dd_quantile(sk, q, alpha=alpha) for q in qs]
