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
dict {bin: count} (sparse — bins actually hit; ~⌈log_γ(max/min)⌉ entries,
a few hundred at α=1%) merged by per-key addition in Ray's aggregation
tree. Not SQL-expressible as a value oracle (bin midpoints are sketch
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


def dd_build(ds, col: str, *, alpha: float = DEFAULT_ALPHA) -> dict[int, int]:
    """Distributed sketch build over ds[col]; returns the final sparse bin
    map. Combining happens in Ray's aggregation tree — bin maps, never
    values, move."""
    from ray.data.aggregate import AggregateFn

    gamma = _gamma(alpha)

    def accumulate(acc, block):
        if acc is None:
            acc = {}
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        vals = tbl[col].to_numpy(zero_copy_only=False).astype(np.float64)
        # drop NaN AND ±inf: an infinite value's ceil(log) wraps through the
        # int64 cast into the mirrored-store key range, corrupting bin order
        vals = vals[np.isfinite(vals)]
        for b, n in _bins(vals, gamma).items():
            acc[b] = acc.get(b, 0) + n
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        for k, n in b.items():
            a[k] = a.get(k, 0) + n
        return a

    agg = AggregateFn(init=lambda _: None, merge=merge, name="dd",
                      accumulate_block=accumulate, finalize=lambda a: a)
    out = ds.aggregate(agg)
    acc = out["dd"] if isinstance(out, dict) and "dd" in out else out
    return acc if acc else {}


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
