"""Count-Min frequency sketch (Cormode/Muthukrishnan 2005) — completes the
engine's mergeable-sketch family (membership: stages/bloom.py, distinct:
stages/sketch.py HLL, quantiles: stages/ddsketch.py, frequency: here).

The exact term-frequency path (`vocab_topk`) shuffles per-batch (word,
count) partials — shuffle volume ∝ distinct terms per batch, fine for
vocabularies, wrong for unbounded key streams (urls, shingles, user ids ×
time). The CMS replaces the shuffle with a fixed d×w counter matrix whose
accumulation rides Ray's aggregation tree (merge = elementwise add —
counts are linear, so the sketch is deterministic and partition/order
invariant).

Pinned semantics:

  * d rows of w counters; row hashes = d independent splitmix64 streams of
    the key's md5 64-BIT prefix (not the engine's 32-bit md5-u32: a 32-bit
    base hash makes distinct keys collide identically in ALL d rows near
    10^5 distinct keys — the birthday bound — which breaks the ε·N
    guarantee exactly at the unbounded-key-stream scale this sketch
    targets; 64 bits pushes the first hard collision past 10^9 keys);
  * update: counters[r][h_r(x) % w] += 1 for each row r;
  * point query: min over rows — an OVERESTIMATE, never an underestimate
    (the guarantee property tests pin): err ≤ ε·N with prob ≥ 1−δ for
    w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.

Top-k protocol (see `queries.q_vocab_topk_cms`): the sketch answers point
queries; the candidate set comes from elsewhere (a per-batch local-top-k union — the
classic "candidates are cheap, exact global counts are the shuffle"
observation). Estimates for candidates are exact-N-bounded overestimates;
at web scale this replaces vocab_topk's global shuffle with one streaming
pass + an O(candidates) driver check."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from janet_ray.stages.bloom import _splitmix64

DEFAULT_EPS = 0.0005
DEFAULT_DELTA = 0.01


def cms_params(eps: float = DEFAULT_EPS,
               delta: float = DEFAULT_DELTA) -> tuple[int, int]:
    """(depth d, width w) for error ≤ eps·N with probability ≥ 1−delta."""
    return (max(1, math.ceil(math.log(1.0 / delta))),
            max(1, math.ceil(math.e / eps)))


def _key_u64(keys: list) -> np.ndarray:
    """md5 64-bit prefix of the stringified key — the base hash must carry
    ≥64 bits or distinct keys collide identically across ALL d rows (see
    module docstring)."""
    return np.asarray(
        [int(hashlib.md5(str(k).encode()).hexdigest()[:16], 16)
         for k in keys], dtype=np.uint64)


def _row_indexes(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) counter indexes: row r uses the r-th splitmix64 iterate."""
    out = np.empty((d, len(h)), dtype=np.int64)
    x = h
    for r in range(d):
        x = _splitmix64(x)
        out[r] = (x % np.uint64(w)).astype(np.int64)
    return out


def cms_build(ds, col: str, *, eps: float = DEFAULT_EPS,
              delta: float = DEFAULT_DELTA) -> np.ndarray:
    """Distributed CMS build over ds[col] (any stringifiable key); returns
    the final (d, w) int64 counter matrix. Merging is elementwise add in
    Ray's aggregation tree — the matrix, never the key stream, moves."""
    from ray.data.aggregate import AggregateFn

    d, w = cms_params(eps, delta)

    def accumulate(acc, block):
        if acc is None:
            acc = np.zeros((d, w), dtype=np.int64)
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        keys = tbl[col].to_pylist()
        if keys:
            idx = _row_indexes(_key_u64(keys), d, w)
            for r in range(d):
                np.add.at(acc[r], idx[r], 1)
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a + b

    agg = AggregateFn(init=lambda _: None, merge=merge, name="cms",
                      accumulate_block=accumulate, finalize=lambda a: a)
    out = ds.aggregate(agg)
    acc = out["cms"] if isinstance(out, dict) else out
    if acc is None:
        acc = np.zeros((d, w), dtype=np.int64)
    return acc


def cms_query(sketch: np.ndarray, keys: list) -> np.ndarray:
    """Point estimates (min over rows) for each key — overestimates only."""
    d, w = sketch.shape
    if not keys:
        return np.zeros(0, dtype=np.int64)
    idx = _row_indexes(_key_u64(keys), d, w)
    ests = np.stack([sketch[r][idx[r]] for r in range(d)])
    return ests.min(axis=0)
