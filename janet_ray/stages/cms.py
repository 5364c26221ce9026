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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates + CMS upper bounds.
#
# The docstring's top-k protocol, completed: candidates come from a
# MERGEABLE Misra-Gries summary (Agarwal et al., "Mergeable Summaries",
# PODS'12) — per-batch exact value counts reduced to m counters by
# subtracting the (m+1)-th largest count, then a driver fold with O(m)
# state over the ≤ m-row per-block partials. The merged summary keeps the
# MG guarantee regardless of merge order: every key is UNDERcounted by at
# most N/(m+1), so every key with true count > N/(m+1) survives (recall
# guarantee), and n_mg ≤ n_true always. The CMS pass then supplies the
# matching OVERestimate, sandwiching the truth:  n_mg ≤ n_true ≤ n_cms.
#
# Scale shape: the key stream never shuffles — pass 1 moves ≤ m rows per
# block into a single O(m)-state driver fold, pass 2 moves only the d×w
# matrix through the aggregation tree. vocab_topk's (word, n) partial
# shuffle is bounded by distinct keys; this protocol is bounded by m
# regardless of key cardinality (urls, shingles, user×time keys).
# ---------------------------------------------------------------------------


def _mg_prune(words: np.ndarray, counts: np.ndarray, m: int):
    """Misra-Gries reduction of exact (key, count) pairs to ≤ m counters:
    subtract the (m+1)-th largest count from all, keep strictly positive."""
    if len(words) <= m:
        return words, counts
    cut = np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)]
    keep = counts > cut
    return words[keep], counts[keep] - cut


def mg_summary(ds, col: str, *, m: int) -> pa.Table:
    """Distributed Misra-Gries summary of ds[col]: per-batch exact value
    counts pruned to m counters (≤ m rows leave each block), folded on the
    driver with O(m) state. Returns (key, n_mg) with n_mg ≤ n_true ≤
    n_mg + N/(m+1); every key with n_true > N/(m+1) is present."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[col])
        words = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        words, counts = _mg_prune(words, counts, m)
        return pa.table({"key": pa.array(words, pa.string()),
                         "n_mg": pa.array(counts, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    state: pa.Table | None = None
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        merged = pa.concat_tables([state, b]) if state is not None else b
        grp = merged.group_by("key").aggregate([("n_mg", "sum")])
        words = np.asarray(grp["key"].to_pylist(), dtype=object)
        counts = grp["n_mg_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        words, counts = _mg_prune(words, counts, m)
        state = pa.table({"key": pa.array(words, pa.string()),
                          "n_mg": pa.array(counts, pa.int64())})
    if state is None:
        state = pa.table({"key": pa.array([], pa.string()),
                          "n_mg": pa.array([], pa.int64())})
    return state


def heavy_hitters(ds, col: str, k: int, *, m: int | None = None,
                  eps: float = DEFAULT_EPS,
                  delta: float = DEFAULT_DELTA) -> pa.Table:
    """Top-k heavy hitters without a key-space shuffle: MG candidates
    (pass 1) + CMS upper bounds (pass 2), ranked by (n_cms desc, key asc).
    Returns (key, n_mg, n_cms, n_stream); n_mg ≤ n_true ≤ n_cms and any
    key with n_true > N/(m+1) is guaranteed a candidate slot. ``ds`` is
    consumed twice (lazy lineage re-executes) — two streaming passes in
    place of vocab_topk's distinct-key shuffle."""
    m = m if m is not None else max(8 * k, 64)
    mg = mg_summary(ds, col, m=m)
    sketch = cms_build(ds, col, eps=eps, delta=delta)
    n_stream = int(sketch[0].sum())  # every CMS row sums to exactly N
    keys = mg["key"].to_pylist()
    upper = cms_query(sketch, keys)
    order = sorted(range(len(keys)), key=lambda i: (-int(upper[i]), keys[i]))[:k]
    return pa.table({
        "key": pa.array([keys[i] for i in order], pa.string()),
        "n_mg": pa.array([int(mg["n_mg"][i].as_py()) for i in order], pa.int64()),
        "n_cms": pa.array([int(upper[i]) for i in order], pa.int64()),
        "n_stream": pa.array([n_stream] * len(order), pa.int64()),
    })
