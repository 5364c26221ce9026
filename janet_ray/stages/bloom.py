"""Bloom-filter membership for streaming / incremental dedup — admit a new
shard against a multi-billion-key "already ingested" fingerprint set WITHOUT
shuffling either side (the classic CommonCrawl-refresh problem: the seen set
is too big to broadcast exactly, and a hash join re-shuffles the whole
increment every refresh).

Guarantees (the operator's contract, property-tested):
  * NO false negatives — a key that was inserted always tests positive, so a
    true duplicate is never re-admitted;
  * bounded false-positive rate — a novel key tests positive with
    probability ~fp_rate, i.e. a small, tunable fraction of genuinely new
    documents is dropped. That asymmetry (never re-ingest dups, lose ~1% of
    novel docs) is the standard trade for web-crawl refresh dedup.

Shape:
  * BUILD is a ``Dataset.aggregate`` with a custom ``AggregateFn`` whose
    accumulator is the fixed-size bitmap itself: each block ORs its keys'
    bits into a local bitmap (vectorized double hashing — two splitmix64
    streams, k indexes per key, one ``np.bitwise_or.reduceat``-free scatter),
    and merges OR two bitmaps. Ray's aggregation tree does the combining —
    the driver receives ONE final bitmap, never per-batch partials.
  * FILTER is a stateless ``map_batches`` against the ``ray.put`` bitmap
    (zero-copy numpy from plasma), testing all k probes vectorized.

Sizing: m = −n·ln(p)/ln2², k = m/n·ln2 (rounded), m rounded up to a power
of two so the modulo is a mask. 1e9 keys at 1% ≈ 1.2 GB — broadcast-able on
the design-point nodes; the bitmap, not the key set, is the memory bound.

Not SQL-expressible (false positives are hash artifacts, not relational
semantics) — correctness is pinned by property tests, and the registered
query is rows-only by declaration.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_params(n_expected: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits as a power of two, k probes) for the target rate."""
    if not 0 < fp_rate < 1:
        raise ValueError("fp_rate must be in (0, 1)")
    m = max(64, int(-n_expected * math.log(fp_rate) / (math.log(2) ** 2)))
    m = 1 << (m - 1).bit_length()  # power of two -> mask instead of mod
    k = max(1, round(m / n_expected * math.log(2)))
    return m, k


def _probe_indexes(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) uint64 bit indexes via double hashing."""
    x = keys.astype(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ _GOLDEN) | np.uint64(1)  # odd -> full-cycle stride
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m - 1)


def _set_bits(bitmap: np.ndarray, idx: np.ndarray) -> None:
    word, bit = idx >> np.uint64(6), idx & np.uint64(63)
    np.bitwise_or.at(bitmap, word.ravel(),
                     np.uint64(1) << bit.ravel())


def _test_bits(bitmap: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Row-wise AND over the k probes: True = maybe-seen."""
    word, bit = idx >> np.uint64(6), idx & np.uint64(63)
    hits = (bitmap[word] >> bit) & np.uint64(1)
    return hits.all(axis=1)


def build_bloom(ds, col: str, *, n_expected: int,
                fp_rate: float = 0.01) -> np.ndarray:
    """Distributed Bloom build over ds[col] (int64 keys); returns the final
    uint64-word bitmap. Combining happens in Ray's aggregate tree."""
    from ray.data.aggregate import AggregateFn

    m, k = bloom_params(n_expected, fp_rate)
    words = m >> 6

    def accumulate(bm, block) -> np.ndarray:
        if bm is None:
            bm = np.zeros(words, dtype=np.uint64)
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        keys = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if keys.size:
            _set_bits(bm, _probe_indexes(keys, m, k))
        return bm

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return np.bitwise_or(a, b)

    agg = AggregateFn(init=lambda _: None, merge=merge, name="bloom",
                      accumulate_block=accumulate,
                      finalize=lambda a: a)
    out = ds.aggregate(agg)
    bm = out["bloom"] if isinstance(out, dict) else out
    if bm is None:  # empty seen set
        bm = np.zeros(words, dtype=np.uint64)
    return bm


def bloom_filter_new(ds, seen, *, col: str = "fp", n_expected: int,
                     fp_rate: float = 0.01):
    """Rows of ``ds`` whose ds[col] is definitely NOT in seen[col] — drops
    every true duplicate plus ~fp_rate of novel rows (the contract above)."""
    import ray

    m, k = bloom_params(n_expected, fp_rate)
    bm_ref = ray.put(build_bloom(seen, col, n_expected=n_expected,
                                 fp_rate=fp_rate))

    def keep_new(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)  # zero-copy numpy from plasma
        keys = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not keys.size:
            return batch
        maybe_seen = _test_bits(bm, _probe_indexes(keys, m, k))
        return batch.filter(pa.array(~maybe_seen))

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------- SQL twin

_M64 = 1 << 64
_MASK32 = (1 << 32) - 1


def _sql_mul64(a: str, b: str) -> str:
    """(a * b) mod 2^64 over UBIGINT column refs — DuckDB raises on UBIGINT
    overflow, so the product is assembled from 32-bit halves in HUGEINT
    (schoolbook low-word: lo·lo + ((lo·hi + hi·lo mod 2^32) << 32))."""
    lo_a, hi_a = f"(({a}) & {_MASK32})", f"(({a}) >> 32)"
    lo_b, hi_b = f"(({b}) & {_MASK32})", f"(({b}) >> 32)"
    cross = (f"((CAST({hi_a} AS HUGEINT) * CAST({lo_b} AS HUGEINT) "
             f"+ CAST({lo_a} AS HUGEINT) * CAST({hi_b} AS HUGEINT)) "
             f"% {_MASK32 + 1})")
    return (f"CAST((CAST({lo_a} AS HUGEINT) * CAST({lo_b} AS HUGEINT) "
            f"+ {cross} * {_MASK32 + 1}) % {_M64} AS UBIGINT)")


def _sql_splitmix_ctes(prefix: str, x_col: str) -> tuple[str, str]:
    """Chained-CTE steps computing splitmix64(x_col); returns (cte_sql_block,
    final_column). Each step is one column derivation — no expression
    blowup."""
    g = int(_GOLDEN)
    b = 0xBF58476D1CE4E5B9
    c = 0x94D049BB133111EB
    p = prefix
    block = f""",
{p}a AS (SELECT *, CAST((CAST({x_col} AS HUGEINT) + {g}) % {_M64} AS UBIGINT)
                  AS {p}_x FROM {p}_in),
{p}b AS (SELECT *, xor({p}_x, {p}_x >> 30) AS {p}_u FROM {p}a),
{p}c AS (SELECT *, {_sql_mul64(f'{p}_u', f'CAST({b} AS UBIGINT)')} AS {p}_v
         FROM {p}b),
{p}d AS (SELECT *, xor({p}_v, {p}_v >> 27) AS {p}_w FROM {p}c),
{p}e AS (SELECT *, {_sql_mul64(f'{p}_w', f'CAST({c} AS UBIGINT)')} AS {p}_y
         FROM {p}d),
{p}f AS (SELECT *, xor({p}_y, {p}_y >> 31) AS {p}_out FROM {p}e)"""
    return block, f"{p}_out"


def bloom_new_sql(*, n_expected: int, fp_rate: float = 0.01,
                  source: str = "documents", seen_mod: int = 3) -> str:
    """DuckDB replay of the q_bloom_new_docs flow BIT-EXACTLY — false
    positives included: same md5-prefix key, same splitmix64 double-hash
    probe chain (mod-2^64 multiplies emulated in HUGEINT), same (m, k)
    geometry. A doc is admitted iff at least one of its k probe bits was
    never set by any seen key — hash artifacts replay identically, so this
    is a value oracle for an operator whose output *depends* on them."""
    m, k = bloom_params(n_expected, fp_rate)
    g = int(_GOLDEN)
    from janet_ray.stages.textstats import fingerprint_sql

    fp = f"CAST(('0x' || substr({fingerprint_sql('text')}, 1, 15)) AS BIGINT)"
    sm1, h1 = _sql_splitmix_ctes("s1", "xk")
    sm2, h2 = _sql_splitmix_ctes("s2", "xg")
    return f"""
WITH keyed AS (
  SELECT doc_id, {fp} AS fp, doc_id % {seen_mod} = 0 AS is_seen
  FROM {source}
),
s1_in AS (SELECT DISTINCT fp, CAST(fp AS UBIGINT) AS xk FROM keyed){sm1},
s2_in AS (SELECT fp, xk, {h1} AS h1, xor(xk, CAST({g} AS UBIGINT)) AS xg
          FROM s1f){sm2},
hashes AS (SELECT fp, h1, ({h2} | 1) AS h2 FROM s2f),
probes AS (
  SELECT fp,
         CAST((CAST(h1 AS HUGEINT)
               + CAST({_sql_mul64('CAST(g.i AS UBIGINT)', 'h2')} AS HUGEINT))
              % {_M64} AS UBIGINT) & {m - 1} AS bit
  FROM hashes, UNNEST(generate_series(0, {k - 1})) AS g(i)
),
seen_bits AS (
  SELECT DISTINCT p.bit FROM probes p
  JOIN (SELECT DISTINCT fp FROM keyed WHERE is_seen) s USING (fp)
)
SELECT kd.doc_id, kd.fp
FROM keyed kd
WHERE NOT kd.is_seen
  AND EXISTS (
    SELECT 1 FROM probes p
    WHERE p.fp = kd.fp AND p.bit NOT IN (SELECT bit FROM seen_bits))
"""
