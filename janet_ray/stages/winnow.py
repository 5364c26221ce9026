"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) —
the rolling-hash fingerprinting a training-data pipeline uses for local
near-dup / plagiarism-style overlap detection (SURVEY §2.11 family; the
reference's planned "De-dupe files" roadmap item, done content-defined).

Per document: tokenize (the engine-wide ``[a-z0-9]+`` lowercase contract) →
k-gram shingles → hash each gram → sliding windows of ``w`` consecutive gram
hashes → keep each window's MINIMUM. The selected set is the document's
fingerprint set: any shared substring of at least ``k + w − 1`` tokens between
two documents is guaranteed to produce at least one shared fingerprint
(winnowing's coverage guarantee), at an expected density of 2/(w+1).

Implementation notes:
  * the gram hash is the engine's content-addressed md5-u32 (first 8 hex
    digits of md5), the SAME hash the split/sampling operators use, rendered
    identically in SQL — parity by construction, and a DuckDB oracle can
    replay the whole operator exactly (``winnow_sql``). A multiplicative
    Rabin-Karp rolling hash would save the per-gram md5 at the cost of SQL
    replayability; the selection SEMANTICS (window minima) are identical.
  * **32-bit collision bias (production note)**: window-MIN selection biases
    kept fingerprints toward SMALL hash values, so once the corpus's distinct
    gram count passes the 32-bit birthday bound (~65k distinct grams start
    colliding; web corpora carry billions) cross-document collisions add
    shared fingerprints two documents never shared — an OVERestimate of the
    'exact' Jaccard numerator (unlike the max_df cut, whose documented bias
    is conservative). For production scale pass ``hash_bits=64`` (md5 64-bit
    prefix masked to int63, the same widening cms.py applied): first hard
    collision moves past 10^9 distinct grams. The 32-bit default stays
    because it is the SQL-replayable oracle configuration.
  * window minima are vectorized: ``sliding_window_view(hashes, w).min(1)``
    — no Python loop over windows; the per-gram hashing loop is O(tokens),
    the same shape as the LM bigram counter.
  * docs with ≥ k tokens but fewer than ``w`` grams fall back to a single
    window over all grams (min of all); docs with < k tokens emit nothing.
  * output is exploded DISTINCT (doc_id, fp) rows — the join-ready shape:
    candidate pairs are a self-join on fp (bucket groupby at scale, exactly
    the MinHash-band pattern in stages/dedup.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_K = 4  # tokens per gram
DEFAULT_W = 4  # grams per window

_TOKEN_RE = None  # compiled lazily to keep import light


def _tokens(text: str) -> list[str]:
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    return _TOKEN_RE.findall(text.lower())


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _md5_u63(s: str) -> int:
    # 64-bit md5 prefix masked to int63 so it rides pa.int64 columns
    # non-negative (fp % n_parts partition keys stay valid)
    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16) & ((1 << 63) - 1)


def doc_fingerprints(text: str, *, k: int = DEFAULT_K, w: int = DEFAULT_W,
                     hash_bits: int = 32) -> list[int]:
    """Sorted distinct winnowing fingerprints of one document.

    hash_bits=32 is the SQL-oracle configuration; 64 is the production-scale
    variant (see module docstring's collision-bias note)."""
    toks = _tokens(text or "")
    n = len(toks) - k + 1
    if n <= 0:
        return []
    h = _md5_u32 if hash_bits == 32 else _md5_u63
    hs = np.fromiter((h(" ".join(toks[i:i + k])) for i in range(n)),
                     dtype=np.int64, count=n)
    if n >= w:
        mins = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
    else:
        mins = hs.min(keepdims=True)
    return np.unique(mins).tolist()


def winnow_fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        k: int = DEFAULT_K, w: int = DEFAULT_W,
                        n_parts: int = 0, with_size: bool = False,
                        hash_bits: int = 32):
    """Exploded DISTINCT (doc_id, fp) fingerprint rows for the corpus —
    embarrassingly parallel per-batch map, no shuffle. With ``n_parts > 0`` the
    rows carry the fp-hash shuffle partition key (``part = fp % n_parts``) so a
    downstream bucket groupby needs no separate part-assign stage — the engine's
    fused-key rule (stages/dedup.py MinHashBandStage). With ``with_size=True``
    every posting also carries ``n``, the emitting doc's EXACT fingerprint-set
    size — complete at explode time because a doc is wholly inside one batch
    (the same locality the index build exploits for tf/dl in stages/index.py),
    which lets the near-dup scorer skip the set-size joins entirely."""

    def f(batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        fps_out: list[int] = []
        ns_out: list[int] = []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            fps = doc_fingerprints(t or "", k=k, w=w, hash_bits=hash_bits)
            # extend, not per-posting appends: two C-level calls per doc in
            # the hot explode stage instead of two interpreter calls per fp
            fps_out.extend(fps)
            ids_out.extend([did] * len(fps))
            if with_size:
                ns_out.extend([len(fps)] * len(fps))
        cols = {"doc_id": pa.array(ids_out, pa.int64()),
                "fp": pa.array(fps_out, pa.int64())}
        if with_size:
            cols["n"] = pa.array(ns_out, pa.int64())
        if n_parts:
            cols["part"] = pa.array(
                np.asarray(fps_out, dtype=np.int64) % n_parts
                if fps_out else np.zeros(0, dtype=np.int64), pa.int32())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_N_FP_PARTS = 64       # fp-bucket shuffle width (coarse-partition rule)
DEFAULT_MAX_DF = 64     # document-frequency cut: fps shared by more docs than
                        # this are stopword-like (a boilerplate phrase) — they
                        # explode the self-join quadratically and carry no
                        # near-dup signal, so they are dropped from the SHARED
                        # count (numerator candidates) only; per-doc set sizes
                        # (denominators) stay exact over ALL fingerprints, so
                        # the score is a conservative underestimate, never an
                        # overestimate. Same skew guard as the index stopword
                        # cut (stages/index.py).
DEFAULT_THRESHOLD = 0.5


def _pair_partials(tbl: pa.Table, max_df: int) -> pa.Table:
    """Per fp-partition pair kernel: ALL postings of an fp land in one
    partition (part = fp % n_parts), so a run's length IS the fp's global df.
    Sort by fp, detect runs, drop runs with df > max_df or < 2, emit each
    run's (id_a < id_b) pairs carrying both docs' exact set sizes, then
    pre-aggregate the shared-fp count per pair INSIDE the partition (Arrow
    group_by) — the downstream shuffle moves (ppart, id_a, id_b, n_a, n_b, s)
    partials, never one row per shared fingerprint. ``ppart`` is the fused
    coarse pair-partition key for the cross-partition fold (emitted by this
    compute stage per the engine shuffle rule — no separate assign stage)."""
    empty = pa.table({"ppart": pa.array([], pa.int32()),
                      "id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64())})
    if tbl.num_rows == 0 or "fp" not in tbl.column_names:
        return empty
    fp = tbl["fp"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, fp))
    fp, ids, ns = fp[order], ids[order], ns[order]
    bounds = np.concatenate([[0], np.nonzero(np.diff(fp))[0] + 1, [len(fp)]])
    starts, lens = bounds[:-1], np.diff(bounds)
    # Vectorized pair emission: group runs by LENGTH (≤ max_df − 1 distinct
    # values) and emit each length-class in one fancy-indexed matrix op — a
    # Python loop per run would iterate once per distinct fingerprint (most
    # runs are singletons), millions of times on a real partition.
    a_out, b_out, na_out, nb_out = [], [], [], []
    for m in np.unique(lens):
        if m < 2 or m > max_df:
            continue
        s_m = starts[lens == m]
        # rows: one run per row; ids within a run are distinct (and ascending)
        # because the (doc_id, fp) fingerprint rows are DISTINCT by
        # construction and the lexsort orders ids within each fp run
        idx = s_m[:, None] + np.arange(m)
        runs, nruns = ids[idx], ns[idx]
        iu, ju = np.triu_indices(m, 1)
        a_out.append(runs[:, iu].ravel())
        b_out.append(runs[:, ju].ravel())
        na_out.append(nruns[:, iu].ravel())
        nb_out.append(nruns[:, ju].ravel())
    if not a_out:
        return empty
    partial = (pa.table({"id_a": pa.array(np.concatenate(a_out)),
                         "id_b": pa.array(np.concatenate(b_out)),
                         "n_a": pa.array(np.concatenate(na_out)),
                         "n_b": pa.array(np.concatenate(nb_out))})
               .group_by(["id_a", "id_b", "n_a", "n_b"])
               .aggregate([([], "count_all")]))
    pa_ = partial["id_a"].to_numpy(zero_copy_only=False)
    pb_ = partial["id_b"].to_numpy(zero_copy_only=False)
    ppart = ((pa_ * 2654435761 + pb_) % _N_FP_PARTS).astype(np.int32)
    return pa.table({
        "ppart": pa.array(ppart),
        "id_a": partial["id_a"],
        "id_b": partial["id_b"],
        "n_a": partial["n_a"],
        "n_b": partial["n_b"],
        "s": pc.cast(partial["count_all"], pa.int64()),
    })


def _pair_sum(part: pa.Table) -> pa.Table:
    """Cross-partition fold: all partials of a pair co-locate via ppart; one
    Arrow C++ hash group_by sums the shared-fp counts. (Replaces the native
    4-key Sum aggregate — measured 17.4 s vs ~2 s on 1.26 M partials at w=1:
    the sort-based aggregate's multi-key merge dominates; the coarse pattern
    moves the same rows and folds vectorized.)"""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "n_a": pa.array([], pa.int64()),
                      "n_b": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64())})
    if part.num_rows == 0 or "s" not in part.column_names:
        return empty
    agg = (part.select(["id_a", "id_b", "n_a", "n_b", "s"])
           .group_by(["id_a", "id_b", "n_a", "n_b"])
           .aggregate([("s", "sum")]))
    return pa.table({
        "id_a": agg["id_a"],
        "id_b": agg["id_b"],
        "n_a": agg["n_a"],
        "n_b": agg["n_b"],
        "s": pc.cast(agg["s_sum"], pa.int64()),
    })


def winnow_neardup_pairs(ds, *, threshold: float = DEFAULT_THRESHOLD,
                         max_df: int = DEFAULT_MAX_DF,
                         k: int = DEFAULT_K, w: int = DEFAULT_W,
                         text_col: str = "text", id_col: str = "doc_id",
                         hash_bits: int = 32):
    """Near-duplicate (id_a < id_b, jaccard) pairs by EXACT fingerprint-set
    Jaccard over winnowing fingerprints — the content-defined alternative to
    MinHash (which estimates Jaccard; winnowing computes it exactly over the
    selected fingerprint set, with the SIGMOD'03 guarantee that any shared run
    of ≥ k+w−1 tokens contributes shared fingerprints).

    Shape (all coarse-partition, no per-key Python groups, ZERO joins —
    one lazy streaming chain with exactly two shuffles):
      1. fingerprint explode with fused fp-bucket key AND the emitting doc's
         exact set size ``n`` on every posting (a doc is wholly inside one
         batch, so its set size is complete at explode time — the same
         locality the inverted-index build exploits for tf/dl). Carrying n
         costs one int64 per posting and ELIMINATES both the second corpus
         pass for sizes and the two hash joins that would pull |A|, |B| onto
         each pair — and with them a Ray 2.49 landmine where a join whose
         first shuffled block is empty skips schema broadcast and crashes on
         rowless partitions.
      2. per fp-bucket (shuffle #1): df cut (run length IS global df) +
         length-classed vectorized pair emission + in-partition
         pre-aggregation → (id_a, id_b, n_a, n_b, s) partials.
      3. one coarse pair-partition fold (shuffle #2): partials carry a fused
         ppart key, all partials of a pair co-locate, and one Arrow C++ hash
         group_by per partition sums s (n_a, n_b are functionally dependent
         on the ids, so keying on all four changes nothing). This replaced
         the native 4-key Sum aggregate: measured 17.4 s → ~2 s on the 1.26 M
         partials the w=1 (exact n-gram jaccard) configuration emits — the
         sort-based aggregate's multi-key merge dominates at that group
         count. map_groups' schema-less empty-key-range blocks are guarded
         in the kernel and in score().
      4. jaccard = s/(n_a+n_b−s) per batch, filter ≥ threshold.

    SQL-replayable end to end (winnow_pairs_sql) from the same constants."""
    fps = winnow_fingerprints(ds, text_col=text_col, id_col=id_col, k=k, w=w,
                              n_parts=_N_FP_PARTS, with_size=True,
                              hash_bits=hash_bits)

    partials = fps.groupby("part").map_groups(
        lambda g: _pair_partials(g, max_df), batch_format="pyarrow")
    pairs = partials.groupby("ppart").map_groups(_pair_sum,
                                                batch_format="pyarrow")

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "s" not in batch.column_names:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = s / (na + nb - s)
        keep = j >= threshold
        return pa.table({
            "id_a": batch["id_a"].filter(pa.array(keep)),
            "id_b": batch["id_b"].filter(pa.array(keep)),
            "jaccard": pa.array(j[keep], pa.float64()),
        })

    return pairs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)


def winnow_pairs_sql(*, threshold: float = DEFAULT_THRESHOLD,
                     max_df: int = DEFAULT_MAX_DF,
                     k: int = DEFAULT_K, w: int = DEFAULT_W) -> str:
    """DuckDB replay of winnow_neardup_pairs from the same constants: the
    fingerprint CTE is winnow_sql verbatim; df cut on the numerator join only;
    denominators over all fingerprints; identical float division."""
    fps = winnow_sql(k=k, w=w)
    return f"""
WITH fps AS ({fps}),
df AS (SELECT fp, count(*) AS c FROM fps GROUP BY fp),
rare AS (SELECT f.doc_id, f.fp FROM fps f JOIN df USING (fp)
         WHERE df.c <= {max_df}),
sizes AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id),
shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(count(*) AS BIGINT) AS s
           FROM rare a JOIN rare b USING (fp)
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT sh.id_a, sh.id_b,
       CAST(sh.s AS DOUBLE) / (na.n + nb.n - sh.s) AS jaccard
FROM shared sh
JOIN sizes na ON sh.id_a = na.doc_id
JOIN sizes nb ON sh.id_b = nb.doc_id
WHERE CAST(sh.s AS DOUBLE) / (na.n + nb.n - sh.s) >= {threshold}
"""


def winnow_sql(*, k: int = DEFAULT_K, w: int = DEFAULT_W,
               source: str = "documents", text_expr: str = "text",
               id_col: str = "doc_id") -> str:
    """DuckDB rendering of the SAME semantics, generated from the same
    constants: k-grams by list slicing, md5-u32 gram hash, window minima by a
    ROWS frame, the same <w-grams fallback."""
    gram_expr = f"array_to_string(ts[i:i+{k - 1}], ' ')"
    hash_expr = (f"CAST(CAST(('0x' || substr(md5({gram_expr}), 1, 8)) "
                 "AS UBIGINT) AS BIGINT)")
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS ts
  FROM {source}
), grams AS (
  SELECT doc_id, i, {hash_expr} AS h
  FROM toks, UNNEST(range(1, len(ts) - {k} + 2)) AS t(i)
  WHERE len(ts) >= {k}
), mins AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS fp
  FROM grams
), sel AS (
  SELECT doc_id, fp FROM mins WHERE i >= {w}
  UNION ALL
  SELECT doc_id, min(h) AS fp FROM grams
  GROUP BY doc_id HAVING count(*) < {w}
)
SELECT DISTINCT doc_id, fp FROM sel
"""
