"""PMI collocation extraction (Church & Hanks 1990) — corpus-wide top-k
bigram collocations, the classic corpus-analysis primitive a training-data
pipeline runs to surface multiword units (named entities, boilerplate
phrases, tokenizer-merge candidates beyond BPE's greedy frequency rule).

Score: the PMI *ratio* p(ab)/(p(a)·p(b)) = c_ab·Tu²/(c_a·c_b·Tb), where c
are corpus counts, Tu total unigrams, Tb total bigrams. The log is omitted
deliberately — ln is monotone, so the RANKING is identical, and dropping it
makes the score an IEEE-exact chain of int→double conversions (< 2⁵³, exact)
and correctly-rounded multiply/divides that DuckDB reproduces bit-for-bit —
a value-hash-strict SQL oracle for a float-scored operator. A ``min_count``
cut (standard practice: PMI is noise-dominated for rare pairs) bounds the
candidate set before any join.

Scale shape:
  * unigram and bigram counts are per-batch Arrow ``value_counts``/
    ``group_by`` partials folded by ONE distributed groupby each — the token
    stream itself never shuffles (the vocab_topk pattern, pairs included);
  * the ``min_count`` filter lands BEFORE the two count-attach joins, so the
    joins move only surviving bigrams (∝ collocation candidates, not corpus);
  * both joins go through ``joins.drop_empty_blocks`` (the Ray 2.49
    empty-first-block schema-broadcast guard);
  * top-k is a per-batch partial reduce then a single-partition final — only
    (w1, w2, counts, score) rows ever reach one worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"  # the engine-wide tokenizer contract

DEFAULT_TOP_K = 50
DEFAULT_MIN_COUNT = 5


def _token_lists(batch: pa.Table, text_col: str):
    return pc.split_pattern_regex(
        pc.utf8_lower(pc.coalesce(batch[text_col], pa.scalar("", pa.string()))),
        pattern=TOKEN_SPLIT_PATTERN)


def _count_partials(batch: pa.Table, *, text_col: str) -> pa.Table:
    """ONE tokenize pass emitting both unigram and bigram per-batch counts:
    (kind 0 = unigram with w2='', kind 1 = within-document adjacent pair).
    Fully vectorized — flatten with parents, pair token i with i+1 when both
    belong to the same document."""
    empty = pa.table({"kind": pa.array([], pa.int8()),
                      "w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    toks = _token_lists(batch, text_col)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    words = flat.to_numpy(zero_copy_only=False)
    par = parents.to_numpy(zero_copy_only=False)
    keep = words != ""
    words, par = words[keep], par[keep]
    if len(words) == 0:
        return empty
    flat_kept = pa.array(words, pa.string())
    vc = flat_kept.value_counts()
    uni = pa.table({
        "kind": pa.array(np.zeros(len(vc), dtype=np.int8)),
        "w1": vc.field("values"),
        "w2": pa.array([""] * len(vc), pa.string()),
        "n": pc.cast(vc.field("counts"), pa.int64()),
    })
    if len(words) < 2:
        return uni
    same_doc = par[1:] == par[:-1]
    t = pa.table({"w1": pa.array(words[:-1][same_doc], pa.string()),
                  "w2": pa.array(words[1:][same_doc], pa.string())})
    g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    big = pa.table({
        "kind": pa.array(np.ones(g.num_rows, dtype=np.int8)),
        "w1": g["w1"],
        "w2": g["w2"],
        "n": pc.cast(g["count_all"], pa.int64()),
    })
    return pa.concat_tables([uni, big])


def pmi_collocations(ds, *, text_col: str = "text",
                     top_k: int = DEFAULT_TOP_K,
                     min_count: int = DEFAULT_MIN_COUNT,
                     small_limit: int = 1_000_000,
                     force_dispatch: str | None = None):
    """Top-k (w1, w2, c_ab, score) collocations, score = c_ab·Tu²/(c_a·c_b·Tb)
    computed as the exact IEEE chain float(c_ab)·Tu/c_a·Tu/c_b/Tb (left-
    associative — the SQL twin writes the same chain). Ordered by
    (score desc, w1, w2).

    Scale-adaptive count-attach (parity-pinned): when the surviving bigram
    + unigram tables total at most ``small_limit`` rows, the attach + score
    + top-k run in one driver-side numpy pass (two Ray hash joins on tables
    this small are pure fixed overhead — measured several seconds of join
    scheduling for a few hundred rows); above it, the distributed joins run
    as before. ``force_dispatch`` ∈ {"small", "joins"} pins a path."""
    import numpy as np

    from ray.data.aggregate import Sum

    from janet_ray.stages.joins import drop_empty_blocks

    # ONE corpus pass (tokenize once) emits both partial kinds; the partials
    # are materialized so the two downstream groupbys don't re-execute the
    # corpus read from lineage — partials volume is per-batch DISTINCT
    # unigrams + bigrams (vocab-shaped), never the token stream
    partials = ds.map_batches(
        lambda b: _count_partials(b, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    uni_raw = (partials.filter(expr="kind == 0")
               .map_batches(lambda b: pa.table({"w": b["w1"], "n": b["n"]}),
                            batch_format="pyarrow")
               .groupby("w").aggregate(Sum("n", alias_name="c")))
    big_raw = (partials.filter(expr="kind == 1")
               .map_batches(lambda b: b.select(["w1", "w2", "n"]),
                            batch_format="pyarrow")
               .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="c_ab")))

    # corpus totals: O(blocks) folds over the (already aggregated) count
    # tables — aggregate-small, never the token stream
    uni = uni_raw.materialize()
    big = big_raw.materialize()
    tu = int(uni.sum("c") or 0)  # Dataset.sum is None on an empty dataset
    tb = int(big.sum("c_ab") or 0)
    if not tb:
        return ray_empty()

    surv = drop_empty_blocks(
        big.filter(expr=f"c_ab >= {int(min_count)}").materialize())
    n_surv = surv.count()
    if n_surv == 0:
        return ray_empty()

    small = n_surv + uni.count() <= small_limit
    if force_dispatch == "small":
        small = True
    elif force_dispatch == "joins":
        small = False
    if small:
        # driver-side attach: both tables are aggregate-small here by the
        # dispatch bound; searchsorted probe over the sorted unigram vocab
        import pyarrow as _pa

        ut = _pa.concat_tables(list(uni.iter_batches(
            batch_size=None, batch_format="pyarrow")))
        st = _pa.concat_tables(list(surv.iter_batches(
            batch_size=None, batch_format="pyarrow")))
        uw = np.asarray(ut["w"].to_pylist(), dtype=object)
        uc = ut["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(uw)
        uw, uc = uw[order], uc[order]
        w1 = np.asarray(st["w1"].to_pylist(), dtype=object)
        w2 = np.asarray(st["w2"].to_pylist(), dtype=object)
        cab = st["c_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = uc[np.searchsorted(uw, w1)]
        cb = uc[np.searchsorted(uw, w2)]
        # the SAME IEEE op chain as the joins path / the SQL twin
        score = cab * float(tu) / ca * float(tu) / cb / float(tb)
        t = pa.table({"w1": pa.array(w1.tolist(), pa.string()),
                      "w2": pa.array(w2.tolist(), pa.string()),
                      "c_ab": pc.cast(st["c_ab"], pa.int64()),
                      "score": pa.array(score, pa.float64())})
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                            ("w1", "ascending"),
                                            ("w2", "ascending")])
        import ray.data

        return ray.data.from_arrow(t.take(idx[:top_k]))

    ua = drop_empty_blocks(uni.map_batches(
        lambda b: pa.table({"w1": b["w"], "c_a": b["c"]}),
        batch_format="pyarrow").materialize())
    ub = drop_empty_blocks(uni.map_batches(
        lambda b: pa.table({"w2": b["w"], "c_b": b["c"]}),
        batch_format="pyarrow").materialize())
    joined = surv.join(ua, "inner", 8, on=("w1",))
    joined = drop_empty_blocks(joined.materialize())
    joined = joined.join(ub, "inner", 8, on=("w2",))

    def score_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c_ab" not in batch.column_names:
            return _empty_table()
        cab = batch["c_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = batch["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = batch["c_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        # EXACT op order shared with the SQL twin: ((((c_ab·Tu)/c_a)·Tu)/c_b)/Tb
        score = cab * float(tu) / ca * float(tu) / cb / float(tb)
        t = pa.table({"w1": batch["w1"], "w2": batch["w2"],
                      "c_ab": pc.cast(batch["c_ab"], pa.int64()),
                      "score": pa.array(score, pa.float64())})
        idx = pc.sort_indices(t, sort_keys=[("score", "descending"),
                                            ("w1", "ascending"),
                                            ("w2", "ascending")])
        return t.take(idx[:top_k])

    def final_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "score" not in batch.column_names:
            return _empty_table()
        idx = pc.sort_indices(batch, sort_keys=[("score", "descending"),
                                                ("w1", "ascending"),
                                                ("w2", "ascending")])
        return batch.take(idx[:top_k])

    return (joined.map_batches(score_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final_topk, batch_format="pyarrow", batch_size=None))


def _empty_table() -> pa.Table:
    return pa.table({"w1": pa.array([], pa.string()),
                     "w2": pa.array([], pa.string()),
                     "c_ab": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())})


def ray_empty():
    import ray.data

    return ray.data.from_arrow(_empty_table())


def pmi_sql(*, source: str = "documents", text_expr: str = "text",
            top_k: int = DEFAULT_TOP_K,
            min_count: int = DEFAULT_MIN_COUNT) -> str:
    """DuckDB replay: same tokenizer, same counts, the SAME left-associative
    IEEE score chain (see module docstring), same (score desc, w1, w2) order."""
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower({text_expr}), '[a-z0-9]+') AS t FROM {source}
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
tu AS (SELECT CAST(sum(c) AS BIGINT) AS v FROM uni),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c_ab
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  GROUP BY w1, w2
),
tb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS v FROM big)
SELECT b.w1, b.w2, b.c_ab,
       CAST(b.c_ab AS DOUBLE) * tu.v / a.c * tu.v / c.c / tb.v AS score
FROM big b
JOIN uni a ON a.w = b.w1
JOIN uni c ON c.w = b.w2
CROSS JOIN tu CROSS JOIN tb
WHERE b.c_ab >= {int(min_count)}
ORDER BY score DESC, b.w1, b.w2
LIMIT {int(top_k)}
"""
