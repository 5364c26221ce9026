"""Deterministic domain-mixture construction — the Pile / DoReMi-style
"build a corpus with target domain proportions" step every pretraining
pipeline runs after curation: given per-domain weights and a total budget,
apportion integer quotas and draw a reproducible per-domain sample.

Pinned semantics (shared between the Ray path and the SQL twin):

  * quotas = largest-remainder (Hamilton) apportionment of ``total`` over
    the normalized weights — floor the shares, hand the remaining units to
    the largest fractional parts, ties broken by group name ascending.
    Computed once from constants (`mixture_quotas`) and rendered as
    LITERALS into both sides, so impl/oracle can't drift;
  * within a domain the sample is the engine's content-addressed rank:
    order by (md5_u32(id), id) ascending, keep rank ≤ quota — the same
    rule as quota sampling / orders_group_sample, reproducible across
    engines and runs; a domain smaller than its quota contributes all its
    rows (documented shortfall — no redistribution);
  * domains without a weight get quota 0 (dropped).

Scale shape: one hash-rank pass — the add-hash map is stateless, the
per-group rank is `rank.group_topk` (coarse hash partitions + vectorized
boundary detection, never per-key map_groups), and the quota cut is a
vectorized filter against a tiny broadcast quota table. The corpus text
never moves: sample on (group, id), then semi-join payloads if needed.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def mixture_quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder apportionment; deterministic (ties by name)."""
    if total < 0:
        raise ValueError("total must be >= 0")
    s = float(sum(weights.values()))
    if not weights or s <= 0:
        return {g: 0 for g in weights}
    shares = {g: w / s * total for g, w in weights.items()}
    base = {g: math.floor(v) for g, v in shares.items()}
    rem = total - sum(base.values())
    for g in sorted(shares, key=lambda g: (-(shares[g] - base[g]), g))[:rem]:
        base[g] += 1
    return base


def mixture_sample(ds, group_col: str, quotas: dict[str, int], *,
                   id_col: str = "doc_id", rank_col: str = "rank"):
    """(group, id, rank) rows of the mixture: rank ≤ quota[group] under the
    content-addressed (md5_u32(id), id) order. One group_topk pass at
    k = max(quota), then a vectorized per-group quota cut."""
    from janet_ray.stages.quota import _md5_u32_arr
    from janet_ray.stages.rank import group_topk

    max_q = max(quotas.values(), default=0)
    if max_q == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            group_col: pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            rank_col: pa.array([], pa.int64())}))

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = _md5_u32_arr(batch[id_col].to_pylist())
        return batch.append_column("h", pa.array(hs, pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    ranked = group_topk(hashed, [group_col], "h", max_q, descending=False,
                        tiebreak_cols=[id_col], rank_col=rank_col)

    def quota_cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([group_col, id_col, rank_col])
        q = np.fromiter((quotas.get(g, 0)
                         for g in batch[group_col].to_pylist()),
                        dtype=np.int64, count=batch.num_rows)
        keep = batch[rank_col].to_numpy(zero_copy_only=False) <= q
        return batch.filter(pa.array(keep)).select(
            [group_col, id_col, rank_col])

    return ranked.map_batches(quota_cut, batch_format="pyarrow",
                              zero_copy_batch=True)


def mixture_sample_sql(*, source: str, group_col: str,
                       quotas: dict[str, int], id_col: str = "doc_id",
                       md5_u32_sql, rank_col: str = "rank") -> str:
    """DuckDB replay: row_number under the same (md5_u32(id), id) order,
    quota literals rendered from the SAME `mixture_quotas` output."""
    case = " ".join(f"WHEN '{g}' THEN {q}" for g, q in sorted(quotas.items()))
    return f"""
SELECT {group_col}, {id_col}, {rank_col} FROM (
  SELECT {group_col}, {id_col},
         CAST(row_number() OVER (PARTITION BY {group_col} ORDER BY
              {md5_u32_sql(id_col)}, {id_col}) AS BIGINT) AS {rank_col}
  FROM {source}
) WHERE {rank_col} <= CASE {group_col} {case} ELSE 0 END
"""


def mixture_sample_tokens(ds, group_col: str, token_quotas: dict[str, int], *,
                          id_col: str = "doc_id", tok_col: str = "n_tokens",
                          n_parts: int = 64):
    """Token-budget mixture — the cut real pretraining mixes use (budgets are
    token counts, not document counts; GPT-3 Table 2.2 / Pile §1 report
    per-domain token shares). Within each domain, walk documents in the
    engine's content-addressed (md5_u32(id), id) order and keep a document
    while the tokens consumed BEFORE it are strictly under the domain's
    token quota: the boundary-crossing document is kept, so every sampled
    domain reaches AT LEAST its budget (shard lists are cut "at least
    budget"; exact truncation happens downstream at the sequence level —
    stages/pack.py). Domains without a budget are dropped; a domain smaller
    than its budget contributes all rows (documented shortfall, no
    redistribution — same contract as `mixture_sample`).

    Emits (group, id, n_tokens, tok_before) where ``tok_before`` is the
    exclusive in-domain running total, so the SQL twin's window-function
    replay value-hashes the cumulative arithmetic itself, not just the
    selected id set.

    Scale shape: ONE coarse hash shuffle on the domain (with_part — whole
    domains co-locate, partitions hold ~n_domains/n_parts domains), then a
    vectorized in-partition sort + groupwise exclusive cumsum. Only
    (group, id, n_tokens) rows move; text never shuffles. Domain count is
    small by construction (a mixture spec is human-written), so per-part
    row counts are input/n_domains-bounded — a single pathological domain
    holding most of the corpus still streams through its partition as
    int rows (16B/row ≈ 16 GB per 10^9 docs, object-store spillable)."""
    from janet_ray.functions.partitioning import with_part
    from janet_ray.stages.quota import _md5_u32_arr

    out_cols = [group_col, id_col, tok_col, "tok_before"]

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = _md5_u32_arr(batch[id_col].to_pylist())
        batch = batch.append_column("h", pa.array(hs, pa.int64()))
        return with_part(batch, [group_col], n_parts=n_parts)

    def token_cut(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = part.drop_columns(["part"])
        if t.num_rows == 0:
            # empty schema derived from the INPUT types (paradedup lesson:
            # hardcoding would mismatch non-string group columns)
            return pa.table({group_col: pa.array([], t.schema.field(group_col).type),
                             id_col: pa.array([], t.schema.field(id_col).type),
                             tok_col: pa.array([], pa.int64()),
                             "tok_before": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                            ("h", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        grps = t[group_col].to_pylist()
        tok = t[tok_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(tok)
        new = np.empty(n, dtype=bool)
        new[0] = True
        if n > 1:
            g = np.asarray(grps, dtype=object)
            new[1:] = g[1:] != g[:-1]
        excl = np.cumsum(tok) - tok                      # global exclusive cumsum
        start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        tok_before = excl - excl[start]                  # in-domain exclusive
        quota = np.fromiter((token_quotas.get(g, 0) for g in grps),
                            dtype=np.int64, count=n)
        keep = tok_before < quota
        t = t.append_column("tok_before", pa.array(tok_before, pa.int64()))
        return t.filter(pa.array(keep)).select(out_cols)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    return hashed.groupby("part").map_groups(token_cut, batch_format="pyarrow")


def mixture_tokens_sql(*, source: str, group_col: str,
                       token_quotas: dict[str, int], tok_expr: str,
                       md5_u32_sql, id_col: str = "doc_id",
                       tok_col: str = "n_tokens") -> str:
    """DuckDB replay: the same exclusive running-token window under the same
    (md5_u32(id), id) order, budget literals rendered from the SAME quota
    dict — impl and oracle cannot drift. ``tok_expr`` must be the engine's
    token-count twin (textstats.token_count_sql)."""
    case = " ".join(f"WHEN '{g}' THEN {q}"
                    for g, q in sorted(token_quotas.items()))
    return f"""
SELECT {group_col}, {id_col}, {tok_col}, tok_before FROM (
  SELECT {group_col}, {id_col},
         CAST({tok_expr} AS BIGINT) AS {tok_col},
         CAST(COALESCE(SUM(CAST({tok_expr} AS BIGINT)) OVER (
              PARTITION BY {group_col}
              ORDER BY {md5_u32_sql(id_col)}, {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_before
  FROM {source})
WHERE tok_before < CASE {group_col} {case} ELSE 0 END
"""


def mixture_sample_epochs(ds, group_col: str, quotas: dict[str, int], *,
                          id_col: str = "doc_id", n_parts: int = 64):
    """Mixture draw WITH repetition — the Pile-style upsample (Gao et al.
    2020 Table 1 lists per-set epochs >1: a domain smaller than its quota is
    repeated, with an epoch counter, until the quota is met). Deterministic
    replay of round-robin sampling: domain g with n docs (content-addressed
    rank rn = 1..n) and quota q emits doc rn at epoch e for every e ≥ 0 with
    ``e*n + rn <= q`` — exactly the sequence "draw ranks 1..n, wrap, repeat"
    truncated at q draws. q ≤ n degenerates to the plain `mixture_sample`
    cut at epoch 0; unbudgeted domains drop.

    Emits (group, id, rank, epoch) — the training loader consumes epoch as
    the shuffle-salt so repeated copies land in different shards
    (stages/shards.py).

    Scale shape: identical to `mixture_sample_tokens` — ONE coarse hash
    shuffle on the domain, vectorized in-partition rank + repeat-emit; only
    (group, id) rows move, and the output is quota-bounded (Σq rows total),
    never corpus-bounded."""
    from janet_ray.functions.partitioning import with_part
    from janet_ray.stages.quota import _md5_u32_arr

    out_cols = [group_col, id_col, "rank", "epoch"]

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = _md5_u32_arr(batch[id_col].to_pylist())
        batch = batch.append_column("h", pa.array(hs, pa.int64()))
        return with_part(batch, [group_col], n_parts=n_parts)

    def epoch_emit(part: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = part.drop_columns(["part"])
        # empty/total==0 schema derived from the INPUT types (paradedup
        # lesson: hardcoding would mismatch non-string group columns)
        empty = pa.table({group_col: pa.array([], t.schema.field(group_col).type),
                          id_col: pa.array([], t.schema.field(id_col).type),
                          "rank": pa.array([], pa.int64()),
                          "epoch": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        idx = pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                            ("h", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        grps = t[group_col].to_pylist()
        n = len(grps)
        new = np.empty(n, dtype=bool)
        new[0] = True
        if n > 1:
            g = np.asarray(grps, dtype=object)
            new[1:] = g[1:] != g[:-1]
        start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        rn = np.arange(n, dtype=np.int64) - start + 1          # in-domain rank
        # domain size, broadcast to rows: next boundary - this boundary
        bounds = np.flatnonzero(new)
        sizes = np.diff(np.append(bounds, n))
        n_g = np.repeat(sizes, sizes).astype(np.int64)
        q = np.fromiter((quotas.get(g, 0) for g in grps),
                        dtype=np.int64, count=n)
        reps = np.maximum((q - rn) // n_g + 1, 0)              # 0 when rn > q
        total = int(reps.sum())
        if total == 0:
            return empty
        src = np.repeat(np.arange(n), reps)
        offs = np.repeat(np.cumsum(reps) - reps, reps)
        epoch = np.arange(total, dtype=np.int64) - offs
        t = t.append_column("rank", pa.array(rn, pa.int64()))
        out = t.take(pa.array(src))
        return out.append_column("epoch",
                                 pa.array(epoch, pa.int64())).select(out_cols)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    return hashed.groupby("part").map_groups(epoch_emit, batch_format="pyarrow")


def mixture_epochs_sql(*, source: str, group_col: str,
                       quotas: dict[str, int], md5_u32_sql,
                       id_col: str = "doc_id") -> str:
    """DuckDB replay: the same rank window joined to an epoch series under
    ``e*n + rn <= quota`` — quota literals from the SAME dict. The series is
    bounded by max(quota) (with n >= 1 and rn >= 1, e <= q-1 always)."""
    case = " ".join(f"WHEN '{g}' THEN {q}" for g, q in sorted(quotas.items()))
    max_q = max(quotas.values(), default=0)
    return f"""
WITH ranked AS (
  SELECT {group_col}, {id_col},
         CAST(row_number() OVER (PARTITION BY {group_col} ORDER BY
              {md5_u32_sql(id_col)}, {id_col}) AS BIGINT) AS rank,
         CAST(count(*) OVER (PARTITION BY {group_col}) AS BIGINT) AS n
  FROM {source}),
epochs AS (SELECT CAST(range AS BIGINT) AS epoch FROM range(0, {max_q}))
SELECT {group_col}, {id_col}, rank, epoch
FROM ranked, epochs
WHERE epoch * n + rank <= CASE {group_col} {case} ELSE 0 END
"""
