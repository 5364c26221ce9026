"""Domain-level stats filter — aggregate per-host corpus statistics, gate
hosts on exact-integer rules, keep only documents from passing hosts. This
is the aggregate→filter-parent step CC-style curation runs right after
host stats (`links.host_stats` / RefinedWeb "we remove over-represented
domains"): a spam farm contributing millions of near-identical pages is cut
as a DOMAIN, before any per-document scoring spends compute on it. The
reference-side analogue is the host grouping the rename flow's A6 dedupe
performs (`SURVEY.md` A6) — here the group is GATED, not deduped.

Gate (both conjuncts exact-int, no float means — value-hash-safe):

  * ``n_docs <= max_docs`` — over-representation cut;
  * ``sum_tokens >= min_mean_tokens * n_docs`` — mean-quality floor,
    cross-multiplied so the mean never materializes as a float.

Scale shape:

  1. map-side per-batch host partials (Arrow ``group_by``, one row per
     host per batch) → ONE small shuffle of partials →
     ``groupby(host).aggregate(Sum, Sum)`` — the host table is
     #distinct-hosts rows, orders of magnitude below the corpus;
  2. gate filter over the host table (stateless map);
  3. apply, scale-adaptive like `paradedup` / `quota`:
     - passing hosts ≤ ``broadcast_limit`` → the host set rides the object
       store once (`ray.put`) and documents filter in place with
       ``pc.is_in`` — ZERO corpus shuffles;
     - above it → cogroup-via-union on the host hash (the engine pattern):
       projected doc rows ∪ passing-host rows co-partition via
       `functions/partitioning.with_part`, one shuffle of narrow
       ``(doc_id, host, n_tokens)`` rows, per-partition ``is_in``.
       Both paths emit the same projected schema and are pinned equal by a
       forced-dispatch parity test.

Output: ``(doc_id, host, n_tokens)`` for surviving documents — the
projection a downstream per-document stage joins back on ``doc_id`` (the
row-group-pruned `checkpoint.lookup_url` pattern); re-shipping page payload
through the host shuffle would be waste when the consumer is a keyed read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from janet_ray.functions.partitioning import N_PARTS_DEFAULT, with_part


def host_partials(batch: pa.Table, *, host_col: str,
                  token_col: str) -> pa.Table:
    """One (host, n, tok) partial row per host per batch — the map-side
    combiner that keeps the host shuffle at #hosts×#batches rows."""
    agg = (pa.table({"host": batch[host_col], "tok": batch[token_col]})
           .group_by("host").aggregate([("tok", "count"), ("tok", "sum")]))
    return pa.table({
        "host": agg["host"],
        "n": agg["tok_count"].cast(pa.int64()),
        "tok": agg["tok_sum"].cast(pa.int64()),
    })


def host_table(ds, *, host_col: str = "host", token_col: str = "n_tokens"):
    """Per-host exact-int stats ``(host, n_docs, sum_tokens)``."""
    from ray.data.aggregate import Sum

    return (ds.map_batches(
                lambda b: host_partials(b, host_col=host_col,
                                        token_col=token_col),
                batch_format="pyarrow", zero_copy_batch=True)
            .groupby("host")
            .aggregate(Sum("n", alias_name="n_docs"),
                       Sum("tok", alias_name="sum_tokens")))


def gate_hosts(hosts, *, max_docs: int, min_mean_tokens: int):
    """Hosts passing both exact-int rules (module docstring)."""
    def gate(batch: pa.Table) -> pa.Table:
        # empty key-range partitions surface as zero-column blocks
        if "host" not in batch.column_names:
            return pa.table({"host": pa.array([], pa.string())})
        keep = pc.and_(
            pc.less_equal(batch["n_docs"], pa.scalar(max_docs, pa.int64())),
            pc.greater_equal(
                batch["sum_tokens"],
                pc.multiply(batch["n_docs"],
                            pa.scalar(int(min_mean_tokens), pa.int64()))))
        return batch.filter(keep).select(["host"])

    return hosts.map_batches(gate, batch_format="pyarrow",
                             zero_copy_batch=True)


def domain_filter(ds, *, host_col: str = "host", token_col: str = "n_tokens",
                  id_col: str = "doc_id", max_docs: int,
                  min_mean_tokens: int, broadcast_limit: int = 5_000_000,
                  force_dispatch: str | None = None,
                  n_parts: int = N_PARTS_DEFAULT):
    """Documents surviving the domain gate, projected to
    ``(doc_id, host, n_tokens)``. ``force_dispatch`` ∈ {None, "broadcast",
    "distributed"} pins the apply path for parity tests."""
    passing = gate_hosts(host_table(ds, host_col=host_col,
                                    token_col=token_col),
                         max_docs=max_docs,
                         min_mean_tokens=min_mean_tokens).materialize()
    n_pass = passing.count()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch[id_col],
                         "host": pc.cast(batch[host_col], pa.string()),
                         "n_tokens": pc.cast(batch[token_col], pa.int64())})

    use_broadcast = (force_dispatch == "broadcast"
                     or (force_dispatch is None and n_pass <= broadcast_limit))
    if use_broadcast:
        # bounded by broadcast_limit (or an explicit test override) — the
        # host set rides the object store once, corpus never shuffles
        # empty key-range partitions surface as ZERO-COLUMN blocks (the Ray
        # 2.49 empty-schema RefBundle artifact) — drop them before concat
        blocks = [b for b in (ray.get(r) for r in passing.to_arrow_refs())
                  if "host" in b.column_names]
        host_arr = (pa.concat_tables(blocks)["host"].combine_chunks()
                    .cast(pa.string()) if blocks
                    else pa.array([], pa.string()))
        host_ref = ray.put(host_arr)

        def bfilter(batch: pa.Table) -> pa.Table:
            from janet_ray.functions.broadcast import get_broadcast
            hosts = get_broadcast(host_ref)
            p = project(batch)
            return p.filter(pc.is_in(p["host"], value_set=hosts))

        return ds.map_batches(bfilter, batch_format="pyarrow",
                              zero_copy_batch=True)

    # cogroup-via-union scale path: narrow projected doc rows + host rows
    # co-partition on the host hash — one shuffle, per-partition is_in
    def tag_docs(batch: pa.Table) -> pa.Table:
        p = with_part(project(batch), ["host"], n_parts=n_parts)
        return p.append_column(
            "tag", pa.array(np.zeros(p.num_rows, dtype=np.int8)))

    def tag_hosts(batch: pa.Table) -> pa.Table:
        if "host" not in batch.column_names:
            batch = pa.table({"host": pa.array([], pa.string())})
        n = batch.num_rows
        t = with_part(pa.table({
            "doc_id": pa.array([None] * n, pa.int64()),
            "host": pc.cast(batch["host"], pa.string()),
            "n_tokens": pa.array([None] * n, pa.int64()),
        }), ["host"], n_parts=n_parts)
        return t.append_column(
            "tag", pa.array(np.ones(n, dtype=np.int8)))

    unioned = (ds.map_batches(tag_docs, batch_format="pyarrow",
                              zero_copy_batch=True)
               .union(passing.map_batches(tag_hosts, batch_format="pyarrow",
                                          zero_copy_batch=True)))

    def apply_part(part: pa.Table) -> pa.Table:
        id_type = (part["doc_id"].type if "doc_id" in part.column_names
                   else pa.int64())
        empty = pa.table({"doc_id": pa.array([], id_type),
                          "host": pa.array([], pa.string()),
                          "n_tokens": pa.array([], pa.int64())})
        if part.num_rows == 0 or "tag" not in part.column_names:
            return empty
        is_host = pc.equal(part["tag"], pa.scalar(1, pa.int8()))
        ok = pc.unique(part.filter(is_host)["host"].combine_chunks())
        docs = part.filter(pc.invert(is_host))
        keep = docs.filter(pc.is_in(docs["host"], value_set=ok))
        return keep.select(["doc_id", "host", "n_tokens"])

    return unioned.groupby("part").map_groups(apply_part,
                                              batch_format="pyarrow")


def domain_filter_sql(*, docs_sql: str, max_docs: int,
                      min_mean_tokens: int) -> str:
    """SQL twin over a relation producing (doc_id, host, n_tokens)."""
    return f"""
WITH d AS ({docs_sql}),
g AS (SELECT host FROM d GROUP BY host
      HAVING count(*) <= {max_docs}
         AND CAST(sum(n_tokens) AS BIGINT) >= {min_mean_tokens} * count(*))
SELECT doc_id, host, n_tokens FROM d WHERE host IN (SELECT host FROM g)
"""
