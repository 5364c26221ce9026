"""Distributed PageRank over an edge list — link-graph centrality for
web-corpus quality weighting (the RefinedWeb / Common-Crawl-ranking use of
centrality: score pages by the link graph, weight or filter the extraction
output by the score).

Pinned semantics (the textbook power iteration, replicated exactly by the
single-process reference in tests/test_graph.py):

  * nodes    = distinct(src) ∪ distinct(dst); N = |nodes|;
  * rank_0   = 1/N;
  * step     : rank'(v) = (1−d)/N + d·(Σ_{(u,v)∈E} rank(u)/outdeg(u)
                                       + dangling_mass/N),
    where dangling_mass = Σ rank(u) over nodes with outdeg 0 (the standard
    uniform redistribution, so Σ rank stays 1 every iteration);
  * fixed iteration count (convergence tolerance is the caller's policy —
    web-scale runs pin iterations for reproducibility).

Shape per iteration (PageRank is inherently one all-to-all per step; the
job is to make each step ONE coarse shuffle of narrow rows, not to avoid
it):

  1. ranks ∪ edges, tagged, carrying a fused coarse partition key on the
     SOURCE node (the engine's cogroup-via-union pattern — no Dataset.join,
     so no Ray 2.49 empty-first-block landmine): per partition a vectorized
     key-run kernel divides each source's rank over its out-edges (outdeg
     is the run length — never precomputed, never joined) and emits
     (dst, contribution) plus a dangling sentinel row per rank-only run;
  2. contributions ∪ node markers, partitioned on the DESTINATION node:
     per partition one Arrow group-sum + the damping formula. Node markers
     guarantee every node emits a row even with zero in-links.

Rows shuffled are (part, key, tag, val, dst) int64/float64 — payloads never
move. Ranks materialize once per iteration (they are consumed by the next
step and by the dangling-mass fold; lineage must not re-run prior steps).
Driver state: N and dangling_mass, two scalars.

Not SQL-expressible as a value oracle (iterative float refinement; the
accumulation order differs between engines) — pinned by exact-semantics
reference parity and conservation properties in pytest; the registered
query is rows-only by declaration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAMPING = 0.85
_N_PARTS = 64
_DANGLING = np.int64(-1)
# Node ids must be NON-NEGATIVE: the distributed kernels use -1 as the
# dangling/marker sentinel key, so a legitimate node id -1 would fold its
# contributions into the dangling mass (pagerank) or read edge rows as
# score rows (hits). Enforced at the pair-ingest map — a silent mis-score
# is worse than a loud contract error. (The engine's ids — doc_ids and the
# 10M-offset link-target range — are non-negative by construction.)


def _check_nonneg(*arrays: np.ndarray) -> None:
    for a in arrays:
        if len(a) and a.min() < 0:
            raise ValueError(
                "graph node ids must be non-negative (-1 is the internal "
                "dangling/marker sentinel); remap ids before calling")


def _tag_table(key: np.ndarray, tag: int, val: np.ndarray,
               dst: np.ndarray, n_parts: int) -> pa.Table:
    return pa.table({
        "part": pa.array((key % n_parts).astype(np.int32)),
        "key": pa.array(key),
        "tag": pa.array(np.full(len(key), tag, dtype=np.int8)),
        "val": pa.array(val),
        "dst": pa.array(dst),
    })


def _contrib_kernel(part: pa.Table) -> pa.Table:
    """Per source-partition: split each source's rank over its out-edges.
    Sorted by (key, tag) each key run is [rank row, edge rows...]; outdeg is
    run length − 1; a run with no edge rows is dangling and emits its whole
    rank on the sentinel key."""
    empty = pa.table({"key": pa.array([], pa.int64()),
                      "val": pa.array([], pa.float64())})
    if part.num_rows == 0 or "key" not in part.column_names:
        return empty
    k = part["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = part["tag"].to_numpy(zero_copy_only=False).astype(np.int8)
    v = part["val"].to_numpy(zero_copy_only=False).astype(np.float64)
    dst = part["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((t, k))
    k, t, v, dst = k[order], t[order], v[order], dst[order]
    bounds = np.concatenate([[0], np.nonzero(np.diff(k))[0] + 1, [len(k)]])
    starts, lens = bounds[:-1], np.diff(bounds)
    # every run begins with exactly one rank row (tag 0): nodes ⊇ sources
    ranks = v[starts]
    outdeg = lens - 1
    dangling = outdeg == 0
    # edge rows: every position not at a run start
    mask = np.ones(len(k), dtype=bool)
    mask[starts] = False
    per_edge = np.repeat(
        np.where(outdeg > 0, ranks / np.maximum(outdeg, 1), 0.0), lens)
    out_key = np.concatenate([dst[mask],
                              np.full(int(dangling.sum()), _DANGLING)])
    out_val = np.concatenate([per_edge[mask], ranks[dangling]])
    return pa.table({"key": pa.array(out_key), "val": pa.array(out_val)})


def _apply_kernel(part: pa.Table, *, n_nodes: int, dangling_mass: float,
                  damping: float) -> pa.Table:
    """Per destination-partition: sum contributions per node (markers make
    every node present) and apply the damping formula."""
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
    if part.num_rows == 0 or "key" not in part.column_names:
        return empty
    agg = (part.select(["key", "val"]).group_by("key")
           .aggregate([("val", "sum")]))
    csum = agg["val_sum"].to_numpy(zero_copy_only=False)
    base = (1.0 - damping) / n_nodes
    rank = base + damping * (csum + dangling_mass / n_nodes)
    return pa.table({"node": agg["key"], "rank": pa.array(rank)})


def _bounded(ds, n_parts: int):
    """Materialize and cap the block count at ``n_parts``. Block-count
    discipline is THE cost driver of the loop: Ray's sort-based groupby and
    map_groups both preserve the input block count, so a many-tiny-block
    input (from_items' default 200 parallelism) or the per-iteration
    ranks ∪ edges union would compound blocks every iteration — measured
    ~50 ms/block/sort in local mode, i.e. minutes for a 50-node graph.
    Repartitioning narrow (≤5 int64/float64 cols) rows is cheap relative to
    one saved sort and keeps every iteration's shuffle at a flat grain."""
    ds = ds.materialize()
    if ds.num_blocks() > n_parts:
        ds = ds.repartition(n_parts).materialize()
    return ds


def _pagerank_local(src: np.ndarray, dst: np.ndarray, *, iters: int,
                    damping: float) -> pa.Table:
    """The whole power iteration over one in-memory edge array — the same
    pinned semantics (dense-array form), zero shuffles. Used by the
    single-worker fast path."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    dangling = outdeg == 0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        per_edge = np.where(dangling, 0.0, r / np.maximum(outdeg, 1.0))
        contrib = np.bincount(d, weights=per_edge[s], minlength=n)
        dm = float(r[dangling].sum())
        r = (1.0 - damping) / n + damping * (contrib + dm / n)
    return pa.table({"node": pa.array(nodes.astype(np.int64)),
                     "rank": pa.array(r)})


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 5, damping: float = DAMPING,
             n_parts: int = _N_PARTS,
             local_edge_limit: int = 5_000_000):
    """(node, rank) after ``iters`` exact power iterations over the edge
    list. ``edges`` is any Dataset with two int64 node columns. ``n_parts``
    is both the coarse shuffle grain and the block-count cap — size it to
    the cluster (64 default; tests use small values so tiny graphs don't
    pay web-scale shuffle constants).

    Scale-adaptive (the BPE precedent): when the edge list is ≤
    ``local_edge_limit`` rows (~80 MB of int64 pairs), the whole iteration
    runs inside ONE Ray worker task with the same pinned semantics — the
    distributed loop's two shuffles per iteration are pure fixed overhead
    at that size (measured ~0.9 s/iteration in local mode for graphs the
    kernel folds in milliseconds). Above the limit the per-iteration
    cogroup-via-union loop runs, shuffling only narrow rows."""

    def to_pairs(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _check_nonneg(s, d)
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    pairs = _bounded(edges.map_batches(to_pairs, batch_format="pyarrow",
                                       zero_copy_batch=True), n_parts)

    if pairs.count() <= local_edge_limit:
        import ray

        @ray.remote
        def _local(refs):
            tbls = [t for t in ray.get(refs) if t.num_rows]
            if not tbls:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "rank": pa.array([], pa.float64())})
            whole = pa.concat_tables(tbls, promote_options="default")
            return _pagerank_local(
                whole["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                whole["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                iters=iters, damping=damping)

        result = ray.get(_local.remote(list(pairs.to_arrow_refs())))
        import ray.data

        return ray.data.from_arrow(result)

    def node_rows(batch: pa.Table) -> pa.Table:
        ns = np.unique(np.concatenate([
            batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"part": pa.array((ns % n_parts).astype(np.int32)),
                         "node": pa.array(ns)})

    def distinct_nodes(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "node" not in part.column_names:
            return pa.table({"node": pa.array([], pa.int64())})
        ns = np.unique(part["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(ns)})

    # distinct via the coarse-part pattern, NOT groupby(node).count(): the
    # native aggregate shuffles into its default 200 partitions, and those
    # 200 blocks would ride every union/sort of every later iteration
    # (measured: 75 s/iteration on a 50-node graph vs ~1 s with this shape)
    nodes = (pairs.map_batches(node_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("part").map_groups(distinct_nodes,
                                         batch_format="pyarrow")
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.int64()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    def edge_tagged(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _tag_table(s, 1, np.zeros(len(s), dtype=np.float64), d,
                          n_parts)

    edges_t = _bounded(pairs.map_batches(edge_tagged, batch_format="pyarrow",
                                         zero_copy_batch=True), n_parts)

    init = 1.0 / n_nodes

    def rank0(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(n),
                         "rank": pa.array(np.full(len(n), init))})

    ranks = _bounded(nodes.map_batches(rank0, batch_format="pyarrow",
                                       zero_copy_batch=True), n_parts)

    def marker(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(n), dtype=np.float64)
        return _tag_table(n, 0, z, np.full(len(n), _DANGLING), n_parts)

    markers = _bounded(nodes.map_batches(marker, batch_format="pyarrow",
                                         zero_copy_batch=True), n_parts)

    for _ in range(iters):
        def rank_tagged(batch: pa.Table) -> pa.Table:
            n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            r = batch["rank"].to_numpy(zero_copy_only=False)
            return _tag_table(n, 0, r, np.full(len(n), _DANGLING), n_parts)

        tagged = ranks.map_batches(rank_tagged, batch_format="pyarrow",
                                   zero_copy_batch=True).union(edges_t)
        contribs = (tagged.groupby("part")
                    .map_groups(_contrib_kernel, batch_format="pyarrow")
                    .materialize())

        def dm_partial(b: pa.Table) -> pa.Table:
            kk = b["key"].to_numpy(zero_copy_only=False)
            vv = b["val"].to_numpy(zero_copy_only=False)
            return pa.table({"dm": pa.array([float(vv[kk == _DANGLING].sum())],
                                            pa.float64())})

        dm_rows = contribs.map_batches(dm_partial, batch_format="pyarrow",
                                       zero_copy_batch=True).take_all()
        dangling_mass = float(sum(r["dm"] for r in dm_rows))

        def contrib_tagged(batch: pa.Table) -> pa.Table:
            kk = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
            vv = batch["val"].to_numpy(zero_copy_only=False)
            keep = kk != _DANGLING
            kk, vv = kk[keep], vv[keep]
            return _tag_table(kk, 1, vv, np.full(len(kk), _DANGLING),
                              n_parts)

        stage2 = contribs.map_batches(contrib_tagged, batch_format="pyarrow",
                                      zero_copy_batch=True).union(markers)
        dm, nn, d = dangling_mass, n_nodes, damping
        # _bounded stops the union's block-count compounding: without it
        # ranks grows by edges_t.num_blocks() every iteration (map_groups
        # preserves the sorted union's block count).
        ranks = _bounded(
            (stage2.groupby("part")
             .map_groups(lambda p: _apply_kernel(
                 p, n_nodes=nn, dangling_mass=dm, damping=d),
                 batch_format="pyarrow")), n_parts)
    return ranks


# ------------------------------------------------------------------- HITS

def _hits_local(src: np.ndarray, dst: np.ndarray, *, iters: int) -> pa.Table:
    """Kleinberg HITS over one in-memory edge array: a = Σ_in h, h = Σ_out a,
    both L2-normalized each iteration (ranks init 1)."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "hub": pa.array([], pa.float64()),
                         "authority": pa.array([], pa.float64())})
    s = np.searchsorted(nodes, src)
    d = np.searchsorted(nodes, dst)
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(iters):
        a = np.bincount(d, weights=h[s], minlength=n)
        na = np.linalg.norm(a)
        a = a / na if na else a
        h = np.bincount(s, weights=a[d], minlength=n)
        nh = np.linalg.norm(h)
        h = h / nh if nh else h
    return pa.table({"node": pa.array(nodes.astype(np.int64)),
                     "hub": pa.array(h), "authority": pa.array(a)})


def hits(edges, *, src_col: str = "src", dst_col: str = "dst",
         iters: int = 5, n_parts: int = _N_PARTS,
         local_edge_limit: int = 5_000_000):
    """(node, hub, authority) after ``iters`` HITS iterations — the other
    classic link-analysis scoring (Kleinberg 1999; spam/seed detection uses
    both directions where PageRank gives one). Same pinned semantics as the
    single-process reference in tests/test_graph.py.

    Scale shape mirrors ``pagerank``: scale-adaptive single-worker fast path
    under ``local_edge_limit``; above it, each iteration is TWO
    cogroup-via-union shuffles of narrow rows (scores ∪ edges on the source
    side emits per-edge authority contributions keyed by dst; the mirrored
    pass emits hub contributions keyed by src) plus one O(blocks) driver
    fold for each L2 norm. Block-count discipline via ``_bounded``."""
    import ray

    def to_pairs(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _check_nonneg(s, d)
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    pairs = _bounded(edges.map_batches(to_pairs, batch_format="pyarrow",
                                       zero_copy_batch=True), n_parts)

    if pairs.count() <= local_edge_limit:
        @ray.remote
        def _local(refs):
            tbls = [t for t in ray.get(refs) if t.num_rows]
            if not tbls:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "hub": pa.array([], pa.float64()),
                                 "authority": pa.array([], pa.float64())})
            whole = pa.concat_tables(tbls, promote_options="default")
            return _hits_local(
                whole["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                whole["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
                iters=iters)

        import ray.data

        return ray.data.from_arrow(
            ray.get(_local.remote(list(pairs.to_arrow_refs()))))

    # distributed path: one materialized edge table per direction, narrow
    # (part, key, other, w) rows; per iteration one shuffle per direction
    def tag_dir(key_col: str, other_col: str):
        def f(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            o = batch[other_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "part": pa.array((k % n_parts).astype(np.int32)),
                "key": pa.array(k),
                "other": pa.array(o),
                "w": pa.array(np.full(len(k), np.nan)),
            })

        return f

    by_src = _bounded(pairs.map_batches(tag_dir("src", "dst"),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True), n_parts)
    by_dst = _bounded(pairs.map_batches(tag_dir("dst", "src"),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True), n_parts)

    def node_scores(score_ds):
        """score rows (node, val) → tagged (part, key=node, other=-1, w=val)"""
        def f(batch: pa.Table) -> pa.Table:
            k = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "part": pa.array((k % n_parts).astype(np.int32)),
                "key": pa.array(k),
                "other": pa.array(np.full(len(k), -1, dtype=np.int64)),
                "w": batch["val"],
            })

        return score_ds.map_batches(f, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def spread(part: pa.Table) -> pa.Table:
        """Per key-partition: each key's score × its edge fan-out →
        (node=other, val=score) contribution rows."""
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "val": pa.array([], pa.float64())})
        if part.num_rows == 0 or "key" not in part.column_names:
            return empty
        k = part["key"].to_numpy(zero_copy_only=False)
        o = part["other"].to_numpy(zero_copy_only=False)
        w = part["w"].to_numpy(zero_copy_only=False)
        is_score = o == -1
        order = np.argsort(k, kind="stable")
        k, o, w, is_score = k[order], o[order], w[order], is_score[order]
        # map each row's key to its score (scores may be absent for keys with
        # no surviving mass — contribute 0)
        sk = k[is_score]
        sv = w[is_score]
        ek, eo = k[~is_score], o[~is_score]
        pos = np.searchsorted(sk, ek)
        ok = (pos < len(sk))
        pos = np.clip(pos, 0, max(len(sk) - 1, 0))
        vals = np.where(ok & (sk[pos] == ek) if len(sk) else np.zeros(len(ek), bool),
                        sv[pos] if len(sk) else 0.0, 0.0)
        keep = vals != 0.0
        return pa.table({"node": pa.array(eo[keep]),
                         "val": pa.array(vals[keep])})

    def group_sum(part: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "val": pa.array([], pa.float64())})
        if part.num_rows == 0 or "node" not in part.column_names:
            return empty
        agg = (part.select(["node", "val"]).group_by("node")
               .aggregate([("val", "sum")]))
        return pa.table({"node": agg["node"], "val": agg["val_sum"]})

    def add_part(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"part": pa.array((n % n_parts).astype(np.int32)),
                         "node": batch["node"], "val": batch["val"]})

    def l2_normalize(score_ds):
        parts_sq = score_ds.map_batches(
            lambda b: pa.table({"ss": pa.array([float(
                np.square(b["val"].to_numpy(zero_copy_only=False)).sum())])}),
            batch_format="pyarrow", zero_copy_batch=True).take_all()
        norm = float(np.sqrt(sum(r["ss"] for r in parts_sq))) or 1.0
        return score_ds.map_batches(
            lambda b: pa.table({"node": b["node"],
                                "val": pa.array(
                                    b["val"].to_numpy(zero_copy_only=False)
                                    / norm)}),
            batch_format="pyarrow", zero_copy_batch=True)

    def nodes_init():
        def f(batch: pa.Table) -> pa.Table:
            ns = np.unique(np.concatenate([
                batch["src"].to_numpy(zero_copy_only=False).astype(np.int64),
                batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]))
            return pa.table({"part": pa.array((ns % n_parts).astype(np.int32)),
                             "node": pa.array(ns)})

        def distinct(part: pa.Table) -> pa.Table:
            if part.num_rows == 0 or "node" not in part.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.float64())})
            ns = np.unique(part["node"].to_numpy(zero_copy_only=False))
            return pa.table({"node": pa.array(ns),
                             "val": pa.array(np.ones(len(ns)))})

        return (pairs.map_batches(f, batch_format="pyarrow",
                                  zero_copy_batch=True)
                .groupby("part").map_groups(distinct, batch_format="pyarrow")
                .materialize())

    h = nodes_init()
    a = h
    for _ in range(iters):
        a = _bounded((node_scores(h).union(by_src)
                      .groupby("part").map_groups(spread,
                                                  batch_format="pyarrow")
                      .map_batches(add_part, batch_format="pyarrow",
                                   zero_copy_batch=True)
                      .groupby("part").map_groups(group_sum,
                                                  batch_format="pyarrow")),
                     n_parts)
        a = _bounded(l2_normalize(a), n_parts)
        h = _bounded((node_scores(a).union(by_dst)
                      .groupby("part").map_groups(spread,
                                                  batch_format="pyarrow")
                      .map_batches(add_part, batch_format="pyarrow",
                                   zero_copy_batch=True)
                      .groupby("part").map_groups(group_sum,
                                                  batch_format="pyarrow")),
                     n_parts)
        h = _bounded(l2_normalize(h), n_parts)

    # join h and a on node via one more coarse cogroup (nodes with zero
    # score in one direction get 0.0 there)
    def tag_score(tag: float):
        def f(batch: pa.Table) -> pa.Table:
            n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "part": pa.array((n % n_parts).astype(np.int32)),
                "node": batch["node"], "val": batch["val"],
                "t": pa.array(np.full(len(n), tag, dtype=np.int8)),
            })

        return f

    def zip_scores(part: pa.Table) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "hub": pa.array([], pa.float64()),
                          "authority": pa.array([], pa.float64())})
        if part.num_rows == 0 or "t" not in part.column_names:
            return empty
        n = part["node"].to_numpy(zero_copy_only=False)
        v = part["val"].to_numpy(zero_copy_only=False)
        t = part["t"].to_numpy(zero_copy_only=False)
        nodes = np.unique(n)
        hub = np.zeros(len(nodes))
        auth = np.zeros(len(nodes))
        pos = np.searchsorted(nodes, n)
        np.add.at(hub, pos[t == 0], v[t == 0])
        np.add.at(auth, pos[t == 1], v[t == 1])
        return pa.table({"node": pa.array(nodes),
                         "hub": pa.array(hub),
                         "authority": pa.array(auth)})

    tagged = (h.map_batches(tag_score(0), batch_format="pyarrow",
                            zero_copy_batch=True)
              .union(a.map_batches(tag_score(1), batch_format="pyarrow",
                                   zero_copy_batch=True)))
    return tagged.groupby("part").map_groups(zip_scores,
                                             batch_format="pyarrow")
