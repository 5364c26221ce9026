"""Domain-mixture sampling (stages/mixture.py): Hamilton apportionment,
deterministic hash-rank draws, shortfall and zero-weight semantics."""

import hashlib

import pyarrow as pa

from janet_ray.stages.mixture import mixture_quotas, mixture_sample


def test_quotas_largest_remainder():
    q = mixture_quotas({"a": 0.5, "b": 0.3, "c": 0.2}, 10)
    assert q == {"a": 5, "b": 3, "c": 2}
    # 7 units over thirds: floors 2/2/2, remainder 1 → tie on fraction,
    # name-ascending tie-break hands it to 'a'
    q = mixture_quotas({"a": 1, "b": 1, "c": 1}, 7)
    assert q == {"a": 3, "b": 2, "c": 2} and sum(q.values()) == 7
    assert mixture_quotas({}, 5) == {}
    assert mixture_quotas({"a": 1.0}, 0) == {"a": 0}
    # un-normalized weights normalize
    assert mixture_quotas({"a": 2, "b": 2}, 4) == {"a": 2, "b": 2}


def _rank_order(ids):
    return sorted(ids, key=lambda i: (
        int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16), i))


def test_mixture_sample(ray_session):
    import ray

    rows = [{"g": g, "doc_id": i + off, }
            for g, off, n in (("a", 0, 20), ("b", 100, 20), ("c", 200, 3))
            for i in range(n)]
    ds = ray.data.from_items(rows).repartition(4)
    quotas = {"a": 5, "b": 2, "c": 10}          # c is short (3 < 10)
    out = mixture_sample(ds, "g", quotas).to_pandas()
    by_g = {g: sorted(d["doc_id"]) for g, d in out.groupby("g")}
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 2
    assert len(by_g["c"]) == 3                  # shortfall: all rows, no refill
    # the draw is the content-addressed rank order
    assert by_g["a"] == sorted(_rank_order(range(20))[:5])
    assert by_g["b"] == sorted(_rank_order(range(100, 120))[:2])
    # ranks are 1-based within group
    assert set(out[out["g"] == "b"]["rank"]) == {1, 2}
    # unweighted group drops
    out2 = mixture_sample(ds, "g", {"a": 1}).to_pandas()
    assert set(out2["g"]) == {"a"} and len(out2) == 1


def test_mixture_sample_zero(ray_session):
    import ray

    ds = ray.data.from_items([{"g": "a", "doc_id": 1}])
    assert mixture_sample(ds, "g", {}).count() == 0
    assert mixture_sample(ds, "g", {"a": 0}).count() == 0


def test_mixture_tokens(ray_session):
    """Token-budget cut: docs taken in (md5_u32(id), id) order until the
    EXCLUSIVE running token total crosses the budget — the boundary-crossing
    doc is kept; shortfall domains keep everything; unbudgeted domains drop;
    tok_before is the exclusive in-domain prefix sum."""
    import ray

    from janet_ray.stages.mixture import mixture_sample_tokens

    rows = []
    # domain 'a': 6 docs × 10 tokens; budget 35 → kept while tok_before < 35:
    # ranks 1..4 have tok_before 0/10/20/30 (kept, 4th crosses the boundary),
    # rank 5 has 40 (dropped).
    for i in range(6):
        rows.append(("a", i, 10))
    # domain 'b': budget 1000 >> 30 total → shortfall, all kept
    for i in range(10, 13):
        rows.append(("b", i, 10))
    # domain 'c': no budget → dropped
    rows.append(("c", 99, 10))
    t = pa.table({"source": [r[0] for r in rows],
                  "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                  "n_tokens": pa.array([r[2] for r in rows], pa.int64())})
    out = mixture_sample_tokens(
        ray.data.from_arrow(t), "source",
        {"a": 35, "b": 1000}, id_col="doc_id").to_pandas()

    a = out[out.source == "a"].sort_values("tok_before")
    assert list(a.tok_before) == [0, 10, 20, 30]          # boundary doc kept
    assert list(a.doc_id) == _rank_order(range(6))[:4]    # hash-rank order
    b = out[out.source == "b"]
    assert sorted(b.doc_id) == [10, 11, 12]               # shortfall keeps all
    assert sorted(b.tok_before) == [0, 10, 20]
    assert (out.source != "c").all()                      # unbudgeted drops
    assert len(out) == 7


def test_mixture_tokens_zero_budget_and_empty(ray_session):
    import ray

    from janet_ray.stages.mixture import mixture_sample_tokens

    t = pa.table({"source": ["a", "a"],
                  "doc_id": pa.array([1, 2], pa.int64()),
                  "n_tokens": pa.array([5, 5], pa.int64())})
    # zero budget: tok_before 0 < 0 is false → nothing kept
    out = mixture_sample_tokens(ray.data.from_arrow(t), "source",
                                {"a": 0}).to_pandas()
    assert len(out) == 0
    # first doc always kept for any positive budget (tok_before 0 < q)
    out = mixture_sample_tokens(ray.data.from_arrow(t), "source",
                                {"a": 1}).to_pandas()
    assert len(out) == 1 and out.iloc[0].tok_before == 0


def test_mixture_epochs(ray_session):
    """Upsampling draw: rank rn of a size-n domain appears at every epoch e
    with e*n + rn <= quota — round-robin with wrap, truncated at quota."""
    import ray

    from janet_ray.stages.mixture import mixture_sample_epochs

    t = pa.table({"source": ["a"] * 3 + ["b"] * 4 + ["c"],
                  "doc_id": pa.array([0, 1, 2, 10, 11, 12, 13, 99], pa.int64())})
    out = mixture_sample_epochs(
        ray.data.from_arrow(t), "source",
        {"a": 8, "b": 2}).to_pandas()

    # domain a (n=3, q=8): ranks 1,2 at epochs 0,1,2 (3+3=6 draws ≤ 8... rank1:
    # e*3+1<=8 → e∈{0,1,2}; rank2: e*3+2<=8 → e∈{0,1,2}; rank3: e*3+3<=8 →
    # e∈{0,1}) = 8 rows total — exactly the quota
    a = out[out.source == "a"]
    assert len(a) == 8
    by_rank = a.groupby("rank").epoch.apply(sorted).to_dict()
    assert by_rank == {1: [0, 1, 2], 2: [0, 1, 2], 3: [0, 1]}
    order = _rank_order([0, 1, 2])
    for rn, eps in by_rank.items():
        ids = set(a[a["rank"] == rn].doc_id)
        assert ids == {order[rn - 1]}
    # domain b (n=4, q=2): plain cut, epoch 0 only, ranks 1..2
    b = out[out.source == "b"]
    assert len(b) == 2 and set(b.epoch) == {0} and sorted(b["rank"]) == [1, 2]
    assert list(b.sort_values("rank").doc_id) == _rank_order([10, 11, 12, 13])[:2]
    # unbudgeted domain drops
    assert (out.source != "c").all()


def test_mixture_epochs_zero_and_exact(ray_session):
    import ray

    from janet_ray.stages.mixture import mixture_sample_epochs

    t = pa.table({"source": ["a", "a"], "doc_id": pa.array([1, 2], pa.int64())})
    assert len(mixture_sample_epochs(ray.data.from_arrow(t), "source",
                                     {"a": 0}).to_pandas()) == 0
    # quota == n: exactly one epoch of everything
    out = mixture_sample_epochs(ray.data.from_arrow(t), "source",
                                {"a": 2}).to_pandas()
    assert len(out) == 2 and set(out.epoch) == {0}


def test_mixture_int_group_col_empty_parts(ray_session):
    """Non-string group columns must type the empty coarse partitions from
    the input schema (hardcoded pa.string() would make empty parts'
    schemas mismatch and break the block union)."""
    import ray

    from janet_ray.stages.mixture import (mixture_sample_epochs,
                                          mixture_sample_tokens)

    t = pa.table({"grp": pa.array([1, 1, 2], pa.int64()),
                  "doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_tokens": pa.array([5, 5, 5], pa.int64())})
    out = mixture_sample_tokens(ray.data.from_arrow(t), "grp",
                                {1: 6, 2: 1}).to_pandas()
    assert sorted(out.grp.unique()) == [1, 2] and len(out) == 3
    out = mixture_sample_epochs(ray.data.from_arrow(t), "grp",
                                {1: 5}).to_pandas()
    assert len(out) == 5 and set(out.grp) == {1}


def test_epoch_shards_spread_copies(ray_session):
    """The epoch rides the shard key, so repeated copies of one document
    spread across shards instead of clumping (the loader property the
    upsampling draw exists for); positions are dense within each shard."""
    import ray

    from janet_ray.pipelines.queries import (_EPOCH_SHARD_K, _EPOCH_SHARD_N,
                                             _EPOCH_SHARD_SEED)
    from janet_ray.stages import shards
    from janet_ray.stages.mixture import mixture_sample_epochs

    t = pa.table({"source": ["a", "a"], "doc_id": pa.array([1, 2], pa.int64())})
    draws = mixture_sample_epochs(ray.data.from_arrow(t), "source", {"a": 8})

    def add_key(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        e = batch["epoch"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "draw_id", pa.array(d * _EPOCH_SHARD_K + e, pa.int64()))

    out = shards.shuffle_shards(
        draws.map_batches(add_key, batch_format="pyarrow",
                          zero_copy_batch=True),
        id_col="draw_id", n_shards=_EPOCH_SHARD_N,
        seed=_EPOCH_SHARD_SEED).to_pandas()
    assert len(out) == 8  # quota draws: both docs × epochs 0..3
    assert not out.duplicated(["doc_id", "epoch"]).any()
    for d in (1, 2):
        assert out[out.doc_id == d].shard.nunique() > 1  # copies spread
    for s, grp in out.groupby("shard"):
        assert sorted(grp.pos) == list(range(len(grp)))  # dense positions
