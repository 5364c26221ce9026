"""Persisted MinHash-LSH band index (stages/lshindex.py): incremental
near-dup detection of a new ingest batch against an already-indexed corpus
— build/append segments, probe candidates, exact-jaccard verify — without
recomputing the corpus side."""
import os

import numpy as np
import pyarrow as pa
import pytest

import ray

from janet_ray.stages import lshindex
from janet_ray.stages.dedup import jaccard

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu").split()


def _doc(rng: np.random.Generator, n: int = 40) -> str:
    return " ".join(rng.choice(WORDS, size=n))


def _mutate(text: str, rng: np.random.Generator, n_swap: int = 1) -> str:
    ws = text.split()
    for i in rng.choice(len(ws), size=n_swap, replace=False):
        ws[int(i)] = "mutant%d" % i
    return " ".join(ws)


def corpora(n_old: int = 24, n_dup: int = 6, n_novel: int = 8):
    """(old_table, new_table, expected_pairs) — new batch contains near-dup
    mutations of the first ``n_dup`` old docs plus novel docs; expected =
    brute-force exact jaccard >= 0.8 between the two sides."""
    rng = np.random.default_rng(7)
    old_texts = [_doc(rng) for _ in range(n_old)]
    dup_src = [i * n_old // n_dup for i in range(n_dup)]  # both halves
    new_texts = ([_mutate(old_texts[i], rng) for i in dup_src]
                 + [_doc(rng) for _ in range(n_novel)])
    old = pa.table({"doc_id": list(range(n_old)), "text": old_texts})
    new = pa.table({"doc_id": [1000 + i for i in range(len(new_texts))],
                    "text": new_texts})
    expected = {(1000 + i, j)
                for i, nt in enumerate(new_texts)
                for j, ot in enumerate(old_texts)
                if jaccard(nt, ot) >= 0.8}
    assert expected, "fixture must contain cross-side near-dups"
    return old, new, expected


def _pairs(ds) -> set[tuple[int, int]]:
    return {(int(r["new_id"]), int(r["old_id"])) for r in ds.take_all()}


def test_build_probe_verify(ray_session, tmp_path):
    old, new, expected = corpora()
    idx = str(tmp_path / "lsh")
    meta = lshindex.build_band_index(ray.data.from_arrow(old), idx,
                                     num_buckets=8)
    assert meta["n_docs"] == old.num_rows and meta["n_band_rows"] > 0
    assert len(lshindex.segment_dirs(idx)) == 1
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old),
                                       threshold=0.8)
    assert _pairs(got) == expected
    # jaccard column is the exact word-k-gram value
    for r in got.take_all():
        nt = new["text"][new["doc_id"].to_pylist().index(r["new_id"])].as_py()
        ot = old["text"][r["old_id"]].as_py()
        assert r["jaccard"] == jaccard(nt, ot)


def test_append_segments_and_meta(ray_session, tmp_path):
    old, new, expected = corpora()
    half = old.num_rows // 2
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old.slice(0, half)), idx,
                              num_buckets=8)
    meta = lshindex.append_band_index(
        ray.data.from_arrow(old.slice(half)), idx)
    assert len(lshindex.segment_dirs(idx)) == 2
    assert meta["n_docs"] == old.num_rows
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old),
                                       threshold=0.8)
    # dups on BOTH sides of the segment split are found
    assert _pairs(got) == expected
    assert {p[1] for p in expected} & set(range(half))
    assert {p[1] for p in expected} & set(range(half, old.num_rows))


def test_append_clears_stale_tmp(ray_session, tmp_path):
    # ADVICE r04: a crashed append's leftover segment tmp must be cleared,
    # not committed — stale bucket files would inject foreign band rows
    import os

    import pyarrow.parquet as pq

    old, new, expected = corpora()
    half = old.num_rows // 2
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old.slice(0, half)), idx,
                              num_buckets=8)
    stale = os.path.join(idx, "segment-000001.tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "bucket-00001.parquet"), "wb") as f:
        f.write(b"garbage, not parquet")
    lshindex.append_band_index(ray.data.from_arrow(old.slice(half)), idx)
    # the committed segment contains only valid bucket parquet (the garbage
    # file was cleared), and probing still finds dups on both sides
    seg = lshindex.segment_dirs(idx)[1]
    for fn in os.listdir(seg):
        if fn.endswith(".parquet"):
            pq.read_table(os.path.join(seg, fn))
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old),
                                       threshold=0.8)
    assert _pairs(got) == expected


def test_distributed_verify_path_parity(ray_session, tmp_path):
    old, new, expected = corpora()
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old), idx, num_buckets=8)
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old),
                                       threshold=0.8,
                                       broadcast_pairs_max=0)  # force joins
    assert _pairs(got) == expected


def test_probe_reads_params_from_meta(ray_session, tmp_path):
    """A probe cannot drift from its index: build with k=2, probe with
    defaults — verify jaccard matches the k=2 definition, not k=3."""
    old, new, _ = corpora()
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old), idx, k=2,
                              num_buckets=8)
    assert lshindex.lsh_meta(idx)["k"] == 2
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old),
                                       threshold=0.8)
    rows = got.take_all()
    assert rows
    for r in rows:
        nt = new["text"][new["doc_id"].to_pylist().index(r["new_id"])].as_py()
        ot = old["text"][r["old_id"]].as_py()
        assert r["jaccard"] == jaccard(nt, ot, k=2)


def test_no_candidates_yields_typed_empty(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    old = pa.table({"doc_id": [0, 1], "text": [_doc(rng), _doc(rng)]})
    new = pa.table({"doc_id": [5], "text": ["totally unrelated brand new "
                                            "payload about ceramics kilns"]})
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old), idx, num_buckets=4)
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old))
    t = pa.Table.from_pylist(got.take_all(), schema=got.schema().base_schema)
    assert t.num_rows == 0
    assert t.schema.field("new_id").type == pa.int64()
    assert t.schema.field("jaccard").type == pa.float64()


def test_build_refuses_existing_index(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    old = pa.table({"doc_id": [0, 1, 2, 3],
                    "text": [_doc(rng) for _ in range(4)]})
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old), idx, num_buckets=4)
    with pytest.raises(FileExistsError):
        lshindex.build_band_index(ray.data.from_arrow(old), idx)
    with pytest.raises(ValueError):
        lshindex.build_band_index(ray.data.from_arrow(old),
                                  str(tmp_path / "lsh2"), bands=65)


def test_segment_commit_is_atomic(ray_session, tmp_path):
    """A crashed append leaves only a .tmp dir — segment_dirs ignores it and
    probes see the index exactly as before the failed append."""
    old, new, expected = corpora()
    idx = str(tmp_path / "lsh")
    lshindex.build_band_index(ray.data.from_arrow(old), idx, num_buckets=8)
    os.makedirs(os.path.join(idx, "segment-000001.tmp"))
    assert len(lshindex.segment_dirs(idx)) == 1
    got = lshindex.incremental_neardup(ray.data.from_arrow(new), idx,
                                       ray.data.from_arrow(old),
                                       threshold=0.8)
    assert _pairs(got) == expected


def test_delete_masks_candidates_and_readd_revives(ray_session, tmp_path):
    """Segment-scoped tombstones on the band index: a deleted corpus doc
    stops surfacing as a near-dup candidate; re-appending it in a later
    segment revives it."""
    import ray

    from janet_ray.stages import lshindex as lsh

    corpus = [{"doc_id": i,
               "text": "the quick brown fox jumps over the lazy dog "
                       f"variant {i // 2}"} for i in range(6)]
    idx = str(tmp_path / "bandidx")
    lsh.build_band_index(ray.data.from_items(corpus), idx, num_buckets=4)
    probe = [{"doc_id": 100,
              "text": "the quick brown fox jumps over the lazy dog "
                      "variant 0"}]

    def olds():
        df = lsh.probe_band_index(ray.data.from_items(probe),
                                  idx).to_pandas()
        return set(df.old_id)

    before = olds()
    assert 0 in before and 1 in before
    lsh.delete_docs(idx, [0])
    after = olds()
    assert 0 not in after and 1 in after
    # re-add doc 0 in a NEW segment -> live again (tombstone is scoped)
    lsh.append_band_index(ray.data.from_items([corpus[0]]), idx)
    revived = olds()
    assert 0 in revived
