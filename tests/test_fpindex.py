"""Exact-fingerprint dedup index (stages/fpindex.py): exactness, append
segments, atomic commit, bucket pruning invariance."""

import os

import pyarrow as pa
import pytest

from janet_ray.stages import fpindex


def _ds(fps_or_rows):
    import ray

    if fps_or_rows and isinstance(fps_or_rows[0], str):
        return ray.data.from_items([{"fp": f} for f in fps_or_rows])
    return ray.data.from_items(fps_or_rows)


def test_exact_membership(ray_session, tmp_path):
    idx = str(tmp_path / "fpidx")
    corpus = [f"fp{i:04d}" for i in range(200)]
    meta = fpindex.build_fp_index(_ds(corpus), idx, num_buckets=8)
    assert meta["n_fp_rows"] == 200
    new = [{"doc_id": i, "fp": f} for i, f in enumerate(
        ["fp0000", "brandnew-a", "fp0199", "brandnew-b", "brandnew-a"])]
    out = fpindex.exact_new_docs(_ds(new), idx).to_pandas()
    # exact: both duplicates of 'brandnew-a' survive (row filter, not dedup);
    # every corpus fp is caught with zero false positives
    assert sorted(zip(out.doc_id, out.fp)) == [
        (1, "brandnew-a"), (3, "brandnew-b"), (4, "brandnew-a")]


def test_append_segments_union(ray_session, tmp_path):
    idx = str(tmp_path / "fpidx")
    fpindex.build_fp_index(_ds(["a", "b"]), idx, num_buckets=4)
    fpindex.append_fp_index(_ds(["c"]), idx)
    assert len(fpindex.segment_dirs(idx)) == 2
    assert fpindex.fp_meta(idx)["n_fp_rows"] == 3
    new = [{"doc_id": i, "fp": f} for i, f in enumerate("abcd")]
    out = fpindex.exact_new_docs(_ds(new), idx).to_pandas()
    assert list(out.fp) == ["d"]


def test_atomicity_and_immutability(ray_session, tmp_path):
    idx = str(tmp_path / "fpidx")
    fpindex.build_fp_index(_ds(["x"]), idx, num_buckets=2)
    with pytest.raises(FileExistsError):
        fpindex.build_fp_index(_ds(["y"]), idx)
    # a stale tmp from a killed append is invisible to probes
    os.makedirs(os.path.join(idx, "segment-000001.tmp"))
    new = [{"doc_id": 0, "fp": "x"}, {"doc_id": 1, "fp": "y"}]
    out = fpindex.exact_new_docs(_ds(new), idx).to_pandas()
    assert list(out.fp) == ["y"]
    assert len(fpindex.segment_dirs(idx)) == 1


def test_append_clears_stale_tmp(ray_session, tmp_path):
    # ADVICE r04: a crashed append leaves segment-NNNNNN.tmp with bucket
    # files the retry won't rewrite; committing them would inject foreign
    # fingerprints (false "seen" hits silently dropping genuinely-new docs)
    import pyarrow.parquet as pq

    idx = str(tmp_path / "fpidx")
    fpindex.build_fp_index(_ds(["a"]), idx, num_buckets=2)
    stale = os.path.join(idx, "segment-000001.tmp")
    os.makedirs(stale)
    pq.write_table(pa.table({"fp": ["evil"]}),
                   os.path.join(stale, "bucket-00001.parquet"))
    fpindex.append_fp_index(_ds(["c"]), idx)
    new = [{"doc_id": 0, "fp": "evil"}, {"doc_id": 1, "fp": "c"}]
    out = fpindex.exact_new_docs(_ds(new), idx).to_pandas()
    # 'evil' must still read as NEW: the stale bucket was cleared, not kept
    assert list(out.fp) == ["evil"]


def test_bucket_count_invariance(ray_session, tmp_path):
    corpus = [f"k{i}" for i in range(100)]
    new = [{"doc_id": i, "fp": f}
           for i, f in enumerate([f"k{i}" for i in range(0, 100, 3)]
                                 + [f"n{i}" for i in range(7)])]
    results = []
    for nb in (1, 4, 32):
        idx = str(tmp_path / f"fpidx{nb}")
        fpindex.build_fp_index(_ds(corpus), idx, num_buckets=nb)
        df = fpindex.exact_new_docs(_ds(new), idx).to_pandas()
        results.append(sorted(zip(df.doc_id, df.fp)))
    assert results[0] == results[1] == results[2]
    assert [f for _, f in results[0]] == [f"n{i}" for i in range(7)]
