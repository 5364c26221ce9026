"""Append-only incremental ingest (run_incremental): new shards extend the
persisted group plan, completed groups are never recomputed, and the combined
output equals a from-scratch run byte-for-byte."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from janet_ray.pipelines.checkpoint import read_output, run_incremental, run_partitioned
from janet_ray.state import manifest as mf


def _shards(small_corpus):
    return sorted(glob.glob(os.path.join(small_corpus, "pages", "*.parquet")))


def _stage(tmp_path, files):
    d = tmp_path / "input"
    d.mkdir(exist_ok=True)
    for f in files:
        dst = d / os.path.basename(f)
        if not dst.exists():
            shutil.copy(f, dst)
    return str(d)


def test_incremental_append_only_processes_new_groups(ray_session, small_corpus,
                                                      tmp_path):
    import ray

    shards = _shards(small_corpus)
    assert len(shards) >= 6
    out = str(tmp_path / "out")

    inp = _stage(tmp_path, shards[:4])
    s1 = run_incremental(inp, out, files_per_group=2)
    assert s1["complete"] == s1["partitions"] == 2
    plan1 = mf.load_group_plan(out)
    assert [len(g) for g in plan1] == [2, 2]

    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "part-*", "*.parquet"))}

    # three new shards arrive → 2 new groups (2 + 1); old groups untouched
    inp = _stage(tmp_path, shards[:7])
    s2 = run_incremental(inp, out, files_per_group=2)
    assert s2["complete"] == s2["partitions"] == 4
    plan2 = mf.load_group_plan(out)
    assert plan2[:2] == plan1 and [len(g) for g in plan2] == [2, 2, 2, 1]
    assert all(os.path.getmtime(f) == t for f, t in mtimes.items())

    # combined output == a from-scratch partitioned run over the same 7 shards
    fresh = str(tmp_path / "fresh")
    run_partitioned(inp, fresh, num_partitions=4)
    a = read_output(out).to_pandas().reset_index(drop=True)
    b = read_output(fresh).to_pandas().reset_index(drop=True)
    assert a[["url", "text", "route"]].equals(b[["url", "text", "route"]])

    # idempotent re-run: nothing recomputed
    mtimes2 = {f: os.path.getmtime(f)
               for f in glob.glob(os.path.join(out, "part-*", "*.parquet"))}
    s3 = run_incremental(inp, out, files_per_group=2)
    assert s3["complete"] == 4
    assert all(os.path.getmtime(f) == t for f, t in mtimes2.items())


def test_incremental_rejects_deleted_inputs(ray_session, small_corpus, tmp_path):
    shards = _shards(small_corpus)
    out = str(tmp_path / "out")
    inp = _stage(tmp_path, shards[:3])
    run_incremental(inp, out, files_per_group=3)
    os.remove(os.path.join(inp, os.path.basename(shards[0])))
    with pytest.raises(FileNotFoundError, match="append-only"):
        run_incremental(inp, out, files_per_group=3)


def test_group_plan_persisted_before_processing(tmp_path):
    """extend_group_plan writes the plan atomically up front — a crash between
    plan write and processing resumes with the identical assignment."""
    out = str(tmp_path / "o")
    p1 = mf.extend_group_plan(out, ["b.parquet", "a.parquet", "c.parquet"], 2)
    assert p1 == [["a.parquet", "b.parquet"], ["c.parquet"]]
    # re-reading from disk gives the same plan; new file extends it
    assert mf.load_group_plan(out) == p1
    p2 = mf.extend_group_plan(out, ["a.parquet", "b.parquet", "c.parquet",
                                    "d.parquet"], 2)
    assert p2 == p1 + [["d.parquet"]]


def test_read_output_tolerates_schema_evolution(ray_session, small_corpus, tmp_path):
    """Partitions written by an older engine (missing later-added columns, e.g.
    round 1's output without n_failed_pages/ocr_confidence) read back with
    nulls — resuming an output dir across engine upgrades keeps working."""
    out = str(tmp_path / "out")
    run_partitioned(os.path.join(small_corpus, "pages"), out, num_partitions=4)
    stripped = glob.glob(os.path.join(out, "part-00000", "*.parquet"))
    assert stripped
    for f in stripped:
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["n_failed_pages", "ocr_confidence"]), f)
    df = read_output(out).to_pandas()
    assert "n_failed_pages" in df.columns and "ocr_confidence" in df.columns
    assert df["n_failed_pages"].isna().sum() > 0  # old rows surfaced as null
    assert len(df) == len(df["url"].unique())     # dedupe still ran
