"""Generic-pipeline checkpointing + the skew_split execution mode."""
import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from janet_ray.pipelines.checkpoint import InjectedFailure, run_partitioned
from janet_ray.pipelines.extract import build_extract_pipeline


def test_run_partitioned_custom_pipeline(ray_session, small_corpus, tmp_path):
    """A non-extraction pipeline (textstats over the pages' text hint) gets the
    same manifest/resume machinery."""
    from janet_ray.stages import textstats as ts

    def pipeline(ds):
        return ds.map_batches(
            lambda t: ts.add_token_count(t.select(["url", "text"]).rename_columns(
                ["url", "text"])),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    out = str(tmp_path / "out")
    with pytest.raises(InjectedFailure):
        run_partitioned(os.path.join(small_corpus, "pages"), out,
                        num_partitions=4, pipeline=pipeline,
                        fail_after_partitions=2)
    summary = run_partitioned(os.path.join(small_corpus, "pages"), out,
                              num_partitions=4, pipeline=pipeline)
    assert summary["complete"] == summary["partitions"] == 4
    files = glob.glob(os.path.join(out, "part-*", "*.parquet"))
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == summary["n_rows"] > 0
    # custom pipeline output has token counts, no route/success metrics required
    schema = pq.ParquetFile(files[0]).schema_arrow
    assert "n_tokens" in schema.names

    # read_output's default global_dedupe must degrade gracefully on a custom
    # schema that lacks the url/warc_ts/route dedupe keys (ADVICE r01)
    from janet_ray.pipelines.checkpoint import read_output

    back = read_output(out)  # would previously crash in dedupe_last_wins
    assert back.count() == summary["n_rows"]


def test_skew_split_mode_same_results(ray_session, small_corpus):
    """skew_split=True (materialize-once + two-branch batch budgets) must be
    byte-equivalent to the default single pass."""
    import ray.data

    files = sorted(glob.glob(os.path.join(small_corpus, "pages", "*.parquet")))[:3]

    def run(**kw):
        ds = ray.data.read_parquet(files)
        out = build_extract_pipeline(ds, dedupe=True, sort=True, **kw)
        return [(r["url"], r["text"], r["route"]) for r in out.take_all()]

    a = run(skew_split=False)
    b = run(skew_split=True, skew_threshold=2048, giant_batch_size=2)
    assert a == b and len(a) > 0


def test_concurrent_partitions_same_output(ray_session, small_corpus, tmp_path):
    """max_concurrent_partitions=4 produces byte-identical partition contents
    to the sequential run (manifests per-partition atomic; order-free)."""
    import pyarrow as pq_mod

    seq_out = str(tmp_path / "seq")
    con_out = str(tmp_path / "con")
    pages = os.path.join(small_corpus, "pages")
    s1 = run_partitioned(pages, seq_out, num_partitions=4)
    s2 = run_partitioned(pages, con_out, num_partitions=4,
                         max_concurrent_partitions=4)
    assert s1["n_rows"] == s2["n_rows"] and s1["complete"] == s2["complete"] == 4
    for pid in range(4):
        a = sorted(glob.glob(os.path.join(seq_out, f"part-{pid:05d}", "*.parquet")))
        b = sorted(glob.glob(os.path.join(con_out, f"part-{pid:05d}", "*.parquet")))
        ta = pq.read_table(a).sort_by("url")
        tb = pq.read_table(b).sort_by("url")
        assert ta.select(["url", "text", "route"]).equals(
            tb.select(["url", "text", "route"])), pid
