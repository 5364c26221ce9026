"""Kill-resume protocol (FIXTURES.md §4): run on N partitions, die after k, resume;
completed partitions are NOT recomputed and the final output is byte-identical to an
uninterrupted run."""

import glob
import os
import shutil

import pytest

from janet_ray.pipelines.checkpoint import (
    InjectedFailure,
    read_output,
    run_partitioned,
)
from janet_ray.state import manifest as mf


@pytest.fixture(scope="module")
def corpus_pages(small_corpus):
    return os.path.join(small_corpus, "pages")


def _final_table(out_dir):
    return (
        read_output(out_dir)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_kill_resume_byte_identical(ray_session, corpus_pages, tmp_path_factory):
    out_a = str(tmp_path_factory.mktemp("uninterrupted"))
    out_b = str(tmp_path_factory.mktemp("resumed"))

    summary_a = run_partitioned(corpus_pages, out_a, num_partitions=4, batch_size=32)
    assert summary_a["complete"] == 4

    with pytest.raises(InjectedFailure):
        run_partitioned(corpus_pages, out_b, num_partitions=4, batch_size=32,
                        fail_after_partitions=2)
    done_before = [pid for pid in range(4) if mf.is_complete(out_b, pid)]
    assert len(done_before) == 2
    mtimes = {pid: os.path.getmtime(mf.manifest_path(out_b, pid)) for pid in done_before}

    summary_b = run_partitioned(corpus_pages, out_b, num_partitions=4, batch_size=32)
    assert summary_b["complete"] == 4
    # completed partitions were not recomputed: manifests untouched
    for pid in done_before:
        assert os.path.getmtime(mf.manifest_path(out_b, pid)) == mtimes[pid]

    ta, tb = _final_table(out_a), _final_table(out_b)
    assert ta.drop(columns=["spans"]).equals(tb.drop(columns=["spans"]))
    assert list(map(list, ta["spans"])) == list(map(list, tb["spans"]))


def test_manifest_lineage_and_counters(ray_session, corpus_pages, tmp_path):
    out = str(tmp_path / "run")
    summary = run_partitioned(corpus_pages, out, num_partitions=2, batch_size=32)
    # partition-scoped dedupe collapses co-located duplicates; a duplicate that
    # straddles a partition boundary survives until the global view
    assert 300 <= summary["n_rows"] <= 306
    assert summary["n_success"] + summary["routes"].get("error", 0) == summary["n_rows"]
    assert len(_final_table(out)) == 300
    for pid in range(2):
        m = mf.load_manifest(out, pid)
        assert m.status == "complete"
        assert m.input_files  # lineage recorded
        assert m.wall_s > 0
        assert m.bytes_out > 0
        assert sum(m.routes.values()) == m.n_rows
    # partition dirs are atomic commits: no tmp dirs left behind
    assert not glob.glob(os.path.join(out, "_tmp-part-*"))


def test_stage_checkpoint_resumes_without_rereading_input(
        ray_session, corpus_pages, tmp_path):
    """VERDICT r02 item 5 (Inngest step.run analogue): with stage_checkpoint
    armed, a partition whose ROUTED intermediate is committed resumes the
    extract stage from that intermediate — proven by poisoning the raw input
    after the stage commit: the run can only succeed if it never re-reads or
    re-sniffs the input."""
    import pyarrow.parquet as pq

    from janet_ray.pipelines import checkpoint as cp

    inp = str(tmp_path / "pages")
    shutil.copytree(corpus_pages, inp)
    out = str(tmp_path / "out")
    out_ref = str(tmp_path / "ref")

    files = sorted(glob.glob(os.path.join(inp, "*.parquet")))
    parts = mf.plan_partitions(files, 4)
    os.makedirs(out, exist_ok=True)
    # the crash state: every partition's stage intermediate committed, no
    # partition output yet (extract stage died)
    for pid, pf in enumerate(parts):
        cp._routed_for_partition(pf, out, pid, {})
        sd = cp.stage_dir(out, pid)
        assert os.path.isdir(sd)
        # the intermediate carries the router's route column
        f0 = sorted(glob.glob(os.path.join(sd, "*.parquet")))[0]
        assert "route" in pq.ParquetFile(f0).schema_arrow.names

    for f in files:  # poison: any attempt to re-read input now crashes
        with open(f, "wb") as fh:
            fh.write(b"not parquet")

    summary = run_partitioned(inp, out, num_partitions=4, batch_size=32,
                              stage_checkpoint=True)
    assert summary["complete"] == 4
    # committed partitions reclaim their stage intermediates
    assert not glob.glob(os.path.join(out, "_stage", "part-*"))

    run_partitioned(corpus_pages, out_ref, num_partitions=4, batch_size=32)
    ta, tb = _final_table(out_ref), _final_table(out)
    assert ta.drop(columns=["spans"]).equals(tb.drop(columns=["spans"]))
    assert list(map(list, ta["spans"])) == list(map(list, tb["spans"]))


def test_stage_checkpoint_fresh_run_matches_plain(ray_session, corpus_pages,
                                                  tmp_path):
    """stage_checkpoint=True on a clean run produces byte-identical output to
    the plain path (the stage write/read round trip preserves every row)."""
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "staged")
    run_partitioned(corpus_pages, out_a, num_partitions=2, batch_size=32)
    run_partitioned(corpus_pages, out_b, num_partitions=2, batch_size=32,
                    stage_checkpoint=True)
    ta, tb = _final_table(out_a), _final_table(out_b)
    assert ta.drop(columns=["spans"]).equals(tb.drop(columns=["spans"]))
    assert list(map(list, ta["spans"])) == list(map(list, tb["spans"]))


def test_torn_manifest_triggers_recompute(ray_session, corpus_pages, tmp_path):
    out = str(tmp_path / "run")
    run_partitioned(corpus_pages, out, num_partitions=2, batch_size=32)
    # corrupt one manifest → that partition must be recomputed, run still succeeds
    with open(mf.manifest_path(out, 0), "w") as f:
        f.write("{torn")
    shutil.rmtree(mf.partition_dir(out, 0))
    summary = run_partitioned(corpus_pages, out, num_partitions=2, batch_size=32)
    assert summary["complete"] == 2
    assert _final_table(out)["url"].is_unique


def test_lookup_url_point_query(ray_session, tmp_path):
    """lookup_url: row-group-pruned point lookup agrees with read_output's
    deduped view for every url; absent url -> None; column projection."""
    import pyarrow.compute as pc

    from janet_ray.pipelines.checkpoint import (lookup_url, read_output,
                                                run_partitioned)
    from janet_ray.synth import ensure_pages_dir

    corpus = ensure_pages_dir(200, root=str(tmp_path / "c"), shard_rows=50)
    out = str(tmp_path / "out")
    run_partitioned(f"{corpus}/pages", out, num_partitions=4)
    view = read_output(out).to_pandas().set_index("url")

    for url in list(view.index[:3]) + [view.index[-1]]:
        got = lookup_url(out, url)
        assert got is not None and got.num_rows == 1
        assert got["url"][0].as_py() == url
        assert got["text"][0].as_py() == view.loc[url, "text"]

    assert lookup_url(out, "https://docs.example/d-9999999") is None
    proj = lookup_url(out, view.index[0], columns=["url", "filename"])
    assert proj.column_names == ["url", "filename"]


def test_lookup_url_manifest_range_pruning(ray_session, tmp_path):
    """Commit-time url ranges land in the partition manifests and the point
    lookup prunes to the files whose range covers the url (the O(1)-footers
    path); results stay identical to the footer-fallback path."""
    from janet_ray.pipelines import checkpoint as cp
    from janet_ray.state import manifest as mf
    from janet_ray.synth import ensure_pages_dir

    corpus = ensure_pages_dir(200, root=str(tmp_path / "c"), shard_rows=50)
    out = str(tmp_path / "out")
    cp.run_partitioned(f"{corpus}/pages", out, num_partitions=4)

    # every complete partition manifest carries a range per output file
    ranges = {}
    for pid in range(4):
        m = mf.load_manifest(out, pid)
        assert m.status == "complete" and m.url_ranges
        for base, (lo, hi) in m.url_ranges.items():
            assert lo <= hi
            ranges[(pid, base)] = (lo, hi)

    view = cp.read_output(out).to_pandas().set_index("url")
    url = view.index[57]
    got = cp.lookup_url(out, url)
    assert got["url"][0].as_py() == url
    # the url's range covers a strict subset of the output files (pruning
    # does real work; sorted output keeps ranges mostly disjoint)
    covering = [k for k, (lo, hi) in ranges.items() if lo <= url <= hi]
    assert 1 <= len(covering) < len(ranges)
    # a url below every range short-circuits to no file reads and a miss
    assert cp.lookup_url(out, "https://aaa") is None


def test_lookup_url_custom_schema(ray_session, tmp_path):
    """lookup_url must tolerate custom-pipeline outputs lacking
    warc_ts/route (read_output's same graceful-degradation contract)."""
    import pyarrow as pa

    from janet_ray.pipelines.checkpoint import lookup_url, run_partitioned
    from janet_ray.synth import ensure_pages_dir

    corpus = ensure_pages_dir(100, root=str(tmp_path / "c"), shard_rows=50)
    out = str(tmp_path / "out")

    def proj(ds):
        return ds.map_batches(
            lambda b: pa.table({"url": b["url"],
                                "n_bytes": pc_len(b["html"])}),
            batch_format="pyarrow", zero_copy_batch=True)

    import pyarrow.compute as _pc

    def pc_len(col):
        return _pc.binary_length(col)

    run_partitioned(f"{corpus}/pages", out, num_partitions=2, pipeline=proj)
    import pandas as pd

    urls = pd.read_parquet(f"{corpus}/golden.parquet")["url"]
    got = lookup_url(out, urls.iloc[3])
    assert got is not None and got["url"][0].as_py() == urls.iloc[3]
    proj_only = lookup_url(out, urls.iloc[3], columns=["n_bytes"])
    assert proj_only.column_names == ["n_bytes"]
