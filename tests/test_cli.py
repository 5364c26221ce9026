"""CLI module entry (`python -m janet_ray run`) — flags, summary JSON, resume."""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*extra, out_dir, corpus):
    cmd = [sys.executable, "-m", "janet_ray", "run",
           "--input", os.path.join(corpus, "pages"), "--out", out_dir,
           "--partitions", "4", "--num-cpus", "4", *extra]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_run_and_resume(ray_session, small_corpus, tmp_path):
    """Full run via the module entry with the round-2 flags, then a resume
    invocation that recomputes nothing (all partitions already complete)."""
    out = str(tmp_path / "cli_out")
    s1 = _run_cli("--deadline-s", "15", "--strict-ocr", "--salt-parts", "4",
                  "--stage-checkpoint", out_dir=out, corpus=small_corpus)
    assert s1["complete"] == s1["partitions"] == 4
    assert s1["n_rows"] > 0 and s1["routes"]

    import glob

    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(out, "part-*", "*.parquet"))}
    s2 = _run_cli(out_dir=out, corpus=small_corpus)
    assert s2["complete"] == 4 and s2["n_rows"] == s1["n_rows"]
    # resume recomputed nothing: every committed partition file untouched
    assert mtimes and all(os.path.getmtime(f) == t for f, t in mtimes.items())


def test_cli_missing_input(tmp_path):
    r = subprocess.run([sys.executable, "-m", "janet_ray", "run",
                        "--input", str(tmp_path / "nope"), "--out",
                        str(tmp_path / "o")],
                       capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r.returncode == 2
    assert "error:" in r.stderr


def test_cli_query_subcommand(tmp_path):
    # --list prints registry names without starting Ray
    r = subprocess.run([sys.executable, "-m", "janet_ray", "query", "--list"],
                       capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r.returncode == 0
    names = r.stdout.split()
    assert "exact_dedup" in names and len(names) > 100
    # unknown name is a clean usage error
    r = subprocess.run([sys.executable, "-m", "janet_ray", "query", "nope",
                        "--sf-dir", "/root/testdata/sf0.001"],
                       capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 2 and "unknown query" in r.stderr
    # a real query writes streamed parquet
    out = str(tmp_path / "q.parquet")
    r = subprocess.run([sys.executable, "-m", "janet_ray", "query",
                        "token_count", "--sf-dir", "/root/testdata/sf0.001",
                        "--out", out, "--num-cpus", "4"],
                       capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    import glob

    import pyarrow.parquet as _pq

    files = glob.glob(os.path.join(out, "*.parquet")) or [out]
    n = sum(_pq.read_table(f).num_rows for f in files)
    assert n == 500
