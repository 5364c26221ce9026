"""Registry consistency guards (no Ray session needed): every oracle has a
query, every bench-suite entry exists, every oracle parses against the
testdata schema (DuckDB EXPLAIN — catches SQL syntax/column regressions in
seconds instead of the full gate's minutes)."""

import glob
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _entry():
    import __ray_entry__ as m

    return m


def test_every_oracle_has_a_query():
    m = _entry()
    q, o = m.queries(), m.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert all(callable(f) for f in q.values())


def test_bench_suite_references_exist():
    import bench
    from janet_ray.pipelines import queries as Q

    src = open(os.path.join(os.path.dirname(bench.__file__),
                            "bench.py")).read()
    import re

    for name in re.findall(r"Q\.(q_[a-z0-9_]+)", src):
        assert hasattr(Q, name), name


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata unavailable")
def test_all_oracles_parse():
    m = _entry()
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    for name, sql in m.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed to plan: {e}") from e
