"""Local mimic of the driver's correctness gate: run every queries() entry and
compare to oracle_sql() via DuckDB (row count + column names + order-insensitive
values). Usage: python scripts/check_contract.py [sf_dir] [query ...]
(extra args restrict the run to the named queries — spot-check mode)"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Normalize timestamp resolution only (us vs ns is a storage artifact the
    # driver's value-hash does not see). Numeric dtypes are NOT normalized:
    # DuckDB sum(BIGINT) -> HUGEINT -> float64 must FAIL here, because it fails
    # the driver's hash — oracles must CAST(sum(...) AS BIGINT) (VERDICT r01 #2).
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2:])
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ray_s = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(mine)} rows, {ray_s:.1f}s)")
            continue
        t0 = time.time()
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql_s = time.time() - t0
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} != {len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, want, check_dtype=True,
                                          check_exact=True)
            print(f"PASS {name}: {len(mine)} rows (ray {ray_s:.1f}s, sql {sql_s:.1f}s)")
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e).splitlines()[-1]}")
            failures += 1
    print(f"\n{len(qs) - failures}/{len(qs)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
