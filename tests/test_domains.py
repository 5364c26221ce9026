"""Domain-level stats filter (stages/domains.py): gate arithmetic,
forced-dispatch parity (broadcast vs cogroup-union), empty gate, and the
exact-int mean floor."""

import pyarrow as pa
import pytest

from janet_ray.stages.domains import domain_filter, gate_hosts, host_table


def _rows():
    # h0: 5 docs × 10 tokens (passes both rules)
    # h1: 8 docs × 10 tokens (fails max_docs=6)
    # h2: 4 docs × 2 tokens  (fails mean floor 5: 8 < 20)
    # h3: 3 docs, tokens 4,5,6 (mean = 5 exactly → passes: 15 >= 15)
    rows = []
    i = 0
    for _ in range(5):
        rows.append({"doc_id": i, "host": "h0", "n_tokens": 10}); i += 1
    for _ in range(8):
        rows.append({"doc_id": i, "host": "h1", "n_tokens": 10}); i += 1
    for _ in range(4):
        rows.append({"doc_id": i, "host": "h2", "n_tokens": 2}); i += 1
    for t in (4, 5, 6):
        rows.append({"doc_id": i, "host": "h3", "n_tokens": t}); i += 1
    return rows


def _surviving(rows, **kw):
    import ray

    df = domain_filter(ray.data.from_items(rows), max_docs=6,
                       min_mean_tokens=5, **kw).to_pandas()
    return sorted(zip(df.doc_id, df.host, df.n_tokens))


def _expected(rows):
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        agg[r["host"]][0] += 1
        agg[r["host"]][1] += r["n_tokens"]
    ok = {h for h, (n, tok) in agg.items() if n <= 6 and tok >= 5 * n}
    return sorted((r["doc_id"], r["host"], r["n_tokens"])
                  for r in rows if r["host"] in ok)


def test_gate_rules(ray_session):
    rows = _rows()
    got = _surviving(rows)
    assert got == _expected(rows)
    hosts = {h for _, h, _ in got}
    assert hosts == {"h0", "h3"}  # h1 over-represented, h2 under the floor


def test_forced_dispatch_parity(ray_session):
    rows = _rows()
    a = _surviving(rows, force_dispatch="broadcast")
    b = _surviving(rows, force_dispatch="distributed")
    assert a == b == _expected(rows)


def test_empty_gate_empty_output(ray_session):
    import ray

    rows = [{"doc_id": i, "host": "h", "n_tokens": 1} for i in range(20)]
    for dispatch in ("broadcast", "distributed"):
        df = domain_filter(ray.data.from_items(rows), max_docs=5,
                           min_mean_tokens=5,
                           force_dispatch=dispatch).to_pandas()
        assert len(df) == 0


def test_host_table_exact_ints(ray_session):
    import ray

    stats = host_table(ray.data.from_items(_rows())).to_pandas()
    by_host = {r.host: (r.n_docs, r.sum_tokens) for r in stats.itertuples()}
    assert by_host == {"h0": (5, 50), "h1": (8, 80),
                       "h2": (4, 8), "h3": (3, 15)}
    passing = gate_hosts(
        host_table(ray.data.from_items(_rows())),
        max_docs=6, min_mean_tokens=5).to_pandas()
    assert sorted(passing.host) == ["h0", "h3"]
