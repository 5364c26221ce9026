"""Distributed PageRank (stages/graph.py): exact parity with a
single-process reference of the same pinned semantics, rank conservation,
dangling handling, and shape invariants."""

import numpy as np

from janet_ray.stages.graph import DAMPING, pagerank


def _reference_pagerank(edges, iters, d=DAMPING):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {node: r[idx[node]] for node in nodes}


def _run(ray, edges, iters=5, n_parts=4):
    ds = ray.data.from_items([{"src": u, "dst": v} for u, v in edges])
    out = pagerank(ds, iters=iters, n_parts=n_parts).to_pandas()
    return dict(zip(out["node"], out["rank"]))


def test_parity_simple_chain(ray_session):
    import ray

    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    got = _run(ray, edges)
    want = _reference_pagerank(edges, 5)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_dangling_nodes_conserve_mass(ray_session):
    import ray

    # node 4 has no out-edges: its mass must be redistributed, total stays 1
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    got = _run(ray, edges, iters=7)
    want = _reference_pagerank(edges, 7)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_star_graph_hub_wins(ray_session):
    import ray

    edges = [(i, 100) for i in range(1, 20)]
    got = _run(ray, edges)
    assert got[100] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_random_graph_parity(ray_session):
    import ray

    rng = np.random.RandomState(11)
    edges = list({(int(rng.randint(50)), int(rng.randint(50)))
                  for _ in range(300)})
    got = _run(ray, edges, iters=4)
    want = _reference_pagerank(edges, 4)
    assert got.keys() == want.keys()
    err = max(abs(got[k] - want[k]) for k in want)
    assert err < 1e-9


def test_distributed_path_parity(ray_session):
    import ray

    # force the per-iteration shuffle loop (local_edge_limit=0) and require
    # agreement with both the fast path and the reference
    rng = np.random.RandomState(3)
    edges = list({(int(rng.randint(30)), int(rng.randint(30)))
                  for _ in range(120)})
    ds = ray.data.from_items([{"src": u, "dst": v} for u, v in edges])
    out = pagerank(ds, iters=3, n_parts=4, local_edge_limit=0).to_pandas()
    got = dict(zip(out["node"], out["rank"]))
    want = _reference_pagerank(edges, 3)
    assert got.keys() == want.keys()
    assert max(abs(got[k] - want[k]) for k in want) < 1e-9


def _reference_hits(edges, iters):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(iters):
        a = np.zeros(n)
        for u, v in edges:
            a[idx[v]] += h[idx[u]]
        a /= (np.linalg.norm(a) or 1.0)
        h = np.zeros(n)
        for u, v in edges:
            h[idx[u]] += a[idx[v]]
        h /= (np.linalg.norm(h) or 1.0)
    return {node: (h[idx[node]], a[idx[node]]) for node in nodes}


def _run_hits(ray, edges, iters=5, **kw):
    from janet_ray.stages.graph import hits

    ds = ray.data.from_items([{"src": u, "dst": v} for u, v in edges])
    out = hits(ds, iters=iters, **kw).to_pandas()
    return {r.node: (r.hub, r.authority) for r in out.itertuples()}


def test_hits_local_parity(ray_session):
    import ray

    rng = np.random.RandomState(5)
    edges = list({(int(rng.randint(40)), int(rng.randint(40)))
                  for _ in range(200)})
    got = _run_hits(ray, edges, iters=4)
    want = _reference_hits(edges, 4)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_hits_distributed_parity(ray_session):
    import ray

    rng = np.random.RandomState(9)
    edges = list({(int(rng.randint(25)), int(rng.randint(25)))
                  for _ in range(100)})
    got = _run_hits(ray, edges, iters=3, n_parts=4, local_edge_limit=0)
    want = _reference_hits(edges, 3)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_hits_star_semantics(ray_session):
    import ray

    # all spokes point at the hub: hub node is the pure AUTHORITY,
    # spokes are the pure hubs
    edges = [(i, 100) for i in range(1, 10)]
    got = _run_hits(ray, edges, iters=5)
    assert got[100][1] == max(v[1] for v in got.values())  # top authority
    assert got[100][0] == 0.0                              # no out-links
    for i in range(1, 10):
        assert got[i][1] == 0.0


def test_negative_node_ids_rejected(ray_session):
    import pytest
    import ray

    from janet_ray.stages.graph import hits, pagerank

    ds = ray.data.from_items([{"src": 1, "dst": -1}])
    with pytest.raises(Exception, match="non-negative"):
        pagerank(ds, iters=1).to_pandas()
    with pytest.raises(Exception, match="non-negative"):
        hits(ds, iters=1).to_pandas()
