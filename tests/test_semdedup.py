"""SemDeDup (stages/semdedup.py): brute-force parity, the keep-the-outlier
rule, and singleton pass-through."""
import numpy as np
import pyarrow as pa

from janet_ray.stages import semdedup


def _mk_corpus():
    """3 planted semantic-dup groups + 4 singletons, 16-dim unit-ish vectors."""
    rng = np.random.RandomState(7)
    base = rng.randn(7, 16)
    vecs, gid = [], []
    vid = 0
    groups = []
    for g in range(3):
        members = []
        for k in range(g + 2):           # group sizes 2, 3, 4
            # shrink perturbation with k so members differ in centroid sim
            v = base[g] + rng.randn(16) * 0.01 * (k + 1)
            vecs.append(v)
            members.append(vid)
            vid += 1
        groups.append(members)
    for s in range(4):
        vecs.append(base[3 + s])
        vid += 1
    return np.asarray(vecs, dtype=np.float64), groups


def _norm(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _brute_expected(vecs, threshold, cents):
    """Union-find over exact all-pairs cosine, keep = (min csim, min id)."""
    M = _norm(vecs)
    sims = M @ M.T
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent.get(x, x)
        return x

    n = len(vecs)
    for a in range(n):
        for b in range(a + 1, n):
            if sims[a, b] >= threshold:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    csim = (M @ _norm(cents).T).max(axis=1)
    keep = set()
    for mem in comp.values():
        keep.add(min(mem, key=lambda i: (csim[i], i)))
    return keep


def test_semdedup_parity_and_outlier_rule(ray_session):
    import ray.data

    from janet_ray.stages.similarity import kmeans_centroids

    vecs, groups = _mk_corpus()
    t = pa.table({"vec_id": list(range(len(vecs))),
                  "embedding": [list(v) for v in vecs]})
    ds = ray.data.from_arrow(t)
    out = semdedup.semdedup_keep_ids(ds, threshold=0.98, n_cells=3,
                                     sample_size=4096).take_all()
    kept = sorted(r["vec_id"] for r in out)
    cents = kmeans_centroids(vecs[: 4096], 3)
    expect = sorted(_brute_expected(vecs, 0.98, cents))
    assert kept == expect
    # every planted group lost all but one member
    kept_set = set(kept)
    for mem in groups:
        assert len(kept_set.intersection(mem)) == 1
    # the survivor is the group's LOWEST centroid-similarity member
    M = _norm(vecs)
    csim = (M @ _norm(kmeans_centroids(vecs, 3)).T).max(axis=1)
    for mem in groups:
        win = next(iter(kept_set.intersection(mem)))
        assert all(csim[win] <= csim[m] + 1e-12 for m in mem)
    # survivors carry their group rep; singletons their own id
    grp = {r["vec_id"]: r["dup_group"] for r in out}
    for mem in groups:
        win = next(iter(kept_set.intersection(mem)))
        assert grp[win] == min(mem)
    for s in range(len(vecs) - 4, len(vecs)):
        assert grp[s] == s


def test_semdedup_distributed_path_parity(ray_session):
    """Forced LP-components + distributed argmin path returns exactly the
    driver union-find path's rows (ids, dup_group, AND bit-identical csim —
    both paths share the _csim_to_centroid kernel)."""
    import ray.data

    vecs, _ = _mk_corpus()
    t = pa.table({"vec_id": list(range(len(vecs))),
                  "embedding": [list(v) for v in vecs]})
    ds = ray.data.from_arrow(t)
    small = semdedup.semdedup_keep_ids(ds, threshold=0.98, n_cells=3,
                                       sample_size=4096).take_all()
    dist = semdedup.semdedup_keep_ids_distributed(
        ds, threshold=0.98, n_cells=3, sample_size=4096).take_all()
    key = lambda r: (r["vec_id"], r["dup_group"], r["csim"])
    assert sorted(map(key, small)) == sorted(map(key, dist))


def test_semdedup_max_pairs_auto_dispatch(ray_session):
    """max_pairs=0 forces the auto-dispatch branch (VERDICT r04 #2: the
    small path must never silently collect an over-threshold pair list) —
    output must equal the small path's."""
    import ray.data

    vecs, groups = _mk_corpus()
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": [list(v) for v in vecs]}))
    small = semdedup.semdedup_keep_ids(ds, threshold=0.98, n_cells=3).take_all()
    auto = semdedup.semdedup_keep_ids(ds, threshold=0.98, n_cells=3,
                                      max_pairs=0).take_all()
    key = lambda r: (r["vec_id"], r["dup_group"], r["csim"])
    assert sorted(map(key, small)) == sorted(map(key, auto))
    # the dispatch actually deduped: every planted group lost members
    kept = {r["vec_id"] for r in auto}
    for mem in groups:
        assert len(kept.intersection(mem)) == 1


def test_semdedup_no_dups_is_identity(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 8)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(20)), "embedding": [list(v) for v in vecs]}))
    out = semdedup.semdedup_keep_ids(ds, threshold=0.999, n_cells=2).take_all()
    assert sorted(r["vec_id"] for r in out) == list(range(20))
    assert all(r["dup_group"] == r["vec_id"] for r in out)
