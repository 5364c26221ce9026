"""Dedup family: exact, MinHash+LSH (vs exact all-pairs jaccard), SimHash,
embedding cosine near-dup."""
import itertools

import numpy as np
import pyarrow as pa
import pytest

from janet_ray.stages import dedup


BASE = ("spark streams batches over arrow blocks while the scheduler "
        "pipelines map tasks across the cluster with backpressure enabled")
NEAR = ("spark streams batches over arrow blocks while the scheduler "
        "pipelines map tasks across the cluster with backpressure disabled")
OTHER = ("completely different content about cooking pasta with tomatoes "
         "basil garlic and olive oil in a large pan tonight")


def docs_table():
    texts = [BASE, NEAR, OTHER, BASE, "tiny", "tiny", OTHER + " extra words here"]
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_jaccard_exact():
    assert dedup.jaccard(BASE, BASE) == 1.0
    j = dedup.jaccard(BASE, NEAR)
    assert 0.8 < j < 1.0
    assert dedup.jaccard(BASE, OTHER) < 0.05
    # shingle-less docs (< k words) are DEFINED non-duplicates (oracle parity:
    # the SQL k-gram comprehension yields no shingles either)
    assert dedup.jaccard("", "") == 0.0
    assert dedup.jaccard("tiny", "tiny") == 0.0
    assert dedup.jaccard("two words", "two words") == 0.0


def test_minhash_signature_similarity_estimates_jaccard():
    mh = dedup.MinHasher(256)
    sa = mh.signature(dedup.shingle_hashes(BASE))
    sb = mh.signature(dedup.shingle_hashes(NEAR))
    so = mh.signature(dedup.shingle_hashes(OTHER))
    est_near = float(np.mean(sa == sb))
    est_far = float(np.mean(sa == so))
    true = dedup.jaccard(BASE, NEAR)
    assert abs(est_near - true) < 0.15
    assert est_far < 0.1


def test_signatures_stable_across_instances():
    a = dedup.MinHasher(128).signature(dedup.shingle_hashes(BASE))
    b = dedup.MinHasher(128).signature(dedup.shingle_hashes(BASE))
    assert np.array_equal(a, b)


def test_exact_dedup(ray_session):
    import ray.data

    ds = ray.data.from_arrow(docs_table())
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(ds).take_all())
    # doc 3 duplicates doc 0; doc 5 duplicates doc 4 → keep min ids
    assert kept == [0, 1, 2, 4, 6]


def test_minhash_neardup_pairs_match_bruteforce(ray_session):
    import ray.data

    t = docs_table()
    ds = ray.data.from_arrow(t)
    # broadcast_pairs_max=0 forces the DISTRIBUTED hash-join verify path —
    # the >200k-pair scale route must stay covered (review r2 finding #5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.minhash_neardup_pairs(ds, threshold=0.8, num_partitions=2,
                                                broadcast_pairs_max=0).take_all()}
    texts = t["text"].to_pylist()
    want = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        j = dedup.jaccard(texts[a], texts[b])
        if j >= 0.8:
            want[(a, b)] = j
    assert got == want
    assert (0, 3) in got and got[(0, 3)] == 1.0   # exact dup pair
    assert (0, 1) in got                          # near-dup pair


def test_simhash_properties():
    assert dedup.simhash64(BASE) == dedup.simhash64(BASE)
    ham_near = bin(dedup.simhash64(BASE) ^ dedup.simhash64(NEAR)).count("1")
    ham_far = bin(dedup.simhash64(BASE) ^ dedup.simhash64(OTHER)).count("1")
    assert ham_near < ham_far


def test_simhash_neardup_pairs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(docs_table())
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.simhash_neardup_pairs(ds, max_hamming=3).take_all()}
    assert (0, 3) in pairs        # identical docs → hamming 0
    assert (4, 5) in pairs
    assert (0, 2) not in pairs    # unrelated


def test_embedding_neardup_pairs(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    base = rng.randn(4, 16)
    vecs = np.vstack([base, base[0] + 0.01 * rng.randn(16)])  # 4 ≈ 0
    t = pa.table({
        "vec_id": list(range(5)),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })
    ds = ray.data.from_arrow(t)
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.embedding_neardup_pairs(ds, threshold=0.95).take_all()}
    assert pairs == {(0, 4)}


def test_dup_clusters_transitive(ray_session):
    """Union-find clusters: the (0,1),(0,3) triangle-ish component collapses to
    rep 0 transitively; singletons map to themselves."""
    import ray.data

    t = docs_table()
    ds = ray.data.from_arrow(t)
    pairs = dedup.minhash_neardup_pairs(ds, threshold=0.8, num_partitions=2)
    got = {r["doc_id"]: r["cluster_rep"]
           for r in dedup.dup_clusters(ds, pairs).take_all()}
    # docs 0,1,3 form one component (0-1 near, 0-3 exact) -> rep 0
    assert got[0] == got[1] == got[3] == 0
    # docs 2 and 6 are near-dups too (adding 3 words to 18 keeps j = 16/19 ≈ 0.84)
    assert got[2] == got[6] == 2
    # 'tiny' docs have < 3 words → no shingles → NOT near-dups (exact dedup
    # would still catch them); they stay singletons here
    assert got[4] == 4 and got[5] == 5
    assert dedup.jaccard(t["text"][2].as_py(), t["text"][6].as_py()) >= 0.8


def test_dup_clusters_distributed_equals_unionfind(ray_session):
    """Label propagation (scale path) must produce the same components as the
    driver-side union-find, including on a chained component A-B-C-D."""
    import random

    import ray.data

    rng = random.Random(5)
    n = 60
    edges = [(i, i + 1) for i in range(0, 12, 1)]          # chain 0..12
    edges += [(rng.randrange(20, n), rng.randrange(20, n)) for _ in range(15)]
    edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    ids = pa.table({"doc_id": list(range(n))})
    pairs = pa.table({"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]})
    ds = ray.data.from_arrow(ids)
    pds = ray.data.from_arrow(pairs)
    uf = {r["doc_id"]: r["cluster_rep"]
          for r in dedup.dup_clusters(ds, pds).take_all()}
    lp = {r["doc_id"]: r["cluster_rep"]
          for r in dedup.dup_clusters_distributed(ds, pds).take_all()}
    assert uf == lp
    assert lp[12] == 0  # chain collapses to 0 transitively


def test_embedding_neardup_ivf_recall(ray_session):
    """IVF-partitioned near-dup finds all planted high-sim pairs (vectors that
    are nearly parallel share a nearest centroid)."""
    import ray.data

    rng = np.random.RandomState(9)
    base = rng.randn(100, 24)
    planted = base[:10] + 0.001 * rng.randn(10, 24)   # pairs (i, 100+i), sim≈1
    vecs = np.vstack([base, planted])
    t = pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })
    ds = ray.data.from_arrow(t)
    exact = {(r["id_a"], r["id_b"]) for r in
             dedup.embedding_neardup_pairs(ds, threshold=0.99).take_all()}
    ivf = {(r["id_a"], r["id_b"]) for r in
           dedup.embedding_neardup_ivf(ds, threshold=0.99, n_cells=8).take_all()}
    want = {(i, 100 + i) for i in range(10)}
    assert want <= exact
    recall = len(ivf & exact) / len(exact)
    assert recall == 1.0, (recall, exact - ivf)


def test_embedding_neardup_auto_dispatches_to_ivf(ray_session):
    """Above broadcast_max_rows the broadcast variant hands off to the IVF
    scale path (VERDICT r01 #6) — same pair semantics, approximate recall."""
    import ray.data

    rng = np.random.RandomState(5)
    base = rng.randn(12, 16)
    vecs = np.concatenate([base, base + rng.randn(12, 16) * 0.01])  # 12 near-dup pairs
    t = pa.table({
        "vec_id": pa.array(range(24), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(t)
    exact = {(r["id_a"], r["id_b"])
             for r in dedup.embedding_neardup_pairs(ds, threshold=0.99).take_all()}
    # force the dispatch: corpus "too big" to broadcast
    approx = {(r["id_a"], r["id_b"])
              for r in dedup.embedding_neardup_pairs(
                  ds, threshold=0.99, broadcast_max_rows=4).take_all()}
    assert exact  # the construction produced pairs
    assert approx <= exact           # IVF never invents pairs
    assert len(approx) >= len(exact) * 0.5  # and recalls most of them


# ------------------------------------------------------------- keep-best

def _brute_keep_best(texts: dict[int, int | str], edges, weights):
    """Reference keep-best: union-find components, winner = (max score,
    min id); docs in no component always survive."""
    from janet_ray.stages.classifier import score_text

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent.get(x, x)
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in texts:
        comp.setdefault(find(i), []).append(i)
    keep = set()
    for mem in comp.values():
        keep.add(min(mem, key=lambda i: (-score_text(texts[i], weights), i)))
    return keep


def test_dup_clusters_max_pairs_auto_dispatch(ray_session):
    """VERDICT r04 #3: an over-threshold pair list must NOT be collected on
    the driver — dup_clusters counts edges first and auto-dispatches to the
    distributed LP path, producing identical components."""
    import ray.data

    n = 40
    edges = [(i, i + 1) for i in range(0, 10)]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    pds = ray.data.from_arrow(pa.table(
        {"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}))
    small = {r["doc_id"]: r["cluster_rep"]
             for r in dedup.dup_clusters(ds, pds).take_all()}
    auto = {r["doc_id"]: r["cluster_rep"]
            for r in dedup.dup_clusters(ds, pds, max_pairs=0).take_all()}
    assert small == auto
    assert auto[10] == 0


def test_cluster_keep_best_max_pairs_auto_dispatch(ray_session):
    """Same guard on the keep-best policy: max_pairs=0 forces the
    distributed dispatch; survivors must match the driver path."""
    import ray.data

    t = docs_table()
    ds = ray.data.from_arrow(t)
    pairs = dedup.minhash_neardup_pairs(ds, threshold=0.8, num_partitions=2)
    small = sorted(r["doc_id"]
                   for r in dedup.cluster_keep_best(ds, pairs).take_all())
    auto = sorted(r["doc_id"]
                  for r in dedup.cluster_keep_best(ds, pairs,
                                                   max_pairs=0).take_all())
    assert small == auto


def test_cluster_keep_best_default_weights(ray_session):
    """One survivor per minhash cluster — highest classifier score, tie →
    min id — and every singleton survives untouched."""
    import ray.data

    t = docs_table()
    ds = ray.data.from_arrow(t)
    pairs = dedup.minhash_neardup_pairs(ds, threshold=0.8, num_partitions=2)
    kept = sorted(r["doc_id"]
                  for r in dedup.cluster_keep_best(ds, pairs).take_all())
    edges = [(r["id_a"], r["id_b"]) for r in pairs.take_all()]
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    from janet_ray.stages.classifier import default_weights

    expect = sorted(_brute_keep_best(texts, edges, default_weights()))
    assert kept == expect
    # clusters {0,1,3} and {2,6} each lost all but one member
    assert len(kept) == len(texts) - 3


def test_cluster_keep_best_prefers_quality_over_min_id(ray_session):
    """Weights that boost a token only the NON-min doc has must flip the
    survivor away from dup_clusters' min-id rep — the policy difference."""
    import ray.data

    from janet_ray.stages.classifier import _bucket

    t = docs_table()
    ds = ray.data.from_arrow(t)
    pairs = dedup.minhash_neardup_pairs(ds, threshold=0.8, num_partitions=2)
    w = np.zeros(64, dtype=np.int64)
    b_dis, b_en = _bucket("disabled", 64), _bucket("enabled", 64)
    assert b_dis != b_en  # fixture guard: the boost must be NEAR-only
    w[b_dis] = 1000
    kept = sorted(r["doc_id"]
                  for r in dedup.cluster_keep_best(ds, pairs, weights=w)
                  .take_all())
    # cluster {0,1,3}: only doc 1 (NEAR, 'disabled') carries the boost —
    # keep-best flips the survivor away from min-id 0
    assert 1 in kept and 0 not in kept and 3 not in kept
    # {2,6} resolves by the same (score desc, id) rule (6 may collide into
    # the boosted bucket via its extra tokens — the reference decides)
    edges = [(r["id_a"], r["id_b"]) for r in pairs.take_all()]
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    assert kept == sorted(_brute_keep_best(texts, edges, w))
    assert 4 in kept and 5 in kept


def test_cluster_keep_best_distributed_parity(ray_session):
    """The label-propagation + narrow-row-join scale path must produce the
    same survivor set as the driver-side union-find, including chained
    components and ties."""
    import random

    import ray.data

    rng = random.Random(11)
    n = 80
    texts = {i: f"doc number {i} says " + " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(6))
        for i in range(n)}
    edges = [(i, i + 1) for i in range(0, 9)]            # chain 0..9
    edges += [(rng.randrange(20, n), rng.randrange(20, n)) for _ in range(20)]
    edges = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    pairs = pa.table({"id_a": [a for a, _ in edges],
                      "id_b": [b for _, b in edges]})
    ds = ray.data.from_arrow(t)
    pds = ray.data.from_arrow(pairs)
    small = sorted(r["doc_id"]
                   for r in dedup.cluster_keep_best(ds, pds).take_all())
    big = sorted(r["doc_id"]
                 for r in dedup.cluster_keep_best_distributed(ds, pds)
                 .take_all())
    assert small == big
    from janet_ray.stages.classifier import default_weights

    assert small == sorted(_brute_keep_best(texts, edges, default_weights()))


def test_cluster_keep_best_no_pairs_is_identity(ray_session):
    import ray.data

    t = docs_table()
    ds = ray.data.from_arrow(t)
    empty = ray.data.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                          "id_b": pa.array([], pa.int64())}))
    kept = sorted(r["doc_id"]
                  for r in dedup.cluster_keep_best(ds, empty).take_all())
    assert kept == t["doc_id"].to_pylist()


def test_cluster_split_no_leakage(ray_session):
    """Near-dup docs land in the SAME split even when their OWN id hashes
    would split them apart (doc 0 hashes to 'train', doc 30 to 'test' under
    the plain split) — the rep-hash assignment moves whole clusters."""
    import pyarrow as pa
    import ray

    from janet_ray.pipelines.queries import (_md5_u32, _split_label,
                                             q_cluster_split)
    from janet_ray.stages import dedup

    # plain-split sanity for the chosen pair
    own = {i: _split_label(_md5_u32([i])[0] % 100) for i in (0, 30)}
    assert own[0] != own[30]

    shared = ("the quick brown fox jumps over the lazy dog again and again "
              "with many repeated shared tokens forming one clear cluster")
    texts = {0: shared, 30: shared + " tail", 7: "entirely different content "
             "about unrelated topics with no shared shingles at all here"}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)], pa.string())}))
    pairs = dedup.minhash_neardup_pairs(ds, threshold=0.5)
    out = dedup.dup_clusters(ds, pairs).to_pandas().set_index("doc_id")
    assert out.loc[0, "cluster_rep"] == out.loc[30, "cluster_rep"] == 0
    # the split comes from the rep (0) for BOTH cluster members
    split = {i: _split_label(_md5_u32([int(out.loc[i, 'cluster_rep'])])[0] % 100)
             for i in (0, 30)}
    assert split[0] == split[30] == own[0]
