"""Product quantization: encode determinism, ADC parity vs a numpy reference,
block invariance, IVF-PQ == flat PQ at full probe, recall floor."""
import numpy as np
import pyarrow as pa

from janet_ray.stages import pq, similarity as sim


def _clustered(n=400, dim=16, n_clusters=8, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4
    M = centers[rng.randint(n_clusters, size=n)] + rng.randn(n, dim) * 0.3
    return pa.table({
        "vec_id": list(range(n)),
        "embedding": [v.astype(np.float32).tolist() for v in M],
    }), M


def _norm(M):
    return M / np.linalg.norm(M, axis=1, keepdims=True)


def _ref_adc_topk(M, books, q, k, exclude=None):
    """Numpy reference: encode whole corpus, exact ADC ranking."""
    Mn = _norm(M.astype(np.float64))
    codes = pq._encode_matrix(Mn, books)
    qn = q / np.linalg.norm(q)
    lut = pq._luts(qn[None, :], books)[0]          # (m, n_codes)
    dist = lut[np.arange(books.shape[0])[:, None], codes.T].sum(axis=0)
    order = sorted(range(len(M)), key=lambda i: (dist[i], i))
    return [i for i in order if i != exclude][:k]


def test_train_shapes_and_determinism():
    _, M = _clustered()
    b1 = pq.pq_train(M, m=4, n_codes=32)
    b2 = pq.pq_train(M, m=4, n_codes=32)
    assert b1.shape == (4, 32, 4)
    assert np.array_equal(b1, b2)
    try:
        pq.pq_train(M, m=5)
        assert False, "dim 16 % m 5 should raise"
    except ValueError:
        pass


def test_encode_codes_and_determinism(ray_session):
    import ray.data

    t, M = _clustered(n=150)
    books = pq.pq_train(M, m=4, n_codes=16)
    ds = ray.data.from_arrow(t).repartition(5)
    out = pq.pq_encode(ds, books).take_all()
    assert len(out) == 150
    by_id = {r["vec_id"]: np.asarray(r["code"], dtype=np.uint8) for r in out}
    want = pq._encode_matrix(_norm(M.astype(np.float64)), books)
    for i in range(150):
        assert by_id[i].shape == (4,)
        assert np.array_equal(by_id[i], want[i]), i


def test_pq_topk_matches_numpy_adc_reference(ray_session):
    """The distributed ADC ranking is EXACTLY the single-process ADC ranking
    (approximation lives in the codes, not in the distribution)."""
    import ray.data

    t, M = _clustered(n=300)
    books = pq.pq_train(M, m=4, n_codes=32)
    codes = pq.pq_encode(ray.data.from_arrow(t).repartition(11), books)
    queries = {3: M[3], 77: M[77]}
    out = pq.pq_topk(codes, books, queries, k=8).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q in queries:
        got = [n for _, n in sorted(by_q[q])]
        assert got == _ref_adc_topk(M, books, M[q], 8, exclude=q), q


def test_ivfpq_full_probe_equals_flat(ray_session):
    import ray.data

    t, M = _clustered(n=250)
    books = pq.pq_train(M, m=4, n_codes=32)
    cents = sim.kmeans_centroids(M, 6)
    ds = ray.data.from_arrow(t)
    queries = {9: M[9], 120: M[120]}
    flat = pq.pq_topk(pq.pq_encode(ds, books), books, queries, k=10).take_all()
    full = pq.ivfpq_topk(ds, queries, cents, books, k=10, nprobe=6).take_all()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, flat)) == sorted(map(key, full))


def test_ivfpq_recall_floor(ray_session):
    """On clustered data, IVF-PQ@10 keeps most true cosine neighbors."""
    import ray.data

    t, M = _clustered(n=400)
    books = pq.pq_train(M, m=8, n_codes=64)
    cents = sim.kmeans_centroids(M, 8)
    ds = ray.data.from_arrow(t)
    Mn = _norm(M)
    hits = total = 0
    queries = {int(q): M[q] for q in (3, 42, 99, 250)}
    out = pq.ivfpq_topk(ds, queries, cents, books, k=10, nprobe=4).take_all()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q in queries:
        sims = Mn @ Mn[q]
        true = set(sorted((i for i in range(len(M)) if i != q),
                          key=lambda i: (-sims[i], i))[:10])
        hits += len(true & by_q.get(q, set()))
        total += 10
    assert hits / total >= 0.6, hits / total


# ------------------------------------------------------- persisted PQ index

def test_index_save_load_search_parity(ray_session, tmp_path):
    import os

    import ray.data

    t, M = _clustered(n=200)
    books = pq.pq_train(M, m=4, n_codes=16)
    codes = pq.pq_encode(ray.data.from_arrow(t).repartition(7), books)
    idx = str(tmp_path / "pqidx")
    meta = pq.save_pq_index(codes, books, idx, num_shards=5)
    assert meta["n_vectors"] == 200 and meta["m"] == 4
    assert not os.path.exists(idx + ".tmp")  # staging dir gone after commit
    # codebooks round-trip bit-exact
    assert np.array_equal(pq.load_pq_codebooks(idx), books)
    # search from disk == search in memory, row for row
    queries = {10: M[10], 77: M[77], 123: M[123]}
    from_disk = pq.pq_index_topk(idx, queries, k=5).to_pandas()
    in_mem = pq.pq_topk(pq.pq_encode(ray.data.from_arrow(t), books), books,
                        queries, k=5).to_pandas()
    key = lambda df: sorted(zip(df.query_id, df.neighbor_id, df["rank"]))
    assert key(from_disk) == key(in_mem)
    # all vectors present across shards
    assert pq.read_pq_codes(idx).count() == 200


def test_index_immutable_and_atomic(ray_session, tmp_path):
    import os

    import pytest
    import ray.data

    t, M = _clustered(n=60)
    books = pq.pq_train(M, m=4, n_codes=8)
    codes = pq.pq_encode(ray.data.from_arrow(t), books)
    idx = str(tmp_path / "pqidx")
    pq.save_pq_index(codes, books, idx, num_shards=3)
    with pytest.raises(FileExistsError):
        pq.save_pq_index(codes, books, idx)
    # a stale tmp dir from a killed save does not poison the next save
    idx2 = str(tmp_path / "pqidx2")
    os.makedirs(idx2 + ".tmp/shards")
    open(idx2 + ".tmp/garbage", "w").write("killed mid-save")
    pq.save_pq_index(codes, books, idx2, num_shards=3)
    assert not os.path.exists(idx2 + ".tmp")
    assert pq.pq_index_meta(idx2)["n_vectors"] == 60
