"""Feature-hashing TF vectors (stages/hashvec.py): reference parity,
layout, zero-vector edge, determinism, ANN composability."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from janet_ray.stages.hashvec import hashed_tf_vectors


def _ref_vec(text, dims):
    import re

    v = np.zeros(dims, dtype=np.int64)
    for t in re.findall(r"[a-z0-9]+", (text or "").lower()):
        v[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dims] += 1
    return v


def test_matches_reference_and_layout(ray_session):
    import ray

    rows = [{"doc_id": 0, "text": "The cat sat on the mat!"},
            {"doc_id": 1, "text": "cat CAT Cat"},      # case-folds to one bucket
            {"doc_id": 2, "text": ""},                  # zero vector
            {"doc_id": 3, "text": "!!! ???"}]           # no tokens → zero vector
    out = hashed_tf_vectors(ray.data.from_items(rows), dims=8)
    tbl = pa.concat_tables(out.to_arrow_refs() and
                           [ray.get(r) for r in out.to_arrow_refs()])
    assert pa.types.is_fixed_size_list(tbl["vec"].type)
    assert tbl["vec"].type.list_size == 8
    got = {r["doc_id"]: np.asarray(r["vec"]) for r in out.take_all()}
    for r in rows:
        assert np.array_equal(got[r["doc_id"]], _ref_vec(r["text"], 8)), r
    assert got[1].sum() == 3 and (got[1] > 0).sum() == 1
    assert got[2].sum() == 0 and got[3].sum() == 0


def test_dims_guard_and_determinism(ray_session):
    import ray

    with pytest.raises(ValueError):
        hashed_tf_vectors(ray.data.from_items([{"doc_id": 0, "text": "x"}]),
                          dims=0)
    rows = [{"doc_id": i, "text": f"w{i} common w{i % 3}"} for i in range(50)]
    a = hashed_tf_vectors(ray.data.from_items(rows), dims=16).take_all()
    b = hashed_tf_vectors(ray.data.from_items(rows).repartition(7),
                          dims=16).take_all()
    ka = sorted((r["doc_id"], tuple(r["vec"])) for r in a)
    kb = sorted((r["doc_id"], tuple(r["vec"])) for r in b)
    assert ka == kb


def test_feeds_ann(ray_session):
    """The vectors compose with the existing ANN machinery unchanged."""
    import ray

    from janet_ray.stages.similarity import brute_force_topk

    rows = [{"doc_id": i,
             "text": ("alpha beta gamma " * (i % 3 + 1)) + f" uniq{i}"}
            for i in range(30)]
    vecs = hashed_tf_vectors(ray.data.from_items(rows), dims=16)

    def to_emb(batch: pa.Table) -> pa.Table:
        flat = batch["vec"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(batch.num_rows, 16)
        return pa.table({
            "vec_id": batch["doc_id"],
            "embedding": pa.array([r.astype(np.float64).tolist()
                                   for r in flat]),
        })

    emb = vecs.map_batches(to_emb, batch_format="pyarrow",
                           zero_copy_batch=True)
    q = _ref_vec(rows[0]["text"], 16).astype(np.float64)
    out = brute_force_topk(emb, {0: q}, k=3).to_pandas()
    assert len(out) == 3
    # exact cosine reference over the same hashed vectors (self excluded)
    M = np.stack([_ref_vec(r["text"], 16).astype(np.float64) for r in rows])
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    want = [i for i in sorted(range(30), key=lambda i: (-cos[i], i))
            if i != 0][:3]
    got = list(out.sort_values("rank").neighbor_id)
    assert got == want, (got, want)
