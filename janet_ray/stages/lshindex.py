"""Persisted MinHash-LSH band index — INCREMENTAL near-duplicate detection:
dedup a new crawl batch against an existing corpus WITHOUT recomputing the
corpus (the bloom.py story at near-dup granularity). At 100 TB the corpus
side is the asset: its band keys are computed once, persisted, and every
subsequent ingest probes them.

Layout (the inverted-index conventions, stages/index.py): the index is a
directory of SEGMENTS (``segment-000000`` …), each holding one sorted
band-row Parquet per bucket (``bucket-000kk.parquet``: band int32, key
int64, doc_id int64, sorted by (key, band, doc_id)) plus a meta json with
the signature parameters. A segment is committed atomically (tmp dir +
rename); ``append_band_index`` adds a new segment per ingest batch — a doc
lives in exactly one segment, so probes concatenate per-bucket files with
no reconciliation (the Lucene-segments shape).

Build/probe shape:
  * build/append: the SAME MinHasher/band_keys family as
    minhash_candidates (dedup.py — signatures are seed-stable across
    runs/workers, the resume contract) explodes docs to (band, key,
    doc_id) rows; ONE hash shuffle on ``bucket = |key| % num_buckets``;
    one sorted file per bucket. Only 20-byte band rows move — never text.
  * probe: new docs explode to the same band rows (parameters READ FROM
    META — a probe can't drift from its index), one shuffle on the same
    bucket arithmetic, then each bucket group reads ITS bucket file(s)
    once and matches (band, key) via a packed key·64+band composite
    (injective for bands ≤ 64: a collision would need a multiple of 64 to
    equal a nonzero offset < 64). Candidates are (new_id, old_id) pairs,
    deduped on a coarse partition key.
  * verify (``incremental_neardup``): exact word-k-gram jaccard ≥
    threshold, texts pulled ONLY for candidate ids — broadcast maps below
    ``broadcast_pairs_max`` candidates (the minhash_neardup_pairs
    judgement), two distributed hash joins above (new side joins new_ds,
    old side joins old_ds).

SQL-oracle story: like minhash_neardup, the oracle is hash-independent —
exact all-pairs jaccard between the two sides — so LSH recall at the
tested threshold is part of what the gate checks.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from janet_ray.stages.dedup import (MinHashBandStage, _N_SHUFFLE_PARTS,
                                    _join_partitions, jaccard)

META_FILE = "_lsh_meta.json"


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    return (np.abs(keys) % num_buckets).astype(np.int32)


def _packed(band: np.ndarray, key: np.ndarray) -> np.ndarray:
    """Injective (band, key) composite for bands ≤ 64 (see module doc)."""
    with np.errstate(over="ignore"):
        return key.astype(np.uint64) * np.uint64(64) + band.astype(np.uint64)


def segment_dirs(index_dir: str) -> list[str]:
    # a crashed append leaves segment-NNNNNN.tmp — absent until os.replace
    return sorted(d for d in glob.glob(os.path.join(index_dir, "segment-*"))
                  if os.path.isdir(d) and not d.endswith(".tmp"))


def lsh_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def _band_rows(ds, *, n_perm: int, bands: int, k: int, id_col: str,
               text_col: str, num_buckets: int):
    """(doc_id, band, key, part=bucket) rows — MinHashBandStage re-keyed to
    the index's bucket arithmetic so the shuffle key IS the file id."""

    def f(batch: pa.Table) -> pa.Table:
        t = MinHashBandStage(n_perm=n_perm, bands=bands, k=k, id_col=id_col,
                             text_col=text_col)(batch)
        keys = t["key"].to_numpy(zero_copy_only=False)
        return t.set_column(t.schema.get_field_index("part"), "part",
                            pa.array(_bucket_of(keys, num_buckets), pa.int32()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def build_band_index(ds, index_dir: str, *, n_perm: int = 128,
                     bands: int = 32, k: int = 3, id_col: str = "doc_id",
                     text_col: str = "text", num_buckets: int = 32) -> dict:
    """Create the index with one initial segment. Returns the meta dict."""
    if bands > 64:
        raise ValueError("bands must be <= 64 (packed-composite injectivity)")
    if os.path.exists(os.path.join(index_dir, META_FILE)):
        raise FileExistsError(f"band index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    meta = {"n_perm": n_perm, "bands": bands, "k": k,
            "num_buckets": num_buckets, "n_docs": 0, "n_band_rows": 0}
    tmp_meta = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(index_dir, META_FILE))
    return append_band_index(ds, index_dir, id_col=id_col, text_col=text_col)


def append_band_index(ds, index_dir: str, *, id_col: str = "doc_id",
                      text_col: str = "text") -> dict:
    """Add one atomically-committed segment of band rows for ``ds`` (an
    ingest batch). Parameters come from meta — an append cannot drift."""
    meta = lsh_meta(index_dir)
    nb = meta["num_buckets"]
    seg = os.path.join(index_dir, f"segment-{len(segment_dirs(index_dir)):06d}")
    tmp = seg + ".tmp"
    # clear any stale tmp from a crashed append: committing its leftover
    # bucket files would inject foreign band rows into the new segment
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    def write_bucket(group: pa.Table) -> pa.Table:
        bucket = int(group["part"][0].as_py())
        t = group.select(["band", "key", "doc_id"])
        t = t.take(pc.sort_indices(t, sort_keys=[("key", "ascending"),
                                                 ("band", "ascending"),
                                                 ("doc_id", "ascending")]))
        pq.write_table(t, os.path.join(tmp, f"bucket-{bucket:05d}.parquet"),
                       row_group_size=16384)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    rows = _band_rows(ds, n_perm=meta["n_perm"], bands=meta["bands"],
                      k=meta["k"], id_col=id_col, text_col=text_col,
                      num_buckets=nb)
    manifest = (rows.groupby("part").map_groups(write_bucket,
                                                batch_format="pyarrow")
                .take_all())  # ≤ num_buckets rows
    n_rows = int(sum(r["n"] for r in manifest))
    os.replace(tmp, seg)  # atomic: a segment is absent or complete
    meta["n_docs"] = int(meta["n_docs"]) + int(ds.count())
    meta["n_band_rows"] = int(meta["n_band_rows"]) + n_rows
    tmp_meta = os.path.join(index_dir, META_FILE + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(index_dir, META_FILE))
    return meta


def probe_band_index(new_ds, index_dir: str, *, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Distinct candidate (new_id, old_id) pairs: one shuffle of the NEW
    side's band rows on the index's bucket arithmetic, then each bucket
    group reads its bucket file once per segment and intersects packed
    (band, key) composites. The index side streams from disk; neither
    corpus shuffles."""
    from janet_ray.state.tombstones import dead_mask, tombstone_sets

    meta = lsh_meta(index_dir)
    nb = meta["num_buckets"]
    segs = segment_dirs(index_dir)
    dead_sets = tombstone_sets(index_dir)  # read once per probe

    def probe_bucket(group: pa.Table) -> pa.Table:
        bucket = int(group["part"][0].as_py())
        nk = _packed(group["band"].to_numpy(zero_copy_only=False),
                     group["key"].to_numpy(zero_copy_only=False))
        n_ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(nk, kind="stable")
        nk, n_ids = nk[order], n_ids[order]
        out_new, out_old = [], []
        for ordinal, seg in enumerate(segs):
            path = os.path.join(seg, f"bucket-{bucket:05d}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path)
            ok = _packed(t["band"].to_numpy(zero_copy_only=False),
                         t["key"].to_numpy(zero_copy_only=False))
            o_ids = t["doc_id"].to_numpy(zero_copy_only=False)
            if dead_sets:
                alive = ~dead_mask(o_ids, ordinal, dead_sets)
                if not alive.all():
                    ok, o_ids = ok[alive], o_ids[alive]
            # every index row whose composite occurs on the new side
            pos = np.searchsorted(nk, ok)
            pos_ok = pos < nk.size
            hit = pos_ok & (nk[np.minimum(pos, nk.size - 1)] == ok)
            if not hit.any():
                continue
            # expand: a composite can occur on several new docs (run in nk)
            run_end = np.searchsorted(nk, ok[hit], side="right")
            run_start = pos[hit]
            reps = run_end - run_start
            old_rep = np.repeat(o_ids[hit], reps)
            total = int(reps.sum())
            # vectorized concat of the per-hit ranges [run_start, run_end)
            idx = (np.repeat(run_start, reps)
                   + np.arange(total)
                   - np.repeat(np.cumsum(reps) - reps, reps))
            out_new.append(n_ids[idx])
            out_old.append(old_rep)
        if not out_new:
            return pa.table({"new_id": pa.array([], pa.int64()),
                             "old_id": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int32())})
        new_all = np.concatenate(out_new).astype(np.int64)
        old_all = np.concatenate(out_old).astype(np.int64)
        # distinct within bucket; coarse part key for the cross-bucket dedupe
        t = pa.table({"new_id": pa.array(new_all, pa.int64()),
                      "old_id": pa.array(old_all, pa.int64())})
        t = t.group_by(["new_id", "old_id"]).aggregate([])
        part = ((t["new_id"].to_numpy(zero_copy_only=False)
                 * 31 + t["old_id"].to_numpy(zero_copy_only=False))
                % _N_SHUFFLE_PARTS).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    rows = _band_rows(new_ds, n_perm=meta["n_perm"], bands=meta["bands"],
                      k=meta["k"], id_col=id_col, text_col=text_col,
                      num_buckets=nb)
    cand = rows.groupby("part").map_groups(probe_bucket,
                                           batch_format="pyarrow")
    return cand.groupby("part").map_groups(
        lambda g: g.select(["new_id", "old_id"])
                   .group_by(["new_id", "old_id"]).aggregate([]),
        batch_format="pyarrow")


def incremental_neardup(new_ds, index_dir: str, old_ds, *,
                        threshold: float = 0.8, k: int | None = None,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int | None = None,
                        broadcast_pairs_max: int = 200_000):
    """(new_id, old_id, jaccard) for every new doc near-duplicating an
    indexed doc: probe candidates, then EXACT word-k-gram jaccard ≥
    threshold with texts pulled only for candidate ids (scale-adaptive —
    broadcast maps below ``broadcast_pairs_max``, distributed joins
    above)."""
    k = k if k is not None else lsh_meta(index_dir)["k"]
    cand = probe_band_index(new_ds, index_dir, id_col=id_col,
                            text_col=text_col).materialize()
    n_cand = cand.count()

    def _empty():
        return ray.data.from_arrow(pa.table({
            "new_id": pa.array([], pa.int64()),
            "old_id": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))

    if n_cand == 0:
        return _empty()

    if n_cand <= broadcast_pairs_max:
        rows = cand.take_all()
        need_new = np.unique(np.array([r["new_id"] for r in rows], np.int64))
        need_old = np.unique(np.array([r["old_id"] for r in rows], np.int64))

        def _texts(ds, need):
            ref = ray.put(need)

            def project(batch: pa.Table) -> pa.Table:
                ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                mask = np.isin(ids, ray.get(ref))
                return batch.select([id_col, text_col]).filter(pa.array(mask))

            got = ds.map_batches(project, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
            return ray.put({int(r[id_col]): r[text_col] for r in got})

        new_ref = _texts(new_ds, need_new)
        old_ref = _texts(old_ds, need_old)

        def verify(batch: pa.Table) -> pa.Table:
            from janet_ray.functions.broadcast import get_broadcast

            tn = get_broadcast(new_ref)
            to = get_broadcast(old_ref)
            a = batch["new_id"].to_pylist()
            b = batch["old_id"].to_pylist()
            js = [jaccard(tn.get(x) or "", to.get(y) or "", k)
                  for x, y in zip(a, b)]
            keep = [i for i, v in enumerate(js) if v >= threshold]
            return pa.table({
                "new_id": pa.array([a[i] for i in keep], pa.int64()),
                "old_id": pa.array([b[i] for i in keep], pa.int64()),
                "jaccard": pa.array([js[i] for i in keep], pa.float64()),
            })

        return cand.map_batches(verify, batch_format="pyarrow",
                                zero_copy_batch=True)

    from janet_ray.stages.joins import drop_empty_blocks

    nparts = _join_partitions(num_partitions)
    cand = drop_empty_blocks(cand)
    new_docs = new_ds.select_columns([id_col, text_col])
    old_docs = old_ds.select_columns([id_col, text_col])
    j1 = cand.join(new_docs, "inner", nparts, on=("new_id",),
                   right_on=(id_col,), right_suffix="_rn")
    j1 = drop_empty_blocks(j1.materialize())
    j2 = j1.join(old_docs, "inner", nparts, on=("old_id",),
                 right_on=(id_col,), right_suffix="_ro")

    def verify_joined(batch: pa.Table) -> pa.Table:
        a = batch["new_id"].to_pylist()
        b = batch["old_id"].to_pylist()
        js = [jaccard(x or "", y or "", k)
              for x, y in zip(batch[text_col].to_pylist(),
                              batch[f"{text_col}_ro"].to_pylist())]
        keep = [i for i, v in enumerate(js) if v >= threshold]
        return pa.table({
            "new_id": pa.array([a[i] for i in keep], pa.int64()),
            "old_id": pa.array([b[i] for i in keep], pa.int64()),
            "jaccard": pa.array([js[i] for i in keep], pa.float64()),
        })

    return j2.map_batches(verify_joined, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------- deletes
# Same segment-scoped tombstone model as the inverted index
# (state/tombstones.py): a deleted corpus document stops surfacing as a
# near-dup candidate, while a document re-added in a LATER segment is live
# again. The mask applies on the INDEX side inside probe_bucket, before the
# composite intersection — dead band rows never become candidate pairs.

def delete_docs(index_dir: str, doc_ids) -> dict:
    """Record corpus-document deletions against the band index."""
    from janet_ray.state import tombstones

    covered = max(len(segment_dirs(index_dir)), 1)
    return tombstones.write_tombstone(index_dir, doc_ids, covered)
