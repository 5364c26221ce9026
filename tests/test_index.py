"""Distributed inverted index (stages/index.py) — build/lookup correctness,
bucket pruning, atomic commit, and parity with a scan-based token-tf top-k."""

import os
import zlib
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from janet_ray.stages import index as inv

TEXTS = [
    "the data pipeline processes data rows",          # data×2
    "database systems store data",                    # data×1 (database ≠ data)
    "no relevant tokens here at all",                 # data×0
    "data Data DATA punctuation,data!",               # data×4 (case + punct splits)
    "",                                               # empty doc
    "metadata is not data but meta-data is two tokens data",  # meta,data,...: data×3
]


def _ref_postings(texts):
    """Single-process ground truth: per-(term, doc) token counts under the
    [a-z0-9]+ lowercase tokenizer."""
    import re

    tok = re.compile(r"[a-z0-9]+")
    out = Counter()
    for i, t in enumerate(texts):
        for w in tok.findall(t.lower()):
            out[(w, i)] += 1
    return out


def _docs_ds(texts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_build_and_lookup_exact(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    stats = inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    want = _ref_postings(TEXTS)
    assert stats["n_postings"] == len(want)
    assert stats["n_terms"] == len({t for t, _ in want})
    assert stats["n_docs"] == len(TEXTS)
    assert stats["total_tokens"] == sum(want.values())
    assert stats["avgdl"] == pytest.approx(sum(want.values()) / len(TEXTS))

    # denormalized dl on every posting == the doc's total token count
    doc_len = Counter()
    for (term, doc), tf in want.items():
        doc_len[doc] += tf
    for f in inv.scan_index_files(d):
        t = pq.read_table(f)
        for doc, dl in zip(t["doc_id"].to_pylist(), t["dl"].to_pylist()):
            assert dl == doc_len[doc]

    # every posting lands in its term's bucket with the exact tf
    got = {}
    for f in inv.scan_index_files(d):
        t = pq.read_table(f)
        b = int(os.path.basename(f)[len("bucket-"):-len(".parquet")])
        for term, doc, tf in zip(t["term"].to_pylist(), t["doc_id"].to_pylist(),
                                 t["tf"].to_pylist()):
            assert inv.term_bucket(term, 4) == b
            got[(term, doc)] = tf
        # sorted by (term, doc_id) within the file
        assert t.to_pylist() == sorted(
            t.to_pylist(), key=lambda r: (r["term"], r["doc_id"]))
    assert got == dict(want)

    # the reference's top-10 query shape, from one bucket file
    top = inv.index_lookup(d, "data", k=10).to_pylist()
    assert [(r["doc_id"], r["tf"]) for r in top] == [(3, 4), (5, 3), (0, 2), (1, 1)]
    # tokenizer contract: query term is lowercased
    assert inv.index_lookup(d, "DATA", k=10).to_pylist() == top
    # absent term → empty, not an error
    assert inv.index_lookup(d, "zzzmissing", k=10).num_rows == 0


def test_lookup_reads_only_one_bucket(ray_session, tmp_path):
    """The scale property: a lookup must touch exactly the term's bucket file —
    delete every other bucket and the lookup still answers."""
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=8)
    keep = inv.bucket_path(d, inv.term_bucket("data", 8))
    for f in inv.scan_index_files(d):
        if f != keep:
            os.remove(f)
    top = inv.index_lookup(d, "data", k=10).to_pylist()
    assert [(r["doc_id"], r["tf"]) for r in top] == [(3, 4), (5, 3), (0, 2), (1, 1)]


def test_multi_term_or_scoring(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    want = _ref_postings(TEXTS)
    scores = Counter()
    for (term, doc), tf in want.items():
        if term in ("data", "database"):
            scores[doc] += tf
    got = inv.index_lookup_multi(d, ["data", "database", "data"], k=10).to_pylist()
    assert {r["doc_id"]: r["score"] for r in got} == dict(scores)
    # ranked by (score desc, doc_id asc)
    pairs = [(r["score"], -r["doc_id"]) for r in got]
    assert pairs == sorted(pairs, reverse=True)


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Single-process BM25 ground truth from raw texts."""
    import math

    post = _ref_postings(texts)
    doc_len = Counter()
    for (term, doc), tf in post.items():
        doc_len[doc] += tf
    n = len(texts)
    avgdl = (sum(doc_len.values()) / n) if n else 1.0
    scores = Counter()
    for term in dict.fromkeys(terms):
        hits = {doc: tf for (t, doc), tf in post.items() if t == term}
        df = len(hits)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for doc, tf in hits.items():
            scores[doc] += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * doc_len[doc] / avgdl))
    return dict(scores)


def test_bm25_matches_reference(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    terms = ["data", "database", "tokens"]
    want = _bm25_reference(TEXTS, terms)
    got = inv.index_lookup_bm25(d, terms, k=10).to_pylist()
    assert {r["doc_id"] for r in got} == set(want)
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]], rel=1e-12)
    # ranked by (score desc, doc_id asc)
    pairs = [(-r["score"], r["doc_id"]) for r in got]
    assert pairs == sorted(pairs)
    # absent-everywhere query → empty float-typed result
    empty = inv.index_lookup_bm25(d, ["zzznope"], k=10)
    assert empty.num_rows == 0 and empty["score"].type == "double"


def test_parity_with_scan_based_topk(ray_session, tmp_path):
    """VERDICT r02 #3 done-criterion: index lookup == scan-based token-tf
    top-k on the same corpus (deterministic tiebreak by doc_id)."""
    rng_texts = [f"doc {i} " + "data " * (i % 5) + "filler words here"
                 for i in range(200)]
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(rng_texts), d, num_buckets=16)
    want = _ref_postings(rng_texts)
    scan_top = sorted(
        ((doc, tf) for (term, doc), tf in want.items() if term == "data"),
        key=lambda r: (-r[1], r[0]))[:10]
    got = inv.index_lookup(d, "data", k=10).to_pylist()
    assert [(r["doc_id"], r["tf"]) for r in got] == scan_top


def test_bucket_function_is_with_part_arithmetic():
    """term_bucket must equal the build-side with_part hash for a single
    string column, or lookups read the wrong file."""
    for term in ["data", "a", "zz9", "longertoken123"]:
        assert inv.term_bucket(term, 32) == abs(zlib.crc32(term.encode())) % 32


def test_stop_terms_cut_before_shuffle(ray_session, tmp_path):
    """stop_terms drop in the map stage: no postings for the hot term anywhere
    in the index, other terms untouched, lookups for the stopword → empty."""
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4,
                             stop_terms={"data", "is"})
    terms_on_disk = set()
    for f in inv.scan_index_files(d):
        terms_on_disk.update(pq.read_table(f, columns=["term"])["term"].to_pylist())
    assert "data" not in terms_on_disk and "is" not in terms_on_disk
    assert "database" in terms_on_disk  # only exact terms drop
    assert inv.index_lookup(d, "data", k=10).num_rows == 0
    # dl (BM25 length norm) still counts the stopped tokens
    want = _ref_postings(TEXTS)
    doc_len = Counter()
    for (term, doc), tf in want.items():
        doc_len[doc] += tf
    for f in inv.scan_index_files(d):
        t = pq.read_table(f)
        for doc, dl in zip(t["doc_id"].to_pylist(), t["dl"].to_pylist()):
            assert dl == doc_len[doc]


def test_max_df_ratio_drops_ubiquitous_terms(ray_session, tmp_path):
    """max_df_ratio: terms in more than ratio*N docs are cut inside the bucket
    writer; stats report the drop."""
    texts = [f"common filler word{i % 3} unique{i}" for i in range(20)]
    d = str(tmp_path / "idx")
    stats = inv.build_inverted_index(_docs_ds(texts), d, num_buckets=4,
                                     max_df_ratio=0.5)
    # 'common' and 'filler' are in all 20 docs (df=20 > 10); word0/1/2 df≈7 stay
    terms_on_disk = set()
    for f in inv.scan_index_files(d):
        terms_on_disk.update(pq.read_table(f, columns=["term"])["term"].to_pylist())
    assert "common" not in terms_on_disk and "filler" not in terms_on_disk
    assert {"word0", "word1", "word2"} <= terms_on_disk
    assert stats["n_dropped_terms"] == 2
    assert inv.index_lookup(d, "common", k=10).num_rows == 0
    assert inv.index_lookup(d, "unique7", k=10).to_pylist() == [
        {"doc_id": 7, "tf": 1}]


def _write_shards(dirpath, texts, shard_rows):
    os.makedirs(dirpath)
    for s, i in enumerate(range(0, len(texts), shard_rows)):
        chunk = texts[i:i + shard_rows]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(i, i + len(chunk)), pa.int64()),
            "text": pa.array(chunk, pa.string()),
        }), os.path.join(dirpath, f"shard-{s:03d}.parquet"))


def test_segmented_build_matches_flat(ray_session, tmp_path):
    """Lucene-segments shape: segmented build == flat build (same postings,
    same lookups, same BM25 — global df/N/avgdl from the merged meta)."""
    texts = [f"doc {i} " + "data " * (i % 4) + "word common text" for i in range(60)]
    inp = str(tmp_path / "shards")
    _write_shards(inp, texts, shard_rows=10)

    flat = str(tmp_path / "flat")
    inv.build_inverted_index(_docs_ds(texts), flat, num_buckets=8)
    segd = str(tmp_path / "segd")
    merged = inv.build_index_segments(inp, segd, files_per_segment=2,
                                      num_buckets=8)
    assert merged["segments"] == 3 and merged["n_docs"] == 60
    assert merged["n_postings"] == inv.index_meta(flat)["n_postings"]
    assert merged["avgdl"] == pytest.approx(inv.index_meta(flat)["avgdl"])

    for term in ("data", "common", "doc", "zzzmissing"):
        a = inv.index_lookup(flat, term, k=50).to_pylist()
        b = inv.index_lookup(segd, term, k=50).to_pylist()
        assert sorted(a, key=lambda r: r["doc_id"]) == sorted(
            b, key=lambda r: r["doc_id"])
    ba = inv.index_lookup_bm25(flat, ["data", "common"], k=50).to_pylist()
    bb = inv.index_lookup_bm25(segd, ["data", "common"], k=50).to_pylist()
    assert [(r["doc_id"], pytest.approx(r["score"])) for r in ba] == \
           [(r["doc_id"], r["score"]) for r in bb]


def test_segmented_build_resumes_and_appends(ray_session, tmp_path):
    """A committed segment is never rebuilt (resume), and new shards extend
    the index with new segments only (append-only ingest)."""
    texts = [f"alpha beta gamma{i % 5} token{i}" for i in range(40)]
    inp = str(tmp_path / "shards")
    _write_shards(inp, texts, shard_rows=10)
    d = str(tmp_path / "segd")
    inv.build_index_segments(inp, d, files_per_segment=2, num_buckets=4)
    seg0_files = sorted(
        os.path.join(d, "segment-00000", f)
        for f in os.listdir(os.path.join(d, "segment-00000")))
    mtimes = {f: os.path.getmtime(f) for f in seg0_files}

    # rerun: nothing recomputed
    inv.build_index_segments(inp, d, files_per_segment=2, num_buckets=4)
    assert all(os.path.getmtime(f) == t for f, t in mtimes.items())

    # new shard lands → exactly one new segment, old untouched, lookup sees it
    pq.write_table(pa.table({
        "doc_id": pa.array([1000], pa.int64()),
        "text": pa.array(["alpha fresharrival"], pa.string()),
    }), os.path.join(inp, "shard-999.parquet"))
    merged = inv.build_index_segments(inp, d, files_per_segment=2, num_buckets=4)
    assert merged["segments"] == 3 and merged["n_docs"] == 41
    assert all(os.path.getmtime(f) == t for f, t in mtimes.items())
    hit = inv.index_lookup(d, "fresharrival", k=10).to_pylist()
    assert hit == [{"doc_id": 1000, "tf": 1}]
    alpha = inv.index_lookup(d, "alpha", k=50)
    assert alpha.num_rows == 41

    # a shard inserted MID-list shifts every group → loud failure, not silent
    # mis-coverage (the PartitionPlanChanged analogue)
    pq.write_table(pa.table({
        "doc_id": pa.array([2000], pa.int64()),
        "text": pa.array(["interloper"], pa.string()),
    }), os.path.join(inp, "shard-0005.parquet"))
    with pytest.raises(RuntimeError, match="append-only"):
        inv.build_index_segments(inp, d, files_per_segment=2, num_buckets=4)


def test_empty_corpus(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    stats = inv.build_inverted_index(_docs_ds(["", "   "]), d, num_buckets=4)
    assert stats["n_postings"] == 0
    assert inv.index_lookup(d, "data", k=10).num_rows == 0


def test_merge_segments_compacts_to_flat(ray_session, tmp_path):
    """Segment merge (Lucene compaction): merged index == the segmented
    index for every lookup flavor, reads ONE file per term, n_terms becomes
    the exact distinct count, and the source segments are untouched."""
    texts = [f"doc {i} " + "data " * (i % 4) + "word common text"
             for i in range(60)]
    inp = str(tmp_path / "shards")
    _write_shards(inp, texts, shard_rows=10)
    segd = str(tmp_path / "segd")
    inv.build_index_segments(inp, segd, files_per_segment=2, num_buckets=8)

    out = str(tmp_path / "compact")
    meta = inv.merge_segments(segd, out)
    assert meta["merged_from_segments"] == 3
    assert meta["n_postings"] == inv.index_meta(segd)["n_postings"]
    assert meta["n_docs"] == 60
    # flat layout: no segments, one bucket file set at the root
    assert inv.segment_dirs(out) == []
    flat = str(tmp_path / "flat")
    inv.build_inverted_index(_docs_ds(texts), flat, num_buckets=8)
    assert meta["n_terms"] == inv.index_meta(flat)["n_terms"]  # exact now

    for term in ("data", "common", "doc", "zzzmissing"):
        a = inv.index_lookup(segd, term, k=50).to_pylist()
        b = inv.index_lookup(out, term, k=50).to_pylist()
        assert sorted(a, key=lambda r: r["doc_id"]) == sorted(
            b, key=lambda r: r["doc_id"])
    ba = inv.index_lookup_bm25(segd, ["data", "common"], k=50).to_pylist()
    bb = inv.index_lookup_bm25(out, ["data", "common"], k=50).to_pylist()
    assert [(r["doc_id"], pytest.approx(r["score"])) for r in ba] == \
           [(r["doc_id"], r["score"]) for r in bb]
    # segments untouched; merge refuses to overwrite
    assert inv.segment_dirs(segd)
    with pytest.raises(FileExistsError):
        inv.merge_segments(segd, out)


def test_multi_term_case_folds_before_dedupe(ray_session, tmp_path):
    """'Dog' and 'dog' are one term: multi-term lookups must not read and
    score its postings twice."""
    texts = ["dog park", "dog dog walk", "cat nap"]
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(texts), d, num_buckets=4)
    once = inv.index_lookup_multi(d, ["dog"], k=10).to_pylist()
    twice = inv.index_lookup_multi(d, ["Dog", "dog"], k=10).to_pylist()
    assert once == twice
    b1 = inv.index_lookup_bm25(d, ["dog"], k=10).to_pylist()
    b2 = inv.index_lookup_bm25(d, ["DOG", "dog"], k=10).to_pylist()
    assert [(r["doc_id"], pytest.approx(r["score"])) for r in b1] == \
        [(r["doc_id"], r["score"]) for r in b2]


def test_segment_resume_rejects_bucket_change(ray_session, tmp_path):
    """Resuming a segmented build with a different num_buckets must raise —
    old segments' bucket files would be invisible to the new arithmetic."""
    texts = [f"doc {i} words here" for i in range(20)]
    inp = str(tmp_path / "shards")
    _write_shards(inp, texts, shard_rows=5)
    d = str(tmp_path / "segd")
    inv.build_index_segments(inp, d, files_per_segment=2, num_buckets=8)
    with pytest.raises(RuntimeError, match="num_buckets"):
        inv.build_index_segments(inp, d, files_per_segment=2, num_buckets=4)


# ------------------------------------------------------------ positional

def _brute_phrase_counts(texts, phrase):
    """Reference: count (possibly overlapping) consecutive-token matches."""
    import re

    tok = re.compile(r"[a-z0-9]+")
    ptoks = tok.findall(phrase.lower())
    out = {}
    for i, t in enumerate(texts):
        toks = tok.findall(t.lower())
        n = sum(1 for j in range(len(toks) - len(ptoks) + 1)
                if toks[j:j + len(ptoks)] == ptoks)
        if n:
            out[i] = n
    return out


def test_positional_build_stores_sorted_offsets(ray_session, tmp_path):
    d = str(tmp_path / "pidx")
    stats = inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4,
                                     with_positions=True)
    assert stats["positional"] is True
    import re

    tok = re.compile(r"[a-z0-9]+")
    want = {}
    for i, t in enumerate(TEXTS):
        for p, w in enumerate(tok.findall(t.lower())):
            want.setdefault((w, i), []).append(p)
    got = {}
    for f in inv.scan_index_files(d):
        t = pq.read_table(f)
        for term, doc, pos in zip(t["term"].to_pylist(),
                                  t["doc_id"].to_pylist(),
                                  t["pos"].to_pylist()):
            got[(term, doc)] = sorted(pos)
    assert got == want


def test_phrase_lookup_matches_bruteforce(ray_session, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown quick brown fox and another quick brown fox here",
        "brown quick nothing consecutive here",
        "totally unrelated content",
        "a a a a",  # overlapping self-phrase
    ]
    d = str(tmp_path / "pidx2")
    inv.build_inverted_index(_docs_ds(texts), d, num_buckets=4,
                             with_positions=True)
    for phrase in ["quick brown", "quick brown fox", "a a",
                   "lazy dog", "missing phrase", "brown"]:
        got = inv.index_lookup_phrase(d, phrase)
        got_map = dict(zip(got["doc_id"].to_pylist(),
                           got["n_matches"].to_pylist()))
        assert got_map == _brute_phrase_counts(texts, phrase), phrase
    # ordering: n_matches desc, doc_id asc; k truncation
    got = inv.index_lookup_phrase(d, "quick brown", k=1)
    assert got.num_rows == 1 and got["doc_id"][0].as_py() == 1


def test_phrase_lookup_requires_positional_index(ray_session, tmp_path):
    d = str(tmp_path / "flatidx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    with pytest.raises(ValueError, match="positional"):
        inv.index_lookup_phrase(d, "any phrase")


def test_phrase_lookup_over_segments(ray_session, tmp_path):
    """Positions are per-doc, so a segmented positional index serves phrase
    queries identically to flat."""
    texts = ["alpha beta gamma", "beta gamma alpha beta gamma",
             "gamma beta alpha"]
    inp = tmp_path / "shards"
    inp.mkdir()
    for i, t in enumerate(texts):
        pq.write_table(pa.table({"doc_id": pa.array([i], pa.int64()),
                                 "text": pa.array([t], pa.string())}),
                       str(inp / f"shard-{i:03d}.parquet"))
    d = str(tmp_path / "segidx")
    meta = inv.build_index_segments(str(inp), d, files_per_segment=1,
                                    num_buckets=4, with_positions=True)
    assert meta["positional"] is True
    got = inv.index_lookup_phrase(d, "beta gamma")
    got_map = dict(zip(got["doc_id"].to_pylist(),
                       got["n_matches"].to_pylist()))
    assert got_map == _brute_phrase_counts(texts, "beta gamma")


def test_phrase_lookup_with_stop_terms(ray_session, tmp_path):
    """Positions flow through the stopword/df cuts: a stopped term has no
    postings, so phrases containing it return empty while others work."""
    texts = ["alpha the beta gamma", "alpha the beta delta", "beta gamma x"]
    d = str(tmp_path / "pidx_stop")
    inv.build_inverted_index(_docs_ds(texts), d, num_buckets=4,
                             with_positions=True, stop_terms={"the"})
    assert inv.index_lookup_phrase(d, "alpha the").num_rows == 0
    got = inv.index_lookup_phrase(d, "beta gamma")
    assert dict(zip(got["doc_id"].to_pylist(),
                    got["n_matches"].to_pylist())) == {0: 1, 2: 1}


def test_boolean_lookup(ray_session, tmp_path):
    import re

    d = str(tmp_path / "idx_bool")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    tok = re.compile(r"[a-z0-9]+")

    def ref(must, must_not):
        rows = []
        for i, t in enumerate(TEXTS):
            cnt = Counter(tok.findall(t.lower()))
            if all(cnt[m] > 0 for m in must) and all(cnt[n] == 0 for n in must_not):
                rows.append((i, sum(cnt[m] for m in must)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows

    for must, must_not in ([["data"], ["meta"]],
                           [["data", "tokens"], []],
                           [["data"], []],
                           [["data", "the"], ["systems"]]):
        got = inv.index_lookup_boolean(d, must, must_not)
        assert list(zip(got["doc_id"].to_pylist(),
                        got["score"].to_pylist())) == ref(must, must_not), (must, must_not)

    # absent must term → AND empties; dedupe + case-fold of must terms
    assert inv.index_lookup_boolean(d, ["data", "zzzz"]).num_rows == 0
    a = inv.index_lookup_boolean(d, ["Data", "data"])
    b = inv.index_lookup_boolean(d, ["data"])
    assert a.equals(b)                      # "Data" and "data" score once
    # top-k cut
    topped = inv.index_lookup_boolean(d, ["data"], k=1)
    assert topped.num_rows == 1 and topped["doc_id"][0].as_py() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        inv.index_lookup_boolean(d, [])


# ----------------------------------------------------------------- deletes

def test_delete_docs_masks_all_lookups(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    before = set(inv.index_lookup(d, "data")["doc_id"].to_pylist())
    assert {0, 3} <= before
    res = inv.delete_docs(d, [3, 0])
    assert res["n_deleted"] == 2 and os.path.exists(res["file"])
    after = set(inv.index_lookup(d, "data")["doc_id"].to_pylist())
    assert after == before - {0, 3}
    # every lookup family flows through the same mask
    assert 3 not in set(inv.index_lookup_multi(d, ["data", "rows"])
                        ["doc_id"].to_pylist())
    assert 3 not in set(inv.index_lookup_bm25(d, ["data"])
                        ["doc_id"].to_pylist())
    # incremental tombstones union across files
    inv.delete_docs(d, [1])
    assert set(inv.index_lookup(d, "data")["doc_id"].to_pylist()) == \
        before - {0, 1, 3}
    assert inv.tombstoned_ids(d).tolist() == [0, 1, 3]
    # empty delete is a no-op
    assert inv.delete_docs(d, [])["n_deleted"] == 0


def test_merge_applies_tombstones_physically(ray_session, tmp_path):
    src = str(tmp_path / "shards")
    _write_shards(src, TEXTS, shard_rows=2)
    d = str(tmp_path / "segidx")
    inv.build_index_segments(src, d, files_per_segment=1, num_buckets=4)
    inv.delete_docs(d, [3])
    assert 3 not in set(inv.index_lookup(d, "data")["doc_id"].to_pylist())
    out = str(tmp_path / "merged")
    inv.merge_segments(d, out)
    # physically purged: no tombstone files, no doc-3 postings on disk
    assert inv.tombstone_files(out) == []
    for f in inv.scan_index_files(out):
        assert 3 not in set(pq.read_table(f)["doc_id"].to_pylist())
    assert set(inv.index_lookup(out, "data")["doc_id"].to_pylist()) == \
        set(inv.index_lookup(d, "data")["doc_id"].to_pylist())
    # deleting again on the merged index works
    inv.delete_docs(out, [0])
    assert 0 not in set(inv.index_lookup(out, "data")["doc_id"].to_pylist())


def test_delete_does_not_mask_readded_docs(ray_session, tmp_path):
    """A tombstone covers only the segments that existed at delete time: a
    document re-added in a LATER segment is live again, and compaction keeps
    exactly the new version (the delete-then-reindex update flow)."""
    src = str(tmp_path / "shards")
    _write_shards(src, TEXTS, shard_rows=2)
    d = str(tmp_path / "segidx")
    inv.build_index_segments(src, d, files_per_segment=1, num_buckets=4)
    inv.delete_docs(d, [3])
    assert 3 not in set(inv.index_lookup(d, "data")["doc_id"].to_pylist())
    # re-add doc 3 with NEW text as a fresh shard -> new segment
    pq.write_table(pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "text": pa.array(["fresh reindexed data data"], pa.string()),
    }), os.path.join(src, "shard-900.parquet"))
    inv.build_index_segments(src, d, files_per_segment=1, num_buckets=4)
    t = inv.index_lookup(d, "data")
    by_id = dict(zip(t["doc_id"].to_pylist(), t["tf"].to_pylist()))
    assert by_id.get(3) == 2  # the NEW version's tf, not the old 4
    # compaction keeps only the new version's postings
    out = str(tmp_path / "merged")
    inv.merge_segments(d, out)
    t2 = inv.index_lookup(out, "data")
    by_id2 = dict(zip(t2["doc_id"].to_pylist(), t2["tf"].to_pylist()))
    assert by_id2.get(3) == 2
    assert "punctuation" not in [r for f in inv.scan_index_files(out)
                                 for r in pq.read_table(f)["term"].to_pylist()
                                 ]  # old doc-3-only term is purged


def test_prefix_lookup_scores_and_order(ray_session, tmp_path):
    """Prefix score = Σ tf over every term starting with the prefix
    ('dat' matches data, database, and the 'data' inside meta-data splits),
    ranked (score desc, doc_id asc); verified against the reference
    postings; empty prefix raises; unmatched prefix returns typed empty."""
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    out = inv.index_lookup_prefix(d, "dat", k=10).to_pydict()
    ref = Counter()
    for (term, doc), tf in _ref_postings(TEXTS).items():
        if term.startswith("dat"):
            ref[doc] += tf
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(out["doc_id"], out["score"])) == want
    # uppercase prefix goes through the tokenizer contract
    up = inv.index_lookup_prefix(d, "DAT", k=10).to_pydict()
    assert up == out
    # unmatched prefix: typed empty
    none = inv.index_lookup_prefix(d, "zzz", k=10)
    assert none.num_rows == 0 and none.schema.field("score").type == pa.int64()
    import pytest as _pytest
    with _pytest.raises(ValueError):
        inv.index_lookup_prefix(d, "", k=10)


def test_prefix_lookup_respects_tombstones(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    inv.build_inverted_index(_docs_ds(TEXTS), d, num_buckets=4)
    before = inv.index_lookup_prefix(d, "dat", k=10).to_pydict()
    assert 3 in before["doc_id"]  # the data×4 doc
    inv.delete_docs(d, [3])
    after = inv.index_lookup_prefix(d, "dat", k=10).to_pydict()
    assert 3 not in after["doc_id"]
    assert set(before["doc_id"]) - set(after["doc_id"]) == {3}


def test_prefix_lookup_over_segments(ray_session, tmp_path):
    """Segmented prefix retrieval == flat prefix retrieval (a doc lives in
    exactly one segment, so the per-bucket range reads concatenate without
    a merge), and segment-scoped tombstones mask prefix hits too."""
    texts = [f"doc {i} " + "data " * (i % 4) + ("database " if i % 5 == 0
             else "") + "word common text" for i in range(60)]
    inp = str(tmp_path / "shards")
    _write_shards(inp, texts, shard_rows=10)

    flat = str(tmp_path / "flat")
    inv.build_inverted_index(_docs_ds(texts), flat, num_buckets=8)
    segd = str(tmp_path / "segd")
    inv.build_index_segments(inp, segd, files_per_segment=2, num_buckets=8)

    a = inv.index_lookup_prefix(flat, "dat", k=100).to_pylist()
    b = inv.index_lookup_prefix(segd, "dat", k=100).to_pylist()
    assert a == b and len(a) > 0
    # 'dat' scores count data AND database occurrences
    ref = {i: t.split().count("data") + t.split().count("database")
           for i, t in enumerate(texts)}
    for r in a:
        assert r["score"] == ref[r["doc_id"]]
    # segment-scoped tombstone masks the prefix path
    victim = a[0]["doc_id"]
    inv.delete_docs(segd, [victim])
    after = inv.index_lookup_prefix(segd, "dat", k=100).to_pylist()
    assert victim not in [r["doc_id"] for r in after]
    assert len(after) == len(a) - 1
