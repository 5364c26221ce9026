"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
subword-vocabulary builder every LM training pipeline runs over its corpus).

Pinned semantics (replicated exactly by the single-process reference in
tests/test_bpe.py):

  * word inventory = the engine tokenizer (lowercase, split on
    ``[^a-z0-9]+``, drop empties) folded to DISTINCT (word, freq);
  * a word's initial symbol sequence = its characters + a final ``</w>``
    end-of-word marker symbol;
  * merge step k: count adjacent symbol pairs weighted by word freq over
    the distinct-word table; the winner is the highest count with ties
    broken by the lexicographically smallest (left, right); merging
    replaces non-overlapping occurrences LEFT-TO-RIGHT (in ``aaa`` the
    pair (a,a) merges positions 0-1, not 1-2);
  * K merge steps → the merge table [(rank, left, right)].

Distributed shape — the corpus is touched ONCE (the word-count pass, the
vocab_topk combiner pattern: per-batch value_counts partials, one small
groupby; the token stream itself is never shuffled). The iterative loop
runs over the DISTINCT-WORD table (the model-fit metadata, orders of
magnitude smaller than the corpus — same scale contract as the LM bigram
model, boundable upstream with the vocab frequency cut). Each iteration:

  1. per-batch VECTORIZED pair counting over the flattened list<string>
     symbol column (offsets → adjacency mask → np.unique inverse →
     np.bincount weighted by freq) → partial (left, right, n) rows;
  2. one coarse fold (shuffle bounded by the distinct pair count): partials
     carry a fused crc32 part key, per-partition Arrow C++ hash group_by
     sums them and emits only that partition's top-1 candidate, then an
     O(n_parts) driver argmax (count desc, pair asc);
  3. a streaming merge-application pass updating the symbol column
     (vectorized run-detection for the left-to-right non-overlap rule),
     materialized for the next iteration (consumed K times; lineage must
     not recompute prior merges).

Driver state per iteration: one (left, right, count) triple. Rows shuffled
per iteration: distinct pairs only, never words, never the corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

END_WORD = "</w>"
_N_PARTS = 64  # coarse pair-fold shuffle width (engine shuffle rule)
_SEP = "\x01"  # never occurs in symbols (alnum + '</w>' concatenations);
# NOT \x00 — numpy unicode arrays truncate NULs and np.char treats a NUL
# separator as empty


# --------------------------------------------------------------- reference

def bpe_reference(word_freqs: dict[str, int], n_merges: int):
    """Single-process reference of the exact pinned semantics (test oracle;
    also the per-partition kernel contract)."""
    words = {w: list(w) + [END_WORD] for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best_n = max(counts.values())
        best = min(p for p, n in counts.items() if n == best_n)
        merges.append(best)
        l, r = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


# ------------------------------------------------------------- kernels

def _pair_counts(flat: np.ndarray, offsets: np.ndarray,
                 freq: np.ndarray) -> pa.Table:
    """(left, right, n) partials for one batch of symbolized words.
    ``flat``/``offsets`` are the list-column pieces; adjacency stops at
    list boundaries."""
    n_lists = len(offsets) - 1
    if len(flat) == 0:
        return pa.table({"part": pa.array([], pa.int32()),
                         "left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    # position i pairs with i+1 unless i+1 starts a new list
    is_last = np.zeros(len(flat), dtype=bool)
    is_last[offsets[1:] - 1] = True
    pos = np.nonzero(~is_last)[0]
    if len(pos) == 0:  # every word fully merged to one symbol
        return pa.table({"part": pa.array([], pa.int32()),
                         "left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    lefts, rights = flat[pos], flat[pos + 1]
    # weight of each pair = freq of its word
    word_of = np.repeat(np.arange(n_lists), np.diff(offsets))
    w = freq[word_of[pos]]
    key = np.char.add(np.char.add(lefts.astype(object).astype(str), _SEP),
                      rights.astype(object).astype(str))
    uniq, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=w).astype(np.int64)
    lr = np.char.partition(uniq, _SEP)
    # fused coarse partition key for the cross-batch fold (crc32: stable
    # across processes, cheap — only distinct pairs pay it)
    import zlib
    part = np.asarray([zlib.crc32(u.encode()) % _N_PARTS for u in uniq],
                      dtype=np.int32)
    return pa.table({"part": pa.array(part),
                     "left": pa.array(lr[:, 0].tolist(), pa.string()),
                     "right": pa.array(lr[:, 2].tolist(), pa.string()),
                     "n": pa.array(sums)})


def _apply_merge(flat: np.ndarray, offsets: np.ndarray, left: str,
                 right: str) -> tuple[np.ndarray, np.ndarray]:
    """Merge non-overlapping (left, right) occurrences left-to-right in every
    list. Vectorized: candidate positions → run detection → every-other
    selection within each run of consecutive candidates."""
    if len(flat) == 0:
        return flat, offsets
    is_last = np.zeros(len(flat), dtype=bool)
    is_last[offsets[1:] - 1] = True
    cand = np.nonzero((~is_last) & (flat == left)
                      & (np.roll(flat, -1) == right))[0]
    if len(cand) == 0:
        return flat, offsets
    # left-to-right non-overlap: in a run of consecutive candidate positions
    # (e.g. 'aaaa' with (a,a): cand = [0,1,2]) keep every other from the run
    # start (0 and 2). Runs never cross list boundaries because the boundary
    # position is not a candidate.
    run_start = np.nonzero(np.diff(cand, prepend=cand[0] - 2) > 1)[0]
    run_id = np.cumsum(np.isin(np.arange(len(cand)), run_start))
    off_in_run = np.arange(len(cand)) - run_start[run_id - 1]
    sel = cand[off_in_run % 2 == 0]
    # build output: selected position becomes left+right, position+1 dropped
    keep = np.ones(len(flat), dtype=bool)
    keep[sel + 1] = False
    out = flat.copy()
    out[sel] = left + right
    new_flat = out[keep]
    # per-list removed count adjusts offsets
    word_of = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    removed = np.bincount(word_of[sel + 1], minlength=len(offsets) - 1)
    new_offsets = offsets.copy()
    new_offsets[1:] = offsets[1:] - np.cumsum(removed)
    return new_flat, new_offsets


def _list_pieces(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.values.to_pylist(), dtype=object)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # offsets of a sliced array may not start at 0
    if offsets[0] != 0:
        flat = flat[offsets[0]:offsets[-1]]
        offsets = offsets - offsets[0]
    return flat, offsets


def _symbol_table(flat: np.ndarray, offsets: np.ndarray,
                  freq: np.ndarray) -> pa.Table:
    return pa.table({
        "syms": pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(flat.tolist(), pa.string())),
        "freq": pa.array(freq, pa.int64()),
    })


# ------------------------------------------------------------- operator

def word_frequencies(ds, *, text_col: str = "text"):
    """DISTINCT (word, freq) over the corpus — one pass, combiner partials,
    one small groupby (the engine tokenizer; vocab_topk's shape minus the
    top-k cut)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch[text_col],
                                      pa.scalar("", pa.string()))),
            pattern="[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("", pa.string())))
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("word").aggregate(Sum("n", alias_name="freq")))


def _train_local(flat: np.ndarray, offsets: np.ndarray, freq: np.ndarray,
                 n_merges: int) -> list[tuple[int, str, str, int]]:
    """The whole merge loop over one in-memory symbol table — the SAME
    vectorized kernels as the distributed loop, zero shuffles. Used by the
    single-worker fast path; also the parity bridge the tests exercise."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts = _pair_counts(flat, offsets, freq)
        if counts.num_rows == 0:
            break
        idx = pc.sort_indices(counts, sort_keys=[("n", "descending"),
                                                 ("left", "ascending"),
                                                 ("right", "ascending")])
        best = counts.take(idx[:1])
        l = best["left"][0].as_py()
        r = best["right"][0].as_py()
        merges.append((rank, l, r, int(best["n"][0].as_py())))
        flat, offsets = _apply_merge(flat, offsets, l, r)
    return merges


def train_bpe(ds, *, n_merges: int, text_col: str = "text",
              local_vocab_limit: int = 1_000_000):
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    table as a pyarrow Table (rank:int64, left, right, n:int64) — the model
    artifact is driver-sized (K rows) by definition.

    Scale-adaptive (the minhash-verify precedent): the corpus-sized work is
    always the ONE distributed word-count pass; the merge loop's input is
    the distinct-word table. When that vocabulary is ≤ ``local_vocab_limit``
    rows (~50 MB at 1M words — any realistic natural-language corpus after
    the tokenizer), the K-iteration loop runs inside a SINGLE Ray worker
    task with the same vectorized kernels — zero per-iteration shuffles
    (measured: the distributed loop is pure fixed shuffle overhead,
    ~1.3 s/iteration, on vocabularies this small). Above the limit the
    distributed loop runs: per-iteration coarse pair fold + streaming merge
    application, shuffling only distinct pairs."""
    import ray

    words = word_frequencies(ds, text_col=text_col)

    def symbolize(batch: pa.Table) -> pa.Table:
        ws = batch["word"].to_pylist()
        freq = batch["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        syms = [list(w) + [END_WORD] for w in ws]
        lens = np.asarray([len(s) for s in syms], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        flat = np.asarray([s for ss in syms for s in ss], dtype=object)
        return _symbol_table(flat, offsets, freq)

    table = words.map_batches(symbolize, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    n_words = table.count()

    if n_words <= local_vocab_limit:
        @ray.remote
        def _local(refs):
            # refs arrive unresolved (nested in a list) — zero-copy plasma
            # reads inside the worker
            tbls = [t for t in ray.get(refs) if t.num_rows]
            if not tbls:
                return []
            whole = pa.concat_tables(tbls, promote_options="default")
            flat, offsets = _list_pieces(whole["syms"])
            freq = whole["freq"].to_numpy(zero_copy_only=False)
            return _train_local(flat, offsets, freq, n_merges)

        merges = ray.get(_local.remote(list(table.to_arrow_refs())))
        return pa.table({
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        })

    # block discipline (cf. stages/graph.py _bounded): the word groupby's
    # default output grain would ride every one of the K iteration shuffles
    if table.num_blocks() > _N_PARTS:
        table = table.repartition(_N_PARTS).materialize()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        def count_batch(batch: pa.Table) -> pa.Table:
            flat, offsets = _list_pieces(batch["syms"])
            freq = batch["freq"].to_numpy(zero_copy_only=False)
            return _pair_counts(flat, offsets, freq)

        def fold_top1(part: pa.Table) -> pa.Table:
            """All partials of a pair co-locate via the fused crc32 part key;
            one Arrow C++ hash group_by sums them, then only the partition's
            top-1 candidate travels to the driver. (A native multi-key Sum
            aggregate here measured ~3x the whole-iteration cost — same
            finding as the winnow pair fold.)"""
            empty = pa.table({"left": pa.array([], pa.string()),
                              "right": pa.array([], pa.string()),
                              "n_total": pa.array([], pa.int64())})
            if part.num_rows == 0 or "n" not in part.column_names:
                return empty
            agg = (part.select(["left", "right", "n"])
                   .group_by(["left", "right"]).aggregate([("n", "sum")]))
            t = pa.table({"left": agg["left"], "right": agg["right"],
                          "n_total": pc.cast(agg["n_sum"], pa.int64())})
            idx = pc.sort_indices(t, sort_keys=[("n_total", "descending"),
                                                ("left", "ascending"),
                                                ("right", "ascending")])
            return t.take(idx[:1])

        partials = (table.map_batches(count_batch, batch_format="pyarrow",
                                      zero_copy_batch=True)
                    .groupby("part").map_groups(fold_top1,
                                                batch_format="pyarrow")
                    .take_all())
        if not partials:
            break
        best = min(partials, key=lambda r: (-r["n_total"], r["left"],
                                            r["right"]))
        l, r, n = best["left"], best["right"], int(best["n_total"])
        merges.append((rank, l, r, n))

        def apply_batch(batch: pa.Table, l=l, r=r) -> pa.Table:
            flat, offsets = _list_pieces(batch["syms"])
            freq = batch["freq"].to_numpy(zero_copy_only=False)
            nf, no = _apply_merge(flat, offsets, l, r)
            return _symbol_table(nf, no, freq)

        table = table.map_batches(apply_batch, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "n": pa.array([m[3] for m in merges], pa.int64()),
    })


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge table to one word — chars + '</w>' then each
    merge in RANK ORDER with the same left-to-right non-overlap rule as
    training (so encoding the training corpus reproduces the training
    end-state exactly; pinned by test)."""
    syms = np.asarray(list(word) + [END_WORD], dtype=object)
    offsets = np.asarray([0, len(syms)], dtype=np.int64)
    for l, r in merges:
        syms, offsets = _apply_merge(syms, offsets, l, r)
        if len(syms) == 1:
            break
    return syms.tolist()


class BpeEncoder:
    """Stateful encode stage (actor-pool pattern): the merge table ships
    once per actor via __init__; a per-instance word cache makes the cost
    O(distinct words) per actor rather than O(tokens). Emits per-doc token
    and subword counts plus the space-joined subword string (the training
    product a packer consumes)."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self._merges = list(merges)
        self._cache: dict[str, list[str]] = {}
        self._text_col = text_col
        self._id_col = id_col

    def _encode(self, word: str) -> list[str]:
        got = self._cache.get(word)
        if got is None:
            got = encode_word(word, self._merges)
            self._cache[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        tok_re = re.compile(r"[a-z0-9]+")
        n_tok, n_sub, joined = [], [], []
        for t in batch[self._text_col].to_pylist():
            words = tok_re.findall((t or "").lower())
            subs: list[str] = []
            for w in words:
                subs.extend(self._encode(w))
            n_tok.append(len(words))
            n_sub.append(len(subs))
            joined.append(" ".join(subs))
        return pa.table({
            self._id_col: batch[self._id_col],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_subwords": pa.array(n_sub, pa.int64()),
            "subwords": pa.array(joined, pa.string()),
        })


def encode_corpus(ds, merges, *, text_col: str = "text",
                  id_col: str = "doc_id", concurrency=None):
    """(doc_id, n_tokens, n_subwords, subwords) per document — the ENCODE
    side of BPE as an actor-pool map_batches stage (merge table + word
    cache are per-actor warm state; the corpus streams through once)."""
    merges_list = [(l, r) for l, r in merges]
    kwargs = {"fn_constructor_args": (merges_list, text_col, id_col),
              "batch_format": "pyarrow", "zero_copy_batch": True}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    else:
        kwargs["concurrency"] = (1, 4)
    return ds.map_batches(BpeEncoder, **kwargs)
