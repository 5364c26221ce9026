"""C4 cleaning heuristics (Raffel et al. 2020, §2.2 "Colossal Clean Crawled
Corpus") — the line-level + page-level rule family every English web corpus
applies between extraction and dedup, completing the engine's quality-filter
set (Gopher rule table: stages/gopher.py; RefinedWeb URL rules:
stages/urlfilter.py; CCNet LM mix: stages/lm_quality.py).

Published rule set, pinned exactly:

  line rules (a line survives iff ALL hold):
    * ends in a terminal punctuation mark — ``.``, ``!``, ``?`` or a closing
      double quote ``"`` (the paper's "period, exclamation mark, question
      mark, or end quotation mark");
    * contains ≥ ``LINE_MIN_WORDS`` words;
    * its lowercase form contains NONE of ``POLICY_SUBSTRINGS`` (the paper's
      "javascript" line rule plus the cookie/policy boilerplate strings the
      released C4 code filters).
  page rules (the whole document is dropped iff ANY fires):
    * lowercase text contains the phrase ``lorem ipsum``;
    * text contains a curly brace ``{``;
    * any word is in ``BLOCK_WORDS`` (a pinned PLACEHOLDER for the paper's
      external "bad words" blocklist — the real list is a drop-in constant,
      the membership semantics are what's tested);
    * fewer than ``PAGE_MIN_SENTENCES`` sentences survive the line rules.

Pinned vocabulary (engine-wide contracts, same as stages/gopher.py):
  * words = ``[a-z0-9]+`` runs over ``lower(s)``;
  * lines = non-empty segments of ``text.split('\\n')``;
  * sentences = occurrences of ``.``/``!``/``?`` characters in the CLEANED
    text (the kept lines joined by ``\\n``) — a deterministic stand-in for a
    sentence splitter, exact on both sides;
  * all flags are int64 0/1 and ``clean_text`` is emitted verbatim, so the
    generated DuckDB twin (``c4_sql``) is value-hash-strict including the
    cleaned string bytes.

Shape: stateless per-batch ``map_batches`` — zero shuffles, the same cost
class as gopher_filter/repetition_stats; at 100 TB this stage is pure
map-side streaming compute. Reference anchor: the reference's per-document
validation gate producing error rows
(`apps/legacy/src/services/fileProcessor.ts:22-44`) is this stage's
single-document ancestor.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# ------------------------------------------------------------- constants
# (rendered verbatim into c4_sql — single source of truth)

TERMINAL_SUFFIXES = (".", "!", "?", '"')
LINE_MIN_WORDS = 5
PAGE_MIN_SENTENCES = 3
POLICY_SUBSTRINGS = ("javascript", "cookie", "privacy policy", "terms of use")
LOREM_PHRASE = "lorem ipsum"
BRACE = "{"
# Placeholder seam for the external blocklist (the paper uses the public
# "List of Dirty, Naughty, Obscene..." file; this container has no network).
# Swap the tuple for the real list in production — membership is word-exact.
BLOCK_WORDS = ("unsafeword0", "unsafeword1")

TOKEN_PATTERN = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)
_SENTENCE_CHARS = (".", "!", "?")

FLAG_COLS = ("ok_lorem", "ok_brace", "ok_badwords", "ok_sentences")


def line_kept(line: str) -> bool:
    """The C4 line rule — module-level so tests can drive boundaries."""
    if not line.endswith(TERMINAL_SUFFIXES):
        return False
    low = line.lower()
    if any(s in low for s in POLICY_SUBSTRINGS):
        return False
    return len(_TOKEN_RE.findall(low)) >= LINE_MIN_WORDS


def doc_c4(text: str) -> dict:
    """All page flags + the cleaned text for one document — the reference
    kernel and the per-row body of the batch map."""
    text = text or ""
    low = text.lower()
    lines = [ln for ln in text.split("\n") if ln]
    kept = [ln for ln in lines if line_kept(ln)]
    clean = "\n".join(kept)
    n_sentences = sum(clean.count(c) for c in _SENTENCE_CHARS)
    ok_bad = int(not frozenset(BLOCK_WORDS).intersection(
        _TOKEN_RE.findall(low)))
    flags = {
        "ok_lorem": int(LOREM_PHRASE not in low),
        "ok_brace": int(BRACE not in text),
        "ok_badwords": ok_bad,
        "ok_sentences": int(n_sentences >= PAGE_MIN_SENTENCES),
    }
    return {
        "n_lines": len(lines),
        "n_kept": len(kept),
        "n_sentences": n_sentences,
        **flags,
        "keep": int(all(flags.values())),
        "clean_text": clean,
    }


def c4_batch(texts) -> dict:
    """Vectorized twin of ``doc_c4`` over a whole Arrow string array —
    same fields (counters/flags as int64 ndarrays, ``clean_text`` as an
    Arrow string array), parity pinned by tests/test_c4.py.

    Shape: ONE literal line split (of the lowered text too — lowercasing
    never maps any char to or from U+000A, so the two splits align
    element-for-element); the line rules run as Arrow kernels over the
    flattened lines (ends_with × 4 suffixes, one RE2 policy alternation,
    a byte-level numpy run counter for the word minimum — measured 2×
    the count_substring_regex kernel); ``clean_text`` is rebuilt
    zero-copy from the kept flat lines via ListArray.from_arrays +
    binary_join; the badword test is one boundary-anchored RE2
    alternation over the whole lowered doc (``(^|[^a-z0-9])w([^a-z0-9]|$)``
    == token membership under the [a-z0-9]+ tokenizer — boundaries may
    overlap between adjacent hits, but existence, not count, is what the
    flag needs)."""
    import pyarrow.compute as pc

    from janet_ray.functions.arrays import (ascii_alnum_run_counts,
                                            list_parents)

    n = len(texts)
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # Python str.lower, NOT pc.utf8_lower — see stages/gopher.py: the engine-
    # wide tokenizer contract is Python full case mapping, and Arrow's simple
    # mapping diverges on special-casing chars (İ), flipping line keep/drop
    # decisions vs the per-row reference kernel.
    low = pa.array([t.lower() for t in texts.to_pylist()], pa.string())

    lsplit = pc.split_pattern(texts, "\n")
    if isinstance(lsplit, pa.ChunkedArray):
        lsplit = lsplit.combine_chunks()
    lflat = lsplit.flatten()
    lp = list_parents(lsplit.offsets.to_numpy(zero_copy_only=False))
    llen = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
    lne = llen > 0
    n_lines = np.bincount(lp[lne], minlength=n)

    lowl = pc.split_pattern(low, "\n")
    if isinstance(lowl, pa.ChunkedArray):
        lowl = lowl.combine_chunks()
    lowl = lowl.flatten()
    term = pc.ends_with(lflat, TERMINAL_SUFFIXES[0])
    for s in TERMINAL_SUFFIXES[1:]:
        term = pc.or_(term, pc.ends_with(lflat, s))
    policy = pc.match_substring_regex(
        lowl, "|".join(re.escape(s) for s in POLICY_SUBSTRINGS))
    kept = (term.to_numpy(zero_copy_only=False)
            & ~policy.to_numpy(zero_copy_only=False)
            & (ascii_alnum_run_counts(lowl) >= LINE_MIN_WORDS) & lne)
    n_kept = np.bincount(lp[kept], minlength=n)

    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(n_kept, out=offsets[1:])
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                 lflat.filter(pa.array(kept))),
        OUT_SEP)
    n_sentences = np.zeros(n, dtype=np.int64)
    for c in _SENTENCE_CHARS:
        n_sentences += pc.count_substring(clean, c).to_numpy(
            zero_copy_only=False)

    badpat = "(^|[^a-z0-9])(%s)([^a-z0-9]|$)" % "|".join(
        re.escape(w) for w in BLOCK_WORDS)
    ok_bad = ~pc.match_substring_regex(low, badpat).to_numpy(
        zero_copy_only=False)

    flags = {
        "ok_lorem": ~pc.match_substring(low, LOREM_PHRASE).to_numpy(
            zero_copy_only=False),
        "ok_brace": ~pc.match_substring(texts, BRACE).to_numpy(
            zero_copy_only=False),
        "ok_badwords": ok_bad,
        "ok_sentences": n_sentences >= PAGE_MIN_SENTENCES,
    }
    out = {"n_lines": n_lines, "n_kept": n_kept, "n_sentences": n_sentences}
    keep = np.ones(n, dtype=bool)
    for name in FLAG_COLS:
        keep &= flags[name]
        out[name] = flags[name].astype(np.int64)
    out["keep"] = keep.astype(np.int64)
    out["clean_text"] = clean
    return out


def c4_filter(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_lines, n_kept, n_sentences, ok_* × 4, keep, clean_text)
    per document — stateless map; ``keep`` is the AND-fold of the page
    rules, ``clean_text`` the line-rule survivors joined by newline.
    Batch body is the vectorized kernel; ``doc_c4`` stays as the
    parity-pinned per-row reference."""

    def f(batch: pa.Table) -> pa.Table:
        r = c4_batch(batch[text_col])
        cols: dict = {id_col: batch[id_col]}
        for name in ("n_lines", "n_kept", "n_sentences"):
            cols[name] = pa.array(r[name].astype(np.int64))
        for name in FLAG_COLS:
            cols[name] = pa.array(r[name])
        cols["keep"] = pa.array(r["keep"])
        cols["clean_text"] = r["clean_text"]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def c4_sql(*, source: str = "documents", text_expr: str = "text",
           id_col: str = "doc_id") -> str:
    """DuckDB replay from the same constants: same non-empty-line split, same
    terminal-suffix set, same ``[a-z0-9]+`` word count, same substring
    policy rules, same single-char sentence counting (str.count ==
    replace-length arithmetic for single characters)."""
    terminal = " OR ".join(
        f"ends_with(l, '{s}')" for s in TERMINAL_SUFFIXES)
    policy = " AND ".join(
        f"NOT contains(lower(l), '{s}')" for s in POLICY_SUBSTRINGS)
    badwords = ", ".join(f"'{w}'" for w in BLOCK_WORDS)
    sent = " + ".join(
        f"(length(clean_text) - length(replace(clean_text, '{c}', '')))"
        for c in _SENTENCE_CHARS)
    flags = {
        "ok_lorem": f"NOT contains(lower(ctext), '{LOREM_PHRASE}')",
        "ok_brace": "NOT contains(ctext, chr(123))",
        "ok_badwords": (
            f"len(list_filter(regexp_extract_all(lower(ctext), "
            f"'{TOKEN_PATTERN}'), x -> x IN ({badwords}))) = 0"),
        "ok_sentences": f"n_sentences >= {PAGE_MIN_SENTENCES}",
    }
    flag_cols = ",\n       ".join(
        f"CAST({expr} AS BIGINT) AS {name}" for name, expr in flags.items())
    keep_expr = " AND ".join(f"({expr})" for expr in flags.values())
    return f"""
WITH csrc AS (
  SELECT {id_col} AS doc_id, {text_expr} AS ctext FROM {source}
), cbase AS (
  SELECT doc_id, ctext,
         list_filter(string_split(ctext, chr(10)),
                     l -> length(l) > 0) AS lines
  FROM csrc
), ckept AS (
  SELECT doc_id, ctext, lines,
         list_filter(lines, l ->
             ({terminal})
             AND len(regexp_extract_all(lower(l), '{TOKEN_PATTERN}'))
                 >= {LINE_MIN_WORDS}
             AND {policy}) AS keptl
  FROM cbase
), cagg AS (
  SELECT doc_id, ctext, lines, keptl,
         -- DuckDB array_to_string of an empty list is NULL; Python join is ''
         COALESCE(array_to_string(keptl, chr(10)), '') AS clean_text
  FROM ckept
), csent AS (
  SELECT *, CAST({sent} AS BIGINT) AS n_sentences FROM cagg
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(keptl) AS BIGINT) AS n_kept,
       n_sentences,
       {flag_cols},
       CAST({keep_expr} AS BIGINT) AS keep,
       clean_text
FROM csent
"""


# ----------------------------------------------- three-sentence-span dedup
# The OTHER C4 §2.2 rule: "we discarded all but one of any three-sentence
# span occurring more than once in the data set." Sibling of the CCNet
# paragraph dedup (stages/paradedup.py) at sentence-window granularity;
# reuses its decision kernel (_drop_rows) and its shuffle discipline.
#
# Pinned semantics (replayed exactly by span_dedup_sql):
#   * sentences = non-empty ``strip(' ')``-ed segments of
#     ``re.split('[.!?]', text)`` — a deterministic splitter both engines
#     evaluate identically (no lookarounds: RE2-safe);
#   * spans = ALL overlapping windows of N_SPAN consecutive sentences,
#     keyed by the exact sentence triple (joined with chr(31));
#   * global first-occurrence rule: the (doc_id, start) minimum occurrence
#     of a span keeps; every other occurrence marks its N_SPAN covered
#     sentence slots for removal (marks union across overlapping spans);
#   * output text = surviving sentences re-joined with chr(10) plus
#     (n_sentences, n_dropped) counters.
#
# Shape: span rows are narrow ints (part, h64, doc_id, start) — sentence
# TEXT never enters the decision shuffle; ONE coarse groupby co-locates
# span-hash runs; only DROP rows come back (∝ dup rate); the apply is
# scale-adaptive exactly like paradedup (broadcast ≤ limit, else a
# cogroup-via-union on a coarse doc hash — the corpus moves once). Same
# 63-bit md5 collision trade as paradedup; the oracle groups by span TEXT,
# so an engine hash collision fails the gate instead of hiding.

N_SPAN = 3
SENT_SPLIT_PATTERN = "[.!?]"
_SENT_SPLIT_RE = re.compile(SENT_SPLIT_PATTERN)
SPAN_SEP = "\x1f"
OUT_SEP = "\n"


def split_sentences(text: str) -> list:
    return [s for s in (x.strip(" ")
                        for x in _SENT_SPLIT_RE.split(text or "")) if s]


def span_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
               n: int = N_SPAN, n_parts: int = 64,
               broadcast_limit: int = 5_000_000):
    """(doc_id, n_sentences, n_dropped, text) with corpus-wide duplicated
    n-sentence spans removed under the global first-occurrence rule."""
    import ray

    from janet_ray.stages.paradedup import _drop_rows, _h64

    def explode(batch: pa.Table) -> pa.Table:
        ids, starts, spans = [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            sents = split_sentences(t)
            for j in range(len(sents) - n + 1):
                ids.append(i)
                starts.append(j)
                spans.append(SPAN_SEP.join(sents[j:j + n]))
        h = _h64(spans)
        return pa.table({
            "part": pa.array((h % n_parts).astype(np.int32)),
            "h": pa.array(h),
            "doc_id": pa.array(ids, batch[id_col].type),
            "idx": pa.array(np.asarray(starts, dtype=np.int64)),
        })

    drops = (ds.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("part").map_groups(_drop_rows, batch_format="pyarrow")
             .materialize())

    def _rewrite_rows(ids, texts, bad_starts):
        """Shared apply kernel: bad_starts maps doc id -> drop starts."""
        out_t, out_s, out_d = [], [], []
        for i, t in zip(ids, texts):
            sents = split_sentences(t)
            out_s.append(len(sents))
            starts = bad_starts(i)
            if not starts:
                out_t.append(OUT_SEP.join(sents))
                out_d.append(0)
                continue
            bad = set()
            for s0 in starts:
                bad.update(range(s0, s0 + n))
            kept = [p for j, p in enumerate(sents) if j not in bad]
            out_t.append(OUT_SEP.join(kept))
            out_d.append(len(sents) - len(kept))
        return out_t, out_s, out_d

    def _out_table(id_arr, out_t, out_s, out_d):
        return pa.table({
            id_col: id_arr,
            "n_sentences": pa.array(np.asarray(out_s, dtype=np.int64)),
            "n_dropped": pa.array(np.asarray(out_d, dtype=np.int64)),
            text_col: pa.array(out_t, pa.string()),
        })

    if drops.count() <= broadcast_limit:
        tbls = [b for b in drops.iter_batches(batch_size=None,
                                              batch_format="pyarrow")]
        drop_tbl = (pa.concat_tables(tbls) if tbls
                    else pa.table({"doc_id": pa.array([], pa.int64()),
                                   "idx": pa.array([], pa.int64())}))
        doc_a = drop_tbl["doc_id"].to_numpy(zero_copy_only=False)
        idx_a = drop_tbl["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idx_a, doc_a))
        ref = ray.put({"doc": doc_a[order], "idx": idx_a[order]})

        def rewrite(batch: pa.Table) -> pa.Table:
            dset = ray.get(ref)
            dd, dx = dset["doc"], dset["idx"]

            def bad_starts(i):
                lo = np.searchsorted(dd, i, "left")
                hi = np.searchsorted(dd, i, "right")
                return dx[lo:hi].tolist()

            ids = batch[id_col].to_pylist()
            out_t, out_s, out_d = _rewrite_rows(
                ids, batch[text_col].to_pylist(), bad_starts)
            return _out_table(batch[id_col], out_t, out_s, out_d)

        return ds.map_batches(rewrite, batch_format="pyarrow",
                              zero_copy_batch=True)

    # large drop set → cogroup-via-union on a coarse doc hash (paradedup's
    # scale path; doc ids here are whatever the corpus carries)
    from janet_ray.stages.paradedup import _doc_part_kernel

    def tag_corpus(batch: pa.Table) -> pa.Table:
        return pa.table({
            "part": _doc_part_kernel(batch[id_col], n_parts),
            "doc_id": batch[id_col],
            "idx": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
            "text": batch[text_col],
        })

    def tag_drops(batch: pa.Table) -> pa.Table:
        return pa.table({
            "part": _doc_part_kernel(batch["doc_id"], n_parts),
            "doc_id": batch["doc_id"],
            "idx": batch["idx"],
            "text": pa.array([None] * batch.num_rows, pa.string()),
        })

    unioned = (ds.map_batches(tag_corpus, batch_format="pyarrow",
                              zero_copy_batch=True)
               .union(drops.map_batches(tag_drops, batch_format="pyarrow",
                                        zero_copy_batch=True)))

    def rewrite_part(part: pa.Table) -> pa.Table:
        id_type = (part["doc_id"].type if "doc_id" in part.column_names
                   else pa.int64())
        if part.num_rows == 0 or "idx" not in part.column_names:
            return _out_table(pa.array([], id_type), [], [], [])
        idx = part["idx"].to_numpy(zero_copy_only=False)
        docs = part.filter(pa.array(idx == -1))
        dr = part.filter(pa.array(idx != -1))
        by_doc: dict = {}
        for i, j in zip(dr["doc_id"].to_pylist(), dr["idx"].to_pylist()):
            by_doc.setdefault(i, []).append(j)
        ids = docs["doc_id"].to_pylist()
        out_t, out_s, out_d = _rewrite_rows(
            ids, docs["text"].to_pylist(), lambda i: by_doc.get(i, ()))
        return _out_table(pa.array(ids, id_type), out_t, out_s, out_d)

    return unioned.groupby("part").map_groups(rewrite_part,
                                              batch_format="pyarrow")


def span_dedup_sql(*, source: str = "documents", text_expr: str = "text",
                   id_col: str = "doc_id", n: int = N_SPAN) -> str:
    """DuckDB replay of the same rule, grouping by the SPAN TEXT itself
    (hash-free). Same splitter, same trim, same first-occurrence order,
    same overlapping-window drop expansion, same chr(10) re-join."""
    span_text = " || chr(31) || ".join(
        "sentence" if k == 0 else f"lead(sentence, {k}) OVER w"
        for k in range(n))
    return f"""
WITH ssrc AS (
  SELECT {id_col} AS doc_id, {text_expr} AS ctext FROM {source}
), sentlists AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_split_to_array(ctext, '{SENT_SPLIT_PATTERN}'),
             x -> trim(x, ' ')), x -> length(x) > 0) AS s
  FROM ssrc
), sents AS (
  SELECT doc_id, i - 1 AS idx, s[i] AS sentence
  FROM sentlists, UNNEST(range(1, len(s) + 1)) AS t(i)
), spans AS (
  SELECT doc_id, idx AS start,
         {span_text} AS span_text,
         lead(sentence, {n - 1}) OVER w IS NOT NULL AS whole
  FROM sents WINDOW w AS (PARTITION BY doc_id ORDER BY idx)
), marked AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY span_text
                            ORDER BY doc_id, start) AS rn
  FROM spans WHERE whole
), dropped AS (
  SELECT DISTINCT doc_id, start + o AS idx
  FROM marked, UNNEST(range(0, {n})) AS t(o)
  WHERE rn > 1
)
SELECT c.doc_id,
       CAST(count(s.idx) AS BIGINT) AS n_sentences,
       CAST(count(d.idx) AS BIGINT) AS n_dropped,
       COALESCE(string_agg(s.sentence, chr(10) ORDER BY s.idx)
                FILTER (WHERE s.idx IS NOT NULL AND d.idx IS NULL),
                '') AS text
FROM ssrc c
LEFT JOIN sents s ON s.doc_id = c.doc_id
LEFT JOIN dropped d ON d.doc_id = s.doc_id AND d.idx = s.idx
GROUP BY c.doc_id
"""
