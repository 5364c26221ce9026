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


def c4_filter(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_lines, n_kept, n_sentences, ok_* × 4, keep, clean_text)
    per document — stateless map; ``keep`` is the AND-fold of the page
    rules, ``clean_text`` the line-rule survivors joined by newline."""

    def f(batch: pa.Table) -> pa.Table:
        rows = [doc_c4(t) for t in batch[text_col].to_pylist()]
        cols: dict = {id_col: batch[id_col]}
        for name in ("n_lines", "n_kept", "n_sentences"):
            cols[name] = pa.array(
                np.asarray([r[name] for r in rows], dtype=np.int64))
        keep = np.ones(len(rows), dtype=np.int64)
        for name in FLAG_COLS:
            v = np.asarray([r[name] for r in rows], dtype=np.int64)
            keep &= v
            cols[name] = pa.array(v)
        cols["keep"] = pa.array(keep)
        cols["clean_text"] = pa.array(
            [r["clean_text"] for r in rows], pa.string())
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
