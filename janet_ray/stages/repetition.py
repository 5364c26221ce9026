"""Repetition statistics for training-data quality filtering — the
Gopher / MassiveText family of repetition signals (Rae et al. 2021, §A1.1:
duplicate-line fraction, duplicate-line character fraction, top n-gram
character fraction), computed per document with PINNED semantics so a DuckDB
oracle can replay them exactly (``repetition_sql``, generated from the same
constants — the textstats.py parity-by-construction pattern).

Pinned definitions (exact, not the paper's prose):

  * lines         = non-empty segments of ``text.split('\\n')`` (no trim);
  * dup_line_frac = (n_lines − n_distinct_lines) / n_lines, 0.0 when no lines;
  * dup_line_char_frac = (Σ len(line) over ALL lines − Σ len(line) over the
    DISTINCT line set) / Σ len(line) over all lines — i.e. characters in the
    2nd..kth occurrences of each repeated line;
  * tokens        = ``[a-z0-9]+`` runs over ``lower(text)`` (the engine-wide
    tokenizer contract shared with winnow.py / lm_quality.py);
  * top n-gram    = the most frequent space-joined token n-gram (n = NGRAM_N),
    ties broken by the lexicographically SMALLEST gram (ASCII alphabet, so
    Python code-point order == DuckDB binary collation);
  * top_2gram_char_frac = count(top) · len(top) / len(' '.join(tokens)),
    0.0 with < n tokens. Overlapping occurrences can push this above 1.0 —
    this is the paper's count·len form, not a character-coverage measure;
  * every ratio is ONE IEEE-double division of exact integer counts.

All work is per-document inside a stateless ``map_batches`` body — the same
shape (and cost class) as the winnowing fingerprinter; there is no shuffle.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

NGRAM_N = 2
TOKEN_PATTERN = "[a-z0-9]+"   # rendered verbatim into the SQL twin

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def doc_repetition(text: str) -> tuple[int, float, float, float]:
    """(n_lines, dup_line_frac, dup_line_char_frac, top_ngram_char_frac)."""
    lines = [ln for ln in (text or "").split("\n") if ln]
    n_lines = len(lines)
    if n_lines:
        total_chars = sum(len(ln) for ln in lines)
        distinct = set(lines)
        distinct_chars = sum(len(ln) for ln in distinct)
        dup_line_frac = (n_lines - len(distinct)) / n_lines
        dup_line_char_frac = ((total_chars - distinct_chars) / total_chars
                              if total_chars else 0.0)
    else:
        dup_line_frac = dup_line_char_frac = 0.0

    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) >= NGRAM_N:
        grams = Counter(" ".join(toks[i:i + NGRAM_N])
                        for i in range(len(toks) - NGRAM_N + 1))
        best_c = max(grams.values())
        best_g = min(g for g, c in grams.items() if c == best_c)
        tchars = len(" ".join(toks))
        top_frac = best_c * len(best_g) / tchars if tchars else 0.0
    else:
        top_frac = 0.0
    return n_lines, dup_line_frac, dup_line_char_frac, top_frac


def add_repetition_stats(batch: pa.Table, *, text_col: str = "text"
                         ) -> pa.Table:
    """Append the four repetition columns to a pyarrow batch."""
    n_lines: list[int] = []
    dlf: list[float] = []
    dlcf: list[float] = []
    tgf: list[float] = []
    for t in batch[text_col].to_pylist():
        a, b, c, d = doc_repetition(t)
        n_lines.append(a)
        dlf.append(b)
        dlcf.append(c)
        tgf.append(d)
    return (batch
            .append_column("n_lines", pa.array(n_lines, pa.int64()))
            .append_column("dup_line_frac", pa.array(dlf, pa.float64()))
            .append_column("dup_line_char_frac", pa.array(dlcf, pa.float64()))
            .append_column("top_2gram_char_frac", pa.array(tgf, pa.float64())))


def repetition_stats(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_2gram_char_frac) for every document — stateless per-batch map."""

    def f(batch: pa.Table) -> pa.Table:
        out = add_repetition_stats(batch, text_col=text_col)
        return out.select([id_col, "n_lines", "dup_line_frac",
                           "dup_line_char_frac", "top_2gram_char_frac"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def repetition_sql(*, source: str = "documents", text_expr: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB replay of repetition_stats from the same constants: lines by
    chr(10) split with empties filtered, token grams by the winnow_sql list
    slicing pattern, the same tie-break (ORDER BY c DESC, g ASC), the same
    single-division ratios."""
    n = NGRAM_N
    gram_expr = f"array_to_string(ts[i:i+{n - 1}], ' ')"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split({text_expr}, chr(10)),
                     l -> length(l) > 0) AS lines,
         regexp_extract_all(lower({text_expr}), '{TOKEN_PATTERN}') AS ts
  FROM {source}
), lrows AS (
  SELECT doc_id, x AS line FROM base, UNNEST(lines) AS t(x)
), lagg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(DISTINCT line) AS BIGINT) AS n_distinct,
         CAST(sum(length(line)) AS BIGINT) AS total_chars
  FROM lrows GROUP BY doc_id
), ldist AS (
  SELECT doc_id, CAST(sum(length(line)) AS BIGINT) AS distinct_chars
  FROM (SELECT DISTINCT doc_id, line FROM lrows) GROUP BY doc_id
), gtop AS (
  SELECT doc_id, g, c FROM (
    SELECT doc_id, {gram_expr} AS g, CAST(count(*) AS BIGINT) AS c
    FROM base, UNNEST(range(1, len(ts) - {n} + 2)) AS t(i)
    WHERE len(ts) >= {n}
    GROUP BY doc_id, {gram_expr}
  ) QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY c DESC, g ASC) = 1
), tok AS (
  SELECT doc_id,
         CASE WHEN len(ts) = 0 THEN 0
              ELSE length(array_to_string(ts, ' ')) END AS tchars
  FROM base
)
SELECT b.doc_id,
       COALESCE(l.n_lines, 0) AS n_lines,
       CASE WHEN COALESCE(l.n_lines, 0) = 0 THEN 0.0
            ELSE CAST(l.n_lines - l.n_distinct AS DOUBLE) / l.n_lines
       END AS dup_line_frac,
       CASE WHEN COALESCE(l.total_chars, 0) = 0 THEN 0.0
            ELSE CAST(l.total_chars - d.distinct_chars AS DOUBLE)
                 / l.total_chars
       END AS dup_line_char_frac,
       CASE WHEN g.c IS NULL OR t.tchars = 0 THEN 0.0
            ELSE CAST(g.c * length(g.g) AS DOUBLE) / t.tchars
       END AS top_2gram_char_frac
FROM base b
LEFT JOIN lagg l USING (doc_id)
LEFT JOIN ldist d USING (doc_id)
LEFT JOIN gtop g USING (doc_id)
LEFT JOIN tok t USING (doc_id)
"""
