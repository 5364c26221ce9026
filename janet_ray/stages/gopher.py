"""Gopher quality-rule filter (Rae et al. 2021, §A1.1 "MassiveText filters")
— the composed rule set every web-scale corpus pipeline applies after
extraction: document length bounds, mean-word-length bounds, symbol and
bullet/ellipsis line ratios, alpha-word coverage, a required-stopword
presence test, and the three repetition gates (duplicate lines / duplicate
line characters / top-2-gram characters, semantics pinned by
stages/repetition.py).

Every rule decision is EXACT-INTEGER — ratio thresholds are cross-multiplied
(``10·n_bullet ≤ 9·n_lines`` instead of ``n_bullet/n_lines ≤ 0.9``) so the
DuckDB twin (``gopher_sql``, generated from the SAME constants) is
value-hash-strict with zero float arithmetic anywhere, including the
repetition gates (which reuse repetition.py's pinned line/gram semantics but
compare the raw integer counts, never the derived doubles).

Pinned vocabulary (the engine-wide contracts):

  * words  = ``[a-z0-9]+`` runs over ``lower(text)`` (winnow/classifier/LM);
  * lines  = non-empty segments of ``text.split('\\n')`` (repetition.py);
  * bullet line   = line starting with ``-`` or ``*``;
  * ellipsis line = line ending with ``...``;
  * symbols = ``#`` occurrences + non-overlapping ``...`` occurrences
    (str.count == DuckDB replace-length arithmetic, both left-to-right);
  * required stopwords = the Gopher eight (the/be/to/of/and/that/have/with),
    counted DISTINCT — a doc must contain ≥ 2 different ones.

Shape: stateless per-batch ``map_batches`` — zero shuffles, the same cost
class as repetition_stats. Reference anchor: the reference's quality gate is
a per-document validation filter producing error rows
(`apps/legacy/src/services/fileProcessor.ts:22-44`); this operator is that
stage at training-corpus grain.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

# ------------------------------------------------------------- constants
# (rendered verbatim into gopher_sql — single source of truth)

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3      # 3 ≤ word_chars/n_words ≤ 10, cross-multiplied
MAX_MEAN_WORD_LEN = 10
MAX_SYMBOL_RATIO = (1, 10)         # symbols/n_words ≤ 1/10
MAX_BULLET_RATIO = (9, 10)         # bullet lines/lines ≤ 9/10
MAX_ELLIPSIS_RATIO = (3, 10)       # '...'-ending lines/lines ≤ 3/10
MIN_ALPHA_WORD_RATIO = (4, 5)      # alpha words/words ≥ 4/5
MIN_REQUIRED_STOPWORDS = 2
MAX_DUP_LINE_RATIO = (3, 10)       # (n_lines − n_distinct)/n_lines ≤ 3/10
MAX_DUP_LINE_CHAR_RATIO = (1, 5)   # dup line chars/line chars ≤ 1/5
MAX_TOP2GRAM_CHAR_RATIO = (1, 5)   # count·len(top 2-gram)/token chars ≤ 1/5
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
NGRAM_N = 2                # shares repetition.py's top-n-gram definition

TOKEN_PATTERN = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)
_ALPHA_RE = re.compile("[a-z]")
_REQ_SET = frozenset(REQUIRED_STOPWORDS)

FLAG_COLS = (
    "ok_words", "ok_mean_word_len", "ok_symbol", "ok_bullet", "ok_ellipsis",
    "ok_alpha_words", "ok_stopwords", "ok_dup_lines", "ok_dup_line_chars",
    "ok_top_2gram",
)


def doc_gopher_flags(text: str) -> dict[str, int]:
    """All rule flags (0/1 ints) + n_words for one document — the reference
    kernel and the per-row body of the batch map."""
    text = text or ""
    ws = _TOKEN_RE.findall(text.lower())
    n_words = len(ws)
    word_chars = sum(len(w) for w in ws)
    n_alpha_words = sum(1 for w in ws if _ALPHA_RE.search(w))
    n_req_stop = len(_REQ_SET.intersection(ws))
    n_sym = text.count("#") + text.count("...")

    lines = [ln for ln in text.split("\n") if ln]
    n_lines = len(lines)
    n_bullet = sum(1 for ln in lines if ln.startswith(("-", "*")))
    n_ell = sum(1 for ln in lines if ln.endswith("..."))
    distinct = set(lines)
    n_distinct = len(distinct)
    line_chars = sum(len(ln) for ln in lines)
    distinct_chars = sum(len(ln) for ln in distinct)

    if len(ws) >= NGRAM_N:
        grams = Counter(" ".join(ws[i:i + NGRAM_N])
                        for i in range(len(ws) - NGRAM_N + 1))
        best_c = max(grams.values())
        best_g = min(g for g, c in grams.items() if c == best_c)
        top_chars = best_c * len(best_g)
        tok_chars = len(" ".join(ws))
    else:
        top_chars, tok_chars = 0, 0

    sy_n, sy_d = MAX_SYMBOL_RATIO
    bu_n, bu_d = MAX_BULLET_RATIO
    el_n, el_d = MAX_ELLIPSIS_RATIO
    al_n, al_d = MIN_ALPHA_WORD_RATIO
    dl_n, dl_d = MAX_DUP_LINE_RATIO
    dc_n, dc_d = MAX_DUP_LINE_CHAR_RATIO
    tg_n, tg_d = MAX_TOP2GRAM_CHAR_RATIO
    return {
        "n_words": n_words,
        "ok_words": int(MIN_WORDS <= n_words <= MAX_WORDS),
        "ok_mean_word_len": int(
            n_words > 0
            and MIN_MEAN_WORD_LEN * n_words <= word_chars
            <= MAX_MEAN_WORD_LEN * n_words),
        "ok_symbol": int(sy_d * n_sym <= sy_n * n_words),
        "ok_bullet": int(bu_d * n_bullet <= bu_n * n_lines),
        "ok_ellipsis": int(el_d * n_ell <= el_n * n_lines),
        "ok_alpha_words": int(n_words > 0
                              and al_d * n_alpha_words >= al_n * n_words),
        "ok_stopwords": int(n_req_stop >= MIN_REQUIRED_STOPWORDS),
        "ok_dup_lines": int(dl_d * (n_lines - n_distinct) <= dl_n * n_lines),
        "ok_dup_line_chars": int(dc_d * (line_chars - distinct_chars)
                                 <= dc_n * line_chars),
        "ok_top_2gram": int(tg_d * top_chars <= tg_n * tok_chars
                            or tok_chars == 0),
    }


def gopher_flags_batch(texts) -> dict[str, np.ndarray]:
    """Vectorized twin of ``doc_gopher_flags`` over a whole Arrow string
    array — same columns as int64 ndarrays, parity pinned by
    tests/test_gopher.py (corpus + edges + hypothesis).

    Shape (the measured A/B is in BASELINE.md — ~2.5× the per-row kernel
    single-thread): tokens/lines come from ONE Arrow RE2 split each; every
    per-doc aggregate is a bincount/reduceat over flattened (parent, value)
    arrays; per-doc distinct lines and 2-gram counts are fused-int64-key
    sorts (doc·V²+a·V+b) instead of per-doc Counters; the top-2-gram
    tie-break min(gram string) becomes min(id pair) because token ids are
    lexicographically ranked (functions/arrays.sorted_string_ids) and the
    ' ' joiner sorts below every [a-z0-9] token char."""
    import pyarrow.compute as pc

    from janet_ray.functions.arrays import list_parents, sorted_string_ids

    n = len(texts)
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # Python str.lower, NOT pc.utf8_lower: the engine-wide tokenizer contract
    # lowercases with Python full case mapping (hashvec/winnow/dsir/... and
    # this module's per-row reference kernel), and the two differ on special-
    # casing chars — İ (U+0130) lowers to 'i̇' (i + combining dot, splitting a
    # token at the regex) under Python but to 'i' under Arrow/utf8proc. The
    # C-level per-doc .lower() is not what the vectorization A/B measured.
    low = pa.array([t.lower() for t in texts.to_pylist()], pa.string())

    # words: one RE2 split; empties mark separator-adjacent slots
    toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    p_all = list_parents(toks.offsets.to_numpy(zero_copy_only=False))
    tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    ne = tlen > 0
    p, lens = p_all[ne], tlen[ne]
    ids_all, udict = sorted_string_ids(flat)
    ids = ids_all[ne]
    ulen = pc.utf8_length(udict).to_numpy(zero_copy_only=False).astype(np.int64)
    V = len(udict)

    n_words = np.bincount(p, minlength=n)
    word_chars = np.bincount(p, weights=lens, minlength=n).astype(np.int64)
    ualpha = pc.match_substring_regex(udict, "[a-z]").to_numpy(
        zero_copy_only=False)
    n_alpha = np.bincount(p, weights=ualpha[ids], minlength=n).astype(np.int64)

    n_req = np.zeros(n, dtype=np.int64)
    for ri in pc.index_in(pa.array(list(REQUIRED_STOPWORDS)),
                          udict).to_pylist():
        if ri is not None:
            hit = p[ids == ri]
            if len(hit):
                n_req += np.bincount(hit, minlength=n) > 0

    # symbols: Arrow count_substring is left-to-right non-overlapping,
    # same as str.count
    n_sym = (pc.count_substring(texts, "#").to_numpy(zero_copy_only=False)
             .astype(np.int64)
             + pc.count_substring(texts, "...").to_numpy(
                 zero_copy_only=False).astype(np.int64))

    # lines: literal split; same flatten/parent plumbing
    lsplit = pc.split_pattern(texts, "\n")
    if isinstance(lsplit, pa.ChunkedArray):
        lsplit = lsplit.combine_chunks()
    lflat = lsplit.flatten()
    lp_all = list_parents(lsplit.offsets.to_numpy(zero_copy_only=False))
    llen = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
    lne = llen > 0
    lp, llens = lp_all[lne], llen[lne]
    n_lines = np.bincount(lp, minlength=n)
    line_chars = np.bincount(lp, weights=llens, minlength=n).astype(np.int64)
    bullet = pc.or_(pc.starts_with(lflat, "-"),
                    pc.starts_with(lflat, "*")).to_numpy(zero_copy_only=False)
    n_bullet = np.bincount(lp, weights=bullet[lne],
                           minlength=n).astype(np.int64)
    ell = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
    n_ell = np.bincount(lp, weights=ell[lne], minlength=n).astype(np.int64)

    # per-doc distinct lines: fused (doc, line-id) int64 key, one sort
    lids = sorted_string_ids(lflat)[0][lne]
    L = max(len(lflat), 1)
    lkey = np.sort(lp * L + lids)
    lfirst = np.ones(len(lkey), dtype=bool)
    lfirst[1:] = lkey[1:] != lkey[:-1]
    up, uid = lkey[lfirst] // L, lkey[lfirst] % L
    lid_len = np.zeros(L, dtype=np.int64)
    lid_len[lids] = llens
    n_distinct = np.bincount(up, minlength=n)
    distinct_chars = np.bincount(up, weights=lid_len[uid],
                                 minlength=n).astype(np.int64)

    # top 2-gram: adjacent in-doc token-id pairs, fused-key counted
    top_chars = np.zeros(n, dtype=np.int64)
    tok_chars = np.where(n_words >= NGRAM_N,
                         word_chars + np.maximum(n_words - 1, 0), 0)
    if len(p) > 1 and V > 0:
        a, b, pv = ids[:-1], ids[1:], p[:-1]
        valid = pv == p[1:]
        a, b, pv = a[valid], b[valid], pv[valid]
        if len(pv):
            if float(n) * V * V < 4.0e18:
                key = np.sort((pv * V + a) * V + b)
                gfirst = np.ones(len(key), dtype=bool)
                gfirst[1:] = key[1:] != key[:-1]
                starts = np.flatnonzero(gfirst)
                counts = np.diff(np.append(starts, len(key))).astype(np.int64)
                gk = key[starts]
                gp, ga, gb = gk // (V * V), (gk // V) % V, gk % V
            else:  # fused key would overflow int64: 3-key lexsort fallback
                order = np.lexsort((b, a, pv))
                ps, as_, bs = pv[order], a[order], b[order]
                gfirst = np.ones(len(ps), dtype=bool)
                gfirst[1:] = ((ps[1:] != ps[:-1]) | (as_[1:] != as_[:-1])
                              | (bs[1:] != bs[:-1]))
                starts = np.flatnonzero(gfirst)
                counts = np.diff(np.append(starts, len(ps))).astype(np.int64)
                gp, ga, gb = ps[starts], as_[starts], bs[starts]
            # winner per doc: max count, first tie wins — groups are already
            # gram-ascending within each doc, so first == min gram string
            seg_first = np.ones(len(gp), dtype=bool)
            seg_first[1:] = gp[1:] != gp[:-1]
            seg_starts = np.flatnonzero(seg_first)
            maxc = np.maximum.reduceat(counts, seg_starts)
            per_group = np.repeat(maxc,
                                  np.diff(np.append(seg_starts, len(gp))))
            pos = np.arange(len(gp), dtype=np.int64)
            win = np.minimum.reduceat(
                np.where(counts == per_group, pos, len(gp)), seg_starts)
            docs = gp[seg_starts]
            top_chars[docs] = counts[win] * (ulen[ga[win]] + 1 + ulen[gb[win]])

    sy_n, sy_d = MAX_SYMBOL_RATIO
    bu_n, bu_d = MAX_BULLET_RATIO
    el_n, el_d = MAX_ELLIPSIS_RATIO
    al_n, al_d = MIN_ALPHA_WORD_RATIO
    dl_n, dl_d = MAX_DUP_LINE_RATIO
    dc_n, dc_d = MAX_DUP_LINE_CHAR_RATIO
    tg_n, tg_d = MAX_TOP2GRAM_CHAR_RATIO
    out = {
        "n_words": n_words,
        "ok_words": ((n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)),
        "ok_mean_word_len": ((n_words > 0)
                             & (MIN_MEAN_WORD_LEN * n_words <= word_chars)
                             & (word_chars <= MAX_MEAN_WORD_LEN * n_words)),
        "ok_symbol": sy_d * n_sym <= sy_n * n_words,
        "ok_bullet": bu_d * n_bullet <= bu_n * n_lines,
        "ok_ellipsis": el_d * n_ell <= el_n * n_lines,
        "ok_alpha_words": (n_words > 0) & (al_d * n_alpha >= al_n * n_words),
        "ok_stopwords": n_req >= MIN_REQUIRED_STOPWORDS,
        "ok_dup_lines": dl_d * (n_lines - n_distinct) <= dl_n * n_lines,
        "ok_dup_line_chars": (dc_d * (line_chars - distinct_chars)
                              <= dc_n * line_chars),
        "ok_top_2gram": ((tg_d * top_chars <= tg_n * tok_chars)
                         | (tok_chars == 0)),
    }
    return {k: v.astype(np.int64) for k, v in out.items()}


def gopher_filter(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_words, ok_* × 10, keep) per document — stateless map; keep
    is the AND-fold of every rule (all columns int64 0/1 so the SQL twin is
    dtype-exact). Batch body is the vectorized kernel; ``doc_gopher_flags``
    stays as the parity-pinned per-row reference."""

    def f(batch: pa.Table) -> pa.Table:
        flags = gopher_flags_batch(batch[text_col])
        cols: dict = {id_col: batch[id_col]}
        cols["n_words"] = pa.array(flags["n_words"], pa.int64())
        keep = np.ones(len(batch), dtype=np.int64)
        for name in FLAG_COLS:
            keep &= flags[name]
            cols[name] = pa.array(flags[name], pa.int64())
        cols["keep"] = pa.array(keep, pa.int64())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def gopher_sql(*, source: str = "documents", text_expr: str = "text",
               id_col: str = "doc_id") -> str:
    """DuckDB replay from the same constants: same tokenizer, same line
    split, same non-overlapping '...' count (replace-length arithmetic ==
    str.count, both left-to-right), same top-2-gram tie-break
    (ORDER BY c DESC, g ASC), every threshold the same cross-multiplied
    integer comparison."""
    n = NGRAM_N
    req = ", ".join(f"'{w}'" for w in REQUIRED_STOPWORDS)
    gram_expr = f"array_to_string(ws[i:i+{n - 1}], ' ')"
    sy_n, sy_d = MAX_SYMBOL_RATIO
    bu_n, bu_d = MAX_BULLET_RATIO
    el_n, el_d = MAX_ELLIPSIS_RATIO
    al_n, al_d = MIN_ALPHA_WORD_RATIO
    dl_n, dl_d = MAX_DUP_LINE_RATIO
    dc_n, dc_d = MAX_DUP_LINE_CHAR_RATIO
    tg_n, tg_d = MAX_TOP2GRAM_CHAR_RATIO
    flags = {
        "ok_words": f"w.n_words >= {MIN_WORDS} AND w.n_words <= {MAX_WORDS}",
        "ok_mean_word_len": (
            f"w.n_words > 0 AND {MIN_MEAN_WORD_LEN} * w.n_words <= w.word_chars "
            f"AND w.word_chars <= {MAX_MEAN_WORD_LEN} * w.n_words"),
        "ok_symbol": f"{sy_d} * w.n_sym <= {sy_n} * w.n_words",
        "ok_bullet": f"{bu_d} * COALESCE(l.n_bullet, 0) <= {bu_n} * COALESCE(l.n_lines, 0)",
        "ok_ellipsis": f"{el_d} * COALESCE(l.n_ell, 0) <= {el_n} * COALESCE(l.n_lines, 0)",
        "ok_alpha_words": (
            f"w.n_words > 0 AND {al_d} * w.n_alpha_words >= {al_n} * w.n_words"),
        "ok_stopwords": f"w.n_req_stop >= {MIN_REQUIRED_STOPWORDS}",
        "ok_dup_lines": (
            f"{dl_d} * (COALESCE(l.n_lines, 0) - COALESCE(l.n_distinct, 0)) "
            f"<= {dl_n} * COALESCE(l.n_lines, 0)"),
        "ok_dup_line_chars": (
            f"{dc_d} * (COALESCE(l.line_chars, 0) - COALESCE(d.distinct_chars, 0)) "
            f"<= {dc_n} * COALESCE(l.line_chars, 0)"),
        "ok_top_2gram": (
            f"{tg_d} * COALESCE(g.top_chars, 0) <= {tg_n} * COALESCE(t.tok_chars, 0) "
            f"OR COALESCE(t.tok_chars, 0) = 0"),
    }
    flag_cols = ",\n       ".join(
        f"CAST({expr} AS BIGINT) AS {name}" for name, expr in flags.items())
    keep_expr = " AND ".join(f"({expr})" for expr in flags.values())
    return f"""
WITH gsrc AS (
  SELECT {id_col} AS doc_id, {text_expr} AS gtext FROM {source}
), base AS (
  SELECT doc_id, gtext,
         regexp_extract_all(lower(gtext), '{TOKEN_PATTERN}') AS ws,
         list_filter(string_split(gtext, chr(10)),
                     l -> length(l) > 0) AS lines
  FROM gsrc
), wagg AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(length(array_to_string(ws, '')) AS BIGINT) AS word_chars,
         CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_distinct(list_filter(ws, x -> x IN ({req}))))
              AS BIGINT) AS n_req_stop,
         CAST(length(gtext) - length(replace(gtext, '#', ''))
              + (length(gtext) - length(replace(gtext, '...', ''))) // 3
              AS BIGINT) AS n_sym
  FROM base
), lrows AS (
  SELECT doc_id, x AS line FROM base, UNNEST(lines) AS t(x)
), lagg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(count(DISTINCT line) AS BIGINT) AS n_distinct,
         CAST(sum(length(line)) AS BIGINT) AS line_chars,
         CAST(sum(CASE WHEN line LIKE '-%' OR line LIKE '*%'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
         CAST(sum(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ell
  FROM lrows GROUP BY doc_id
), ldist AS (
  SELECT doc_id, CAST(sum(length(line)) AS BIGINT) AS distinct_chars
  FROM (SELECT DISTINCT doc_id, line FROM lrows) GROUP BY doc_id
), gtop AS (
  SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top_chars FROM (
    SELECT doc_id, {gram_expr} AS g, CAST(count(*) AS BIGINT) AS c
    FROM base, UNNEST(range(1, len(ws) - {n} + 2)) AS t(i)
    WHERE len(ws) >= {n}
    GROUP BY doc_id, {gram_expr}
  ) QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY c DESC, g ASC) = 1
), tokc AS (
  SELECT doc_id,
         CAST(CASE WHEN len(ws) = 0 THEN 0
              ELSE length(array_to_string(ws, ' ')) END AS BIGINT) AS tok_chars
  FROM base
)
SELECT w.doc_id, w.n_words,
       {flag_cols},
       CAST({keep_expr} AS BIGINT) AS keep
FROM wagg w
LEFT JOIN lagg l USING (doc_id)
LEFT JOIN ldist d USING (doc_id)
LEFT JOIN gtop g USING (doc_id)
LEFT JOIN tokc t USING (doc_id)
"""
