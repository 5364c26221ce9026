"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own operator set (SURVEY.md §2.11): language-ID (stopword
n-gram heuristic), quality scoring (length / alpha / stopword ratios), token
counting, and document fingerprinting. All are stateless vectorized
``map_batches(..., batch_format="pyarrow")`` bodies over a ``documents``-shaped
table ``(doc_id:int64, text:string, ...)``.

Every function here has an exactly-matching DuckDB SQL rendering (``*_sql``)
generated from the SAME constants, so the driver's Ray-vs-oracle value-hash
comparison is parity-by-construction:

  * tokens       = regex ``\\S+`` runs;
  * words        = regex ``[a-z]+`` runs over ``lower(text)`` (ASCII heuristic);
  * normalized   = ``trim`` of whitespace-collapsed ``lower(text)``;
  * fingerprint  = hex MD5 of the UTF-8 bytes of the normalized text;
  * lang-id      = 'zh' iff CJK chars * 10 >= total chars, else the first language
    in LANG_PRIORITY whose stopword hit-count is maximal and > 0, else 'unknown';
  * ratios are single IEEE-double divisions of exact integer counts (bit-identical
    across engines — never sums of floats).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- constants

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "for", "with", "on", "by", "a", "an",
           "is", "are", "was", "be", "this", "that", "it", "as", "at", "from", "or"),
    "es": ("el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "para",
           "con", "por", "se", "del", "al", "es", "no", "su", "lo"),
    "de": ("der", "die", "das", "und", "mit", "von", "zu", "den", "dem", "ein",
           "eine", "ist", "im", "für", "auf", "nicht", "als", "auch", "sich", "des"),
    "fr": ("le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "au",
           "pour", "avec", "sur", "est", "que", "ne", "pas", "dans", "par"),
}
# deterministic tie-break: first maximal wins in this order
LANG_PRIORITY: tuple[str, ...] = ("de", "en", "es", "fr")

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-z]+")
_CJK_RE = re.compile(r"[一-鿿]")
_WS_RE = re.compile(r"\s+")
_ALPHA_RE = re.compile(r"[A-Za-z]")

_STOPSETS = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}


# ---------------------------------------------------------------- scalar fns

def normalize_text(text: str) -> str:
    return _WS_RE.sub(" ", text.lower()).strip()


def fingerprint(text: str) -> str:
    """Hex MD5 of the normalized text (exact-dedup key; DuckDB ``md5()`` parity)."""
    return hashlib.md5(normalize_text(text).encode("utf-8")).hexdigest()


def lang_id(text: str) -> str:
    n_cjk = len(_CJK_RE.findall(text))
    if text and n_cjk * 10 >= len(text):
        return "zh"
    words = _WORD_RE.findall(text.lower())
    scores = {lang: sum(1 for w in words if w in _STOPSETS[lang]) for lang in LANG_PRIORITY}
    best = max(scores.values(), default=0)
    if best <= 0:
        return "unknown"
    for lang in LANG_PRIORITY:
        if scores[lang] == best:
            return lang
    return "unknown"  # pragma: no cover


def text_stats_row(text: str) -> dict:
    n_chars = len(text)
    tokens = _TOKEN_RE.findall(text)
    n_tokens = len(tokens)
    n_nonspace = sum(len(t) for t in tokens)
    n_alpha = len(_ALPHA_RE.findall(text))
    words = _WORD_RE.findall(text.lower())
    n_words = len(words)
    n_stop_en = sum(1 for w in words if w in _STOPSETS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_alpha": n_alpha,
        "n_stop_en": n_stop_en,
        # single exact-int divisions → bit-identical doubles in any engine;
        # stopword_ratio is per WORD (a token like "the,and" holds two words —
        # a token denominator could push the ratio above 1)
        "alpha_ratio": (n_alpha / n_chars) if n_chars else 0.0,
        "stopword_ratio": (n_stop_en / n_words) if n_words else 0.0,
        "mean_token_len": (n_nonspace / n_tokens) if n_tokens else 0.0,
    }


# ---------------------------------------------------------------- batch ops

def add_textstats(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append token/char/ratio stat columns (quality-scoring features)."""
    texts = batch[text_col].to_pylist()
    rows = [text_stats_row(t or "") for t in texts]
    out = batch
    for name, typ in (
        ("n_chars", pa.int64()), ("n_tokens", pa.int64()), ("n_alpha", pa.int64()),
        ("n_stop_en", pa.int64()), ("alpha_ratio", pa.float64()),
        ("stopword_ratio", pa.float64()), ("mean_token_len", pa.float64()),
    ):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, pa.array([r[name] for r in rows], type=typ))
    return out


def add_lang_id(batch: pa.Table, *, text_col: str = "text",
                out_col: str = "lang_pred") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        out_col, pa.array([lang_id(t or "") for t in texts], type=pa.string())
    )


def add_fingerprint(batch: pa.Table, *, text_col: str = "text",
                    out_col: str = "fp") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        out_col, pa.array([fingerprint(t or "") for t in texts], type=pa.string())
    )


def add_token_count(batch: pa.Table, *, text_col: str = "text",
                    out_col: str = "n_tokens") -> pa.Table:
    """Whitespace-token count, fully vectorized (pyarrow count_substring_regex)."""
    counts = pc.count_substring_regex(batch[text_col], r"\S+")
    return batch.append_column(out_col, pc.cast(counts, pa.int64()))


def add_compression_stats(batch: pa.Table, *, text_col: str = "text",
                          level: int = 6) -> pa.Table:
    """Compression-ratio quality signal — appends exact-int
    ``n_raw_bytes`` / ``n_zlib_bytes`` (utf-8 byte length and its zlib size
    at the pinned level). Highly compressible pages are boilerplate /
    repetition; near-incompressible ones are often binary junk — the cheap
    model-free quality feature web-curation stacks use next to the Gopher
    rules. Deterministic for a fixed zlib level (pinned here), so the
    columns are rerun-stable; no SQL twin exists (DuckDB has no zlib) —
    the reference implementation is pinned in pytest instead. Consumers
    gate with cross-multiplied int comparisons, e.g. keep
    ``lo·n_raw ≤ 100·n_zlib ≤ hi·n_raw`` — never a float ratio."""
    import zlib as _zlib

    raws, comps = [], []
    for t in batch[text_col].to_pylist():
        b = (t or "").encode("utf-8")
        raws.append(len(b))
        comps.append(len(_zlib.compress(b, level)))
    return (batch.append_column("n_raw_bytes", pa.array(raws, pa.int64()))
            .append_column("n_zlib_bytes", pa.array(comps, pa.int64())))


# ------------------------------------------------------- SQL renderings
# Generated from the same constants as the Python above — parity by construction.

def _sql_word_list(expr: str = "text") -> str:
    return f"regexp_extract_all(lower({expr}), '[a-z]+')"


def _sql_stop_count(lang: str, expr: str = "text") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_sql_word_list(expr)}, w -> w IN ({words})))"


def lang_id_sql(expr: str = "text") -> str:
    """SQL expression computing lang_id(expr) exactly."""
    scores = {lang: _sql_stop_count(lang, expr) for lang in LANG_PRIORITY}
    cjk = f"len(regexp_extract_all({expr}, '[\\x{{4e00}}-\\x{{9fff}}]'))"
    branches = []
    for lang in LANG_PRIORITY:
        ge = " AND ".join(
            f"({scores[lang]}) >= ({scores[o]})" for o in LANG_PRIORITY if o != lang
        )
        branches.append(f"WHEN ({scores[lang]}) > 0 AND {ge} THEN '{lang}'")
    return (
        f"CASE WHEN length({expr}) > 0 AND ({cjk}) * 10 >= length({expr}) THEN 'zh' "
        + " ".join(branches)
        + " ELSE 'unknown' END"
    )


def fingerprint_sql(expr: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')))"


def token_count_sql(expr: str = "text") -> str:
    return f"len(regexp_extract_all({expr}, '\\S+'))"


def textstats_sql(expr: str = "text") -> dict[str, str]:
    """Column-name → SQL expression map matching text_stats_row exactly."""
    n_chars = f"length({expr})"
    n_tokens = token_count_sql(expr)
    n_nonspace = f"length(regexp_replace({expr}, '\\s', '', 'g'))"
    n_alpha = f"len(regexp_extract_all({expr}, '[A-Za-z]'))"
    n_words = f"len({_sql_word_list(expr)})"
    n_stop = _sql_stop_count("en", expr)
    return {
        "n_chars": f"CAST({n_chars} AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "n_alpha": f"CAST({n_alpha} AS BIGINT)",
        "n_stop_en": f"CAST({n_stop} AS BIGINT)",
        "alpha_ratio": f"CASE WHEN {n_chars} > 0 THEN CAST({n_alpha} AS DOUBLE) / {n_chars} ELSE 0.0 END",
        "stopword_ratio": f"CASE WHEN {n_words} > 0 THEN CAST({n_stop} AS DOUBLE) / {n_words} ELSE 0.0 END",
        "mean_token_len": f"CASE WHEN {n_tokens} > 0 THEN CAST({n_nonspace} AS DOUBLE) / {n_tokens} ELSE 0.0 END",
    }
