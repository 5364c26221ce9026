"""Unicode text normalization — the first cleaning pass of a web-corpus
pipeline (CCNet/RefinedWeb run exactly this before hashing or tokenizing:
inconsistent newline conventions, stray control bytes from broken
encodings, and combining-mark sequences otherwise make byte-identical
dedup keys miss equal text).

Pinned three-step chain (ORDER MATTERS and the SQL twin replays it
identically — step 2 must run before NFC so a control char can't block a
combining-mark merge, and step 1 before step 2 so \\r is consumed as a
newline, not stripped as a control):

  1. newline canonicalization: ``\\r\\n?`` → ``\\n``;
  2. control strip: C0 controls except tab/newline, plus DEL
     (``[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]``) → removed;
  3. Unicode NFC (composed form) — Python ``unicodedata.normalize("NFC")``
     and DuckDB ``nfc_normalize`` agree (both implement canonical
     composition; pinned by the oracle and a hypothesis parity test).

Stateless per-row map, zero shuffles. Steps 1–2 are vectorized Arrow RE2
kernels; step 3 is a Python loop only over rows that are not already NFC
(`unicodedata.is_normalized` fast path — ASCII corpora skip the loop)."""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

NEWLINE_PATTERN = r"\r\n?"
CONTROL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"

_NEWLINE_RE = re.compile(NEWLINE_PATTERN)
_CONTROL_RE = re.compile(CONTROL_PATTERN)


def normalize_text(text: str) -> str:
    """Reference scalar (test oracle; identical chain to the batch kernel)."""
    t = _NEWLINE_RE.sub("\n", text or "")
    t = _CONTROL_RE.sub("", t)
    return unicodedata.normalize("NFC", t)


def normalize_column(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     out_col: str = "text_norm"):
    """(id_col, out_col, changed) per row — the cleaning map. ``changed``
    marks rows the chain actually modified (the corpus-health metric a
    cleaning pass reports)."""

    def f(batch: pa.Table) -> pa.Table:
        col = pc.coalesce(batch[text_col], pa.scalar("", pa.string()))
        t = pc.replace_substring_regex(col, pattern=NEWLINE_PATTERN,
                                       replacement="\n")
        t = pc.replace_substring_regex(t, pattern=CONTROL_PATTERN,
                                       replacement="")
        vals = t.to_pylist()
        out = [v if unicodedata.is_normalized("NFC", v)
               else unicodedata.normalize("NFC", v) for v in vals]
        out_arr = pa.array(out, pa.string())
        return pa.table({
            id_col: batch[id_col],
            out_col: out_arr,
            "changed": pc.not_equal(out_arr, col),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def normalize_sql(*, source: str = "documents", text_expr: str = "text",
                  id_col: str = "doc_id", out_col: str = "text_norm") -> str:
    """DuckDB replay: same patterns, same order, nfc_normalize last; NULL
    text coalesces to '' exactly like the batch kernel (out='',
    changed=False)."""
    t = f"COALESCE({text_expr}, '')"
    norm = (f"nfc_normalize(regexp_replace(regexp_replace({t}, "
            f"'{NEWLINE_PATTERN}', chr(10), 'g'), "
            f"'{CONTROL_PATTERN}', '', 'g'))")
    return f"""
SELECT {id_col},
       {norm} AS {out_col},
       {norm} != {t} AS changed
FROM {source}
"""
