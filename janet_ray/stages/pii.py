"""PII redaction for training-data pipelines: scrub e-mail addresses and
phone-like number runs from a text column, fully vectorized (every kernel is
a pyarrow.compute regex call — no Python over rows), with exact counts of
what was redacted.

Parity-by-construction with the DuckDB oracle (``pii_sql``): BOTH engines
compile the SAME pattern constants below with RE2 (Arrow's
``replace_substring_regex``/``count_substring_regex`` and DuckDB's
``regexp_replace(..., 'g')``/``regexp_extract_all`` are all RE2), so
leftmost-longest-non-overlapping match semantics are bit-identical.

Redaction order is pinned: e-mails first (their replacement token contains no
digits, so it can never create or destroy a phone match), then phone runs on
the e-mail-redacted text; ``n_phones`` therefore counts matches AFTER e-mail
redaction — the SQL twin applies the same chain.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9-]{6,}[0-9]"
EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def add_pii_scrub(batch: pa.Table, *, text_col: str = "text",
                  out_col: str = "text_redacted") -> pa.Table:
    """Append ``out_col`` (scrubbed text), ``n_emails`` and ``n_phones``."""
    text = batch[text_col]
    n_emails = pc.cast(pc.count_substring_regex(text, EMAIL_PATTERN),
                       pa.int64())
    no_email = pc.replace_substring_regex(text, EMAIL_PATTERN, EMAIL_TOKEN)
    n_phones = pc.cast(pc.count_substring_regex(no_email, PHONE_PATTERN),
                       pa.int64())
    scrubbed = pc.replace_substring_regex(no_email, PHONE_PATTERN, PHONE_TOKEN)
    return (batch
            .append_column(out_col, scrubbed)
            .append_column("n_emails", n_emails)
            .append_column("n_phones", n_phones))


def pii_scrub(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, text_redacted, n_emails, n_phones) per document."""

    def f(batch: pa.Table) -> pa.Table:
        out = add_pii_scrub(batch, text_col=text_col)
        return out.select([id_col, "text_redacted", "n_emails", "n_phones"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_quote(pattern: str) -> str:
    return pattern.replace("'", "''")


def pii_sql(*, source: str = "documents", text_expr: str = "text",
            id_col: str = "doc_id") -> str:
    """DuckDB replay from the same constants, same redaction chain."""
    em = _sql_quote(EMAIL_PATTERN)
    ph = _sql_quote(PHONE_PATTERN)
    no_email = f"regexp_replace({text_expr}, '{em}', '{EMAIL_TOKEN}', 'g')"
    return f"""
SELECT {id_col} AS doc_id,
       regexp_replace({no_email}, '{ph}', '{PHONE_TOKEN}', 'g')
           AS text_redacted,
       CAST(len(regexp_extract_all({text_expr}, '{em}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all({no_email}, '{ph}')) AS BIGINT)
           AS n_phones
FROM {source}
"""
