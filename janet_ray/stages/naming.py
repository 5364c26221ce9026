"""P9 — canonical filename derivation (SURVEY.md §2.2).

The reference asks an LLM for ``YYYY-MM-DD Company - Description.pdf`` from the first
10 000 chars of extracted text and falls back to the original filename on *any*
failure (apps/legacy/src/services/openai.ts:21-92; the prompt at :36-67 is the spec:
date first, company after the date, single ``-`` separator, spaces not underscores,
description = doc type + document number + key details).

This engine derives the same format deterministically:

  date        first date found in the truncated text (functions/text.find_first_date),
              else None → failure path
  company     first organization from the controlled vocabulary found in the text
              (the prompt's org list, apps/web/lib/prompts/pdf-metadata.ts:58-82, plus
              a "colloquial name" normalization per the prompt's instruction), else the
              capitalized first label of the url host
  description doc-type keyword (Statement/Notice/Bill/... — the label vocabulary at
              pdf-metadata.ts:32-55) + trailing document number when present

Failure (no text, or no date found) → identity fallback: sanitized url basename
(the analogue of returning the original filename, openai.ts:83-91).
"""

from __future__ import annotations

import re

from janet_ray.functions.text import (
    find_first_date,
    sanitize_derived_filename,
    sanitize_filename,
    truncate_content,
    url_basename,
    url_host,
)

# The prompt's controlled org vocabulary (pdf-metadata.ts:58-82), plus colloquial
# forms used in the prompt's good-filename examples (openai.ts:46-53) and the golden
# fixture org (pdf.test.ts fixture is a Travelers notice).
ORG_VOCAB: list[str] = [
    "Alameda County",
    "BASS Medical Group",
    "CMRE Financial Services",
    "California State Controller's Office",
    "CarelonRx",
    "City of Oakland False Alarm Reduction Program",
    "Computershare Trust Company",
    "Dartmouth Alumni",
    "East Bay Pediatrics",
    "Empire Blue Cross Blue Shield",
    "Employment Development Department",
    "Good To Go!",
    "Heirfinders Research Associates",
    "Internal Revenue Service",
    "J.P. Morgan Wealth Management",
    "Mozilla Corporation",
    "Office of Assessor",
    "PG&E",
    "Stanford Health Care",
    "Sutter Health Alta Bates Summit",
    "TD Ameritrade",
    "UMB Bank",
    "WageWorks",
    "Travelers",
    "Chase",
    "Mozilla",
    "Sutter Health",
    "Weight Watchers",
]

# "use the colloquial name ... simple name over the official more verbose name"
COLLOQUIAL: dict[str, str] = {
    "Mozilla Corporation": "Mozilla",
    "Sutter Health Alta Bates Summit": "Sutter Health",
    "Internal Revenue Service": "IRS",
    "J.P. Morgan Wealth Management": "J.P. Morgan",
    "Employment Development Department": "EDD",
}

# Doc-type keywords, first-match-wins in text order (label vocab pdf-metadata.ts:32-55
# + the prompt's examples W2/1095C/Statement, openai.ts:46-53)
DOC_TYPES: list[str] = [
    "Notice of Cancellation",
    "Statement",
    "Invoice",
    "Notice",
    "Bill",
    "Claim",
    "W2",
    "1095C",
    "Form",
    "Receipt",
    "Report",
    "Letter",
    "Assessment",
    "Tax Organizer",
    "Summary",
]

# Single-scan alternations (hot path): regex alternation is leftmost-position
# first, then first-listed alternative — the earliest-start / first-in-vocab
# tie-break, in one scan instead of one per vocab entry. Canonical casing
# recovered via a lowercase lookup (vocab entries are case-insensitively unique).
_ORG_COMBINED = re.compile("|".join(re.escape(o) for o in ORG_VOCAB), re.IGNORECASE)
_ORG_CANON = {o.lower(): o for o in ORG_VOCAB}
_TYPE_COMBINED = re.compile(
    r"(?<![A-Za-z])(?:" + "|".join(re.escape(t) for t in DOC_TYPES) + r")(?![A-Za-z])",
    re.IGNORECASE,
)
_TYPE_CANON = {t.lower(): t for t in DOC_TYPES}


def find_org(text: str) -> str | None:
    m = _ORG_COMBINED.search(text)
    return _ORG_CANON[m.group(0).lower()] if m else None


def find_doc_type(text: str) -> str | None:
    m = _TYPE_COMBINED.search(text)
    return _TYPE_CANON[m.group(0).lower()] if m else None


# Document number: "No. 612266004", "Number 612266004", "#612266004",
# "Policy Number 612266004". The captured token must contain a digit (so label words
# like "Number" are never captured) and stays case-sensitive while the prefix
# alternation is locally case-insensitive.
_DOCNUM_RE = re.compile(
    r"(?:(?i:\bNo\.?|\bNumber|\bPolicy|\bAccount|\bInvoice|\bReference)|#)"
    r"(?i:\s*(?:No\.?|Number|#)?)\s*:?\s*((?=[A-Z0-9-]*\d)[A-Z0-9][A-Z0-9-]{3,})"
)


def derive_filename(url: str, text: str | None) -> str:
    """Derive the canonical filename; identity fallback on failure."""
    fallback = _identity_filename(url)
    if not text:
        return fallback
    content = truncate_content(text)
    ymd = find_first_date(content)
    if ymd is None:
        return fallback
    date_s = f"{ymd[0]:04d}-{ymd[1]:02d}-{ymd[2]:02d}"

    org = find_org(content)
    if org is not None:
        company = COLLOQUIAL.get(org, org)
    else:
        host = url_host(url)
        label = host.split(".", 1)[0] if host else "Unknown"
        company = label.capitalize() or "Unknown"

    doc_type = find_doc_type(content)
    desc = doc_type if doc_type else "Document"  # canonical vocab casing
    m = _DOCNUM_RE.search(content)
    if m:
        desc = f"{desc} {m.group(1)}"

    return sanitize_derived_filename(f"{date_s} {company} - {desc}.pdf")


def _identity_filename(url: str) -> str:
    base = sanitize_filename(url_basename(url))
    return base if base.lower().endswith(".pdf") else base + ".pdf"
