"""P13/P12 — heuristic metadata extraction (SURVEY.md §2.2).

The reference extracts an 11-field ``EnhancedPdfMetadata`` struct via an LLM prompt
with controlled vocabularies (apps/web/lib/prompts/pdf-metadata.ts:1-91), tolerantly
parses the response (apps/web/lib/server/pdf.ts:13-35: JSON.parse, else regex
``\\{[\\s\\S]*\\}`` extraction, else null), and records failure as a flag column
(``metadata_failed``, apps/web/lib/db.ts:197-201) — never an exception.

Here the extractor is deterministic regex/vocabulary heuristics producing the same
struct shape (SURVEY.md §1.4 Arrow mapping). It never raises; an empty/None text
yields ``metadata_failed=True`` with all-null fields.
"""

from __future__ import annotations

import re

from janet_ray.functions.text import find_first_date, truncate_content
from janet_ray.stages.naming import COLLOQUIAL, DOC_TYPES, ORG_VOCAB, find_doc_type, find_org

# Label vocabulary (pdf-metadata.ts:32-55)
LABEL_VOCAB = [
    "Assessment", "Bank", "Bill", "Claims", "Debt", "Event", "Financial", "Form",
    "Government", "Health", "Healthcare", "Home", "Hospital", "House", "Insurance",
    "Investment", "Legal", "Local", "Medical", "Note", "Notice", "Payment",
    "Statement", "Tax",
]

# Account-holder vocabulary (pdf-metadata.ts "Try and use the following account holders")
HOLDER_VOCAB = ["Jason", "Diana"]

# \d+ then optional comma groups: matches both "$1,234.56" and plain "$1234.56"
# (the old \d{1,3} head silently truncated uncomma'd amounts >= $1000)
_MONEY_RE = re.compile(r"\$\s?\d+(?:,\d{3})*(?:\.\d{2})?")
_ACCOUNT_RE = re.compile(
    r"(?i:\bAccount|\bPolicy|\bReference|\bInvoice)(?i:\s*(?:No\.?|Number|#)?)\s*:?\s*"
    r"((?=[A-Z0-9-]*\d)[A-Z0-9][A-Z0-9-]{3,})"
)
_DEAR_RE = re.compile(r"\bDear\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)")
_HOLDER_RES = [(re.compile(r"\b" + re.escape(h) + r"\b"), h) for h in HOLDER_VOCAB]

_TYPE_TO_LABELS = {
    "Statement": ["Statement", "Financial"],
    "Bill": ["Bill", "Payment"],
    "Invoice": ["Bill", "Payment"],
    "Notice": ["Notice"],
    "Notice of Cancellation": ["Notice", "Insurance"],
    "Claim": ["Claims", "Insurance"],
    "W2": ["Tax", "Form"],
    "1095C": ["Tax", "Form", "Healthcare"],
    "Form": ["Form"],
    "Tax Organizer": ["Tax"],
    "Assessment": ["Assessment", "Government"],
}

METADATA_FIELDS = [
    "document_type", "issuing_organization", "primary_date", "account_holder",
    "account_details", "monetary_amounts", "summary", "descriptive_title",
    "other_people", "labels",
]


def extract_metadata(text: str | None) -> tuple[dict, bool]:
    """text → (metadata struct dict, metadata_failed). Tolerant: never raises."""
    empty = {
        "document_type": None, "issuing_organization": None, "primary_date": None,
        "account_holder": None, "account_details": None, "monetary_amounts": [],
        "summary": None, "descriptive_title": None, "other_people": [], "labels": [],
    }
    if not text or not text.strip():
        return empty, True
    try:
        content = truncate_content(text)
        md = dict(empty)
        doc_type = find_doc_type(content)
        md["document_type"] = doc_type.lower() if doc_type else None
        org = find_org(content)
        md["issuing_organization"] = COLLOQUIAL.get(org, org) if org else None
        ymd = find_first_date(content)
        if ymd:
            md["primary_date"] = f"{ymd[1]:02d}/{ymd[2]:02d}/{ymd[0]:04d}"  # MM/DD/YYYY per prompt item 3
        holders = [h for pat, h in _HOLDER_RES if pat.search(content)]
        dear = _DEAR_RE.search(content)
        md["account_holder"] = holders[0] if holders else (dear.group(1) if dear else None)
        md["other_people"] = holders[1:] if len(holders) > 1 else []
        acct = _ACCOUNT_RE.search(content)
        md["account_details"] = acct.group(1) if acct else None
        md["monetary_amounts"] = _MONEY_RE.findall(content)
        first_line = content.split("\n", 1)[0].strip()
        md["descriptive_title"] = first_line[:120] if first_line else None
        md["summary"] = " ".join(content.split())[:240] or None
        labels: list[str] = []
        if doc_type:
            labels.extend(_TYPE_TO_LABELS.get(doc_type, []))
        for lab in LABEL_VOCAB:
            if len(labels) >= 5:
                break
            if lab not in labels and re.search(r"\b" + lab + r"\b", content, re.IGNORECASE):
                labels.append(lab)
        md["labels"] = labels[:5]
        return md, False
    except Exception:  # tolerant-parse contract: failure is data
        return empty, True


def tolerant_json_extract(raw: str):
    """P12 — the tolerant JSON parser itself (server/pdf.ts:13-35): direct parse,
    else first {...} blob, else None."""
    import json

    try:
        return json.loads(raw)
    except (ValueError, TypeError):
        pass
    m = re.search(r"\{[\s\S]*\}", raw or "")
    if m:
        try:
            return json.loads(m.group(0))
        except ValueError:
            return None
    return None
