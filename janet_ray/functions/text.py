"""§2.8 — string / date scalar functions mirrored from the reference.

Each function cites the reference behavior it reproduces (semantics, not code).
"""

from __future__ import annotations

import re
from datetime import datetime
from urllib.parse import urlparse

# P14 — filename sanitize: replace(/[^a-zA-Z0-9._-]+/g, "_")
# (apps/web/app/api/pdfs/internal-stream/[token]/route.ts:135)
_SANITIZE_RE = re.compile(r"[^a-zA-Z0-9._-]+")


def sanitize_filename(name: str) -> str:
    return _SANITIZE_RE.sub("_", name)


# Derived-filename sanitize: the YYYY-MM-DD Company - Description format KEEPS
# spaces and dashes (openai.ts:36-67 spec); only fs-hostile characters are replaced.
_FS_HOSTILE_RE = re.compile(r'[/\\:*?"<>|\x00-\x1f]+')


def sanitize_derived_filename(name: str) -> str:
    return _FS_HOSTILE_RE.sub("_", name).strip()


# O6 — truncation: content.slice(0, 10000) — first 10 000 *characters*
# (apps/legacy/src/services/openai.ts:70). JS .slice counts UTF-16 code units;
# for the BMP-only text this engine produces, Python code points are equivalent.
def truncate_content(text: str, limit: int = 10_000) -> str:
    return text[:limit]


# ISO timestamp with [:.] → '-' used for backup file names
# (apps/legacy/rename.ts:7, cache.ts:16)
def timestamp_slug(dt: datetime) -> str:
    return re.sub(r"[:.]", "-", dt.isoformat())


# P15 — ordinal long-date format; invalid input → None (apps/web/lib/utils.ts:7-33)
_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]


def _ordinal(day: int) -> str:
    if 11 <= day % 100 <= 13:
        suf = "th"
    else:
        suf = {1: "st", 2: "nd", 3: "rd"}.get(day % 10, "th")
    return f"{day}{suf}"


def format_long_date(value: str) -> str | None:
    """'2024-02-25' → 'February 25th, 2024'; unparseable → None."""
    for fmt in ("%Y-%m-%d", "%m/%d/%Y"):
        try:
            dt = datetime.strptime(value.strip(), fmt)
            return f"{_MONTHS[dt.month - 1]} {_ordinal(dt.day)}, {dt.year}"
        except (ValueError, AttributeError):
            continue
    return None


# ---- date detection used by naming/metadata (the reference delegates this to the
# LLM; the prompt format contract "MM/DD/YYYY" is at pdf-metadata.ts and the filename
# date contract "YYYY-MM-DD" at openai.ts:36-44) ----

_MONTH_NAMES = {m.lower(): i + 1 for i, m in enumerate(_MONTHS)}
_MONTH_ABBR = {m[:3].lower(): i + 1 for i, m in enumerate(_MONTHS)}

_DATE_PATTERNS = [
    # FEBRUARY 25, 2024 / Feb 25, 2024
    re.compile(
        r"\b([A-Za-z]{3,9})\.?\s+(\d{1,2})(?:st|nd|rd|th)?,?\s+(\d{4})\b"
    ),
    # 2024-02-25
    re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b"),
    # 02/25/2024
    re.compile(r"\b(\d{1,2})/(\d{1,2})/(\d{4})\b"),
]


def find_first_date(text: str) -> tuple[int, int, int] | None:
    """First date mentioned in the text → (year, month, day), or None."""
    best: tuple[int, tuple[int, int, int]] | None = None
    for pat_idx, pat in enumerate(_DATE_PATTERNS):
        # scan ALL candidates per pattern: a word+number hit that fails month
        # lookup (e.g. "Revision 2 2024") must not mask a real date later on
        for m in pat.finditer(text):
            g = m.groups()
            if pat_idx == 0:
                month = _MONTH_NAMES.get(g[0].lower()) or _MONTH_ABBR.get(g[0][:3].lower())
                if month is None:
                    continue
                ymd = (int(g[2]), month, int(g[1]))
            elif pat_idx == 1:
                ymd = (int(g[0]), int(g[1]), int(g[2]))
            else:
                ymd = (int(g[2]), int(g[0]), int(g[1]))
            y, mo, d = ymd
            if not (1900 <= y <= 2100 and 1 <= mo <= 12 and 1 <= d <= 31):
                continue
            if best is None or m.start() < best[0]:
                best = (m.start(), ymd)
            break  # first VALID match of this pattern is its earliest
    return best[1] if best else None


def _host_path(url: str) -> tuple[str, str]:
    """(netloc, path) of a url. Fast manual split for the http(s) fast path —
    urlparse measured ~13% of ExtractStage wall (two calls per row); this is
    byte-equivalent to urlparse for http(s) urls (netloc = chars after '//' up
    to the first '/', '?' or '#'; path excludes query/fragment) and delegates
    everything else to urlparse. Since bpo-43882 urlsplit strips \\t\\r\\n
    anywhere in the URL before parsing; mirror that here (cheap containment
    check, only pays on malformed crawl urls) so the A6 dedupe/partition key
    is identical whichever path runs."""
    if "\t" in url or "\r" in url or "\n" in url:
        url = url.replace("\t", "").replace("\r", "").replace("\n", "")
    if url.startswith(("https://", "http://")):
        rest = url[8:] if url[4] == "s" else url[7:]
        for sep in ("#", "?"):
            j = rest.find(sep)
            if j != -1:
                rest = rest[:j]
        k = rest.find("/")
        host = rest if k == -1 else rest[:k]
        # bracketed (IPv6) authorities have validation rules urlparse enforces
        # (may raise ValueError → ("", "")) — don't shortcut those
        if "[" not in host and "]" not in host:
            return (rest, "") if k == -1 else (rest[:k], rest[k:])
    try:
        p = urlparse(url)
        return p.netloc or "", p.path
    except ValueError:
        return "", ""


def url_host(url: str) -> str:
    """Host component of a url ('' when absent) — the A6 dedupe/partition key."""
    return _host_path(url)[0]


def url_basename(url: str) -> str:
    """Last path segment of a url (fallback identity filename, cf. the reference's
    fallback-to-original-name on derivation failure, openai.ts:83-91)."""
    host, path = _host_path(url)
    path = path.rstrip("/")
    seg = path.rsplit("/", 1)[-1] if path else ""
    return seg or host or "document"
