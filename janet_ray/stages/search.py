"""P16/P17/Q — keyword normalization and span-producing match search (SURVEY.md §2.2).

Reproduces the reference's vendored search plugin semantics:

  * regex-escape (apps/search/src/normalizeKeyword.ts:15);
  * keyword normalization (normalizeKeyword.ts:17-59): ``wholeWords`` pads the
    *escaped source* with literal spaces (`` kw `` — spaces are part of the match and
    of the span!), ``matchCase`` drops the ignore-case flag, empty keyword → a
    sentinel single-space pattern (constants.ts:10-16);
  * the match loop (useSearch.ts:205-219): global regex exec over each page's text
    producing ``{page_index, match_index, start, end}`` character spans;
  * match count aggregation (useSearch.ts:248, asserted exactly by the reference's
    e2e tests — jumpToMatch.e2e.ts:31-33 "Found 22 results").
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class NormalizedKeyword:
    keyword: str
    regexp: re.Pattern
    whole_words: bool


def escape_regexp(s: str) -> str:
    """JS-equivalent escape of /[.*+?^${}()|[\\]\\\\]/ — re.escape escapes a superset,
    with identical matching semantics."""
    return re.escape(s)


def normalize_keyword(
    keyword: str | re.Pattern,
    match_case: bool = False,
    whole_words: bool = False,
) -> NormalizedKeyword:
    if isinstance(keyword, re.Pattern):
        return NormalizedKeyword(keyword.pattern, keyword, whole_words)
    if keyword == "":
        return NormalizedKeyword("", re.compile(" "), False)
    source = f" {keyword} " if whole_words else keyword
    flags = 0 if match_case else re.IGNORECASE
    return NormalizedKeyword(keyword, re.compile(escape_regexp(source), flags), whole_words)


def find_matches(page_texts: list[str], kw: NormalizedKeyword) -> list[dict]:
    """Global exec loop per page → Match spans (offsets include the wholeWords
    padding spaces, exactly like match.index/endIndex in useSearch.ts:211-216)."""
    out: list[dict] = []
    match_index = 0
    for page_index, text in enumerate(page_texts):
        for m in kw.regexp.finditer(text):
            out.append(
                {
                    "page_index": page_index,
                    "match_index": match_index,
                    "start": m.start(),
                    "end": m.end(),
                }
            )
            match_index += 1
    return out


def count_matches(text: str, keyword: str, match_case: bool = False, whole_words: bool = False) -> int:
    kw = normalize_keyword(keyword, match_case, whole_words)
    return len(find_matches([text], kw))
