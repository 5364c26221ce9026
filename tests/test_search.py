"""P16/P17/Q — keyword/span semantics mirrored from the reference's search plugin
tests (apps/search/__tests__/, exact match counts per SURVEY.md §5 layers 3-4)."""

from janet_ray.stages.search import count_matches, find_matches, normalize_keyword
from janet_ray.synth import _COBRA_PARAS, _COBRA_TITLE, _DOC22_PARAS, _DOC22_TITLE


def test_case_insensitive_default():
    assert count_matches("Cobra cobra COBRA", "cobra") == 3


def test_match_case():
    assert count_matches("Cobra cobra COBRA", "cobra", match_case=True) == 1


def test_whole_words_space_padding_semantics():
    # wholeWords pads the pattern with literal spaces — so a keyword at the very
    # start/end of the text does NOT match (reference semantics,
    # normalizeKeyword.ts:18 `` ${keyword} ``)
    assert count_matches("word in the middle", "in", whole_words=True) == 1
    assert count_matches("in the middle", "in", whole_words=True) == 0
    assert count_matches("finish in style", "in", whole_words=True) == 1  # not 'finish'


def test_whole_words_span_includes_padding():
    kw = normalize_keyword("in", whole_words=True)
    m = find_matches(["word in the middle"], kw)
    assert m == [{"page_index": 0, "match_index": 0, "start": 4, "end": 8}]


def test_empty_keyword_sentinel():
    kw = normalize_keyword("")
    assert kw.regexp.pattern == " "


def test_regex_keyword_passthrough():
    import re

    kw = normalize_keyword(re.compile(r"\d+"))
    assert count_matches_re(kw, "a1 b22 c333") == 3


def count_matches_re(kw, text):
    return len(find_matches([text], kw))


def test_special_chars_escaped():
    assert count_matches("price is $1.50 or $1x50", "$1.50") == 1


def test_match_index_runs_across_pages():
    kw = normalize_keyword("x")
    ms = find_matches(["x x", "x"], kw)
    assert [m["match_index"] for m in ms] == [0, 1, 2]
    assert [m["page_index"] for m in ms] == [0, 0, 1]


def test_cobra_anchor_count():
    text = "\n\n".join([_COBRA_TITLE] + _COBRA_PARAS)
    assert count_matches(text, "cobra") == 6


def test_found_22_results():
    # The reference e2e asserts 'Found 22 results' (jumpToMatch.e2e.ts:31-33)
    text = "\n\n".join([_DOC22_TITLE] + _DOC22_PARAS)
    assert count_matches(text, "document") == 22
