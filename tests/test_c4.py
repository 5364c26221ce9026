"""C4 cleaning rules (stages/c4.py, Raffel'20 §2.2): line-rule boundaries,
page-gate boundaries, and the batch map against the per-doc kernel."""
import pyarrow as pa

from janet_ray.stages import c4


GOOD = "this line has at least five words."


def test_line_terminal_suffixes():
    assert c4.line_kept(GOOD)
    assert c4.line_kept("is this a question with enough words?")
    assert c4.line_kept("what a long exciting line this is!")
    assert c4.line_kept('he said this ends with a quote"')
    assert not c4.line_kept("this long line does not end with punctuation")
    assert not c4.line_kept("this one ends with a comma,")


def test_line_min_words_boundary():
    assert c4.line_kept("five words are right here.")          # exactly 5
    assert not c4.line_kept("only four words here.")           # 4 < 5
    # words are [a-z0-9] runs: "don't" is 2 words (don + t)
    assert c4.line_kept("don't stop the good lines.")


def test_line_policy_substrings_case_insensitive():
    assert not c4.line_kept("please enable JavaScript to view this page.")
    assert not c4.line_kept("we updated our Privacy Policy terms today.")
    assert not c4.line_kept("this site uses a Cookie banner every visit.")
    assert not c4.line_kept("read the Terms of Use before you continue.")


def _page(extra=""):
    return c4.doc_c4(GOOD + "\n" + GOOD + "\n" + GOOD + extra)


def test_page_rules_pass_on_clean_text():
    r = _page()
    assert r["keep"] == 1 and all(r[c] == 1 for c in c4.FLAG_COLS)
    assert r["n_lines"] == 3 and r["n_kept"] == 3 and r["n_sentences"] == 3
    assert r["clean_text"] == "\n".join([GOOD] * 3)


def test_page_lorem_brace_badwords():
    assert _page("\nLorem Ipsum dolor sit amet.")["ok_lorem"] == 0
    assert _page("\ncode { here")["ok_brace"] == 0
    assert _page("\nthe word unsafeword0 appears in this line.")["ok_badwords"] == 0
    # substring of a block word is NOT a match (token-exact membership)
    assert _page("\nthe word unsafeword01 is a different token here.")["ok_badwords"] == 1


def test_page_min_sentences_boundary():
    # 2 kept lines -> 2 sentences < 3 -> page dropped
    r = c4.doc_c4(GOOD + "\n" + GOOD)
    assert r["ok_sentences"] == 0 and r["keep"] == 0
    # a kept line with 2 terminal chars ("etc.." style) counts both
    r = c4.doc_c4(GOOD + "\n" + "this second line mentions etc. twice.")
    assert r["n_kept"] == 2 and r["n_sentences"] == 3 and r["ok_sentences"] == 1


def test_dropped_lines_do_not_count_sentences():
    # line fails the word-count rule -> its '.' chars never reach the count
    r = c4.doc_c4(GOOD + "\n" + GOOD + "\nshort line.")
    assert r["n_lines"] == 3 and r["n_kept"] == 2 and r["n_sentences"] == 2


def test_empty_and_null_text():
    r = c4.doc_c4("")
    assert r["keep"] == 0 and r["ok_sentences"] == 0 and r["clean_text"] == ""
    assert c4.doc_c4(None)["n_lines"] == 0


def test_split_sentences():
    assert c4.split_sentences("a b. c d! e f? g") == ["a b", "c d", "e f", "g"]
    assert c4.split_sentences("  spaced out .  .") == ["spaced out"]
    assert c4.split_sentences("") == []
    assert c4.split_sentences(None) == []
    # strip is SPACES only (trim parity with the SQL twin)
    assert c4.split_sentences("x\ny. z") == ["x\ny", "z"]


def _span_corpus():
    shared = "one two three alpha. one two three beta. one two three gamma."
    return {
        1: "doc one unique opener. " + shared,
        2: "doc two unique opener. " + shared,
        3: "self. rep. rep. rep. rep. rep. tail",   # intra-doc dup spans
        4: "too short. to span.",                   # < 3 sentences: untouched
        5: "",                                      # no sentences at all
    }


def _expected_span_dedup(docs, n=3):
    """Brute-force reference of the pinned rule."""
    occ = {}
    sents = {i: c4.split_sentences(t) for i, t in docs.items()}
    for i in sorted(docs):
        for j in range(len(sents[i]) - n + 1):
            key = c4.SPAN_SEP.join(sents[i][j:j + n])
            occ.setdefault(key, []).append((i, j))
    bad = {i: set() for i in docs}
    for key, places in occ.items():
        for (i, j) in places[1:]:
            bad[i].update(range(j, j + n))
    out = {}
    for i in docs:
        kept = [s for j, s in enumerate(sents[i]) if j not in bad[i]]
        out[i] = {"n_sentences": len(sents[i]),
                  "n_dropped": len(sents[i]) - len(kept),
                  "text": c4.OUT_SEP.join(kept)}
    return out


def test_span_dedup_small_and_forced_union_paths(ray_session):
    import ray.data

    docs = _span_corpus()
    want = _expected_span_dedup(docs)
    tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    for limit in (5_000_000, 0):     # broadcast path, then forced cogroup
        ds = ray.data.from_arrow(tbl)
        rows = {r["doc_id"]: r
                for r in c4.span_dedup(ds, broadcast_limit=limit).take_all()}
        assert len(rows) == len(docs)
        for i, w in want.items():
            for k, v in w.items():
                assert rows[i][k] == v, (limit, i, k)
    # doc 1 keeps everything (first occurrence), doc 2 loses the shared spans
    assert want[1]["n_dropped"] == 0 and want[2]["n_dropped"] == 3
    assert want[3]["n_dropped"] > 0          # intra-doc repetition cut
    assert want[4]["n_dropped"] == 0 and want[5]["n_sentences"] == 0


def test_span_dedup_string_ids_union_path(ray_session):
    import ray.data

    docs = {f"u{i}": t for i, t in _span_corpus().items()}
    tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
    ds = ray.data.from_arrow(tbl)
    out = c4.span_dedup(ds, broadcast_limit=0).take_all()
    assert {r["doc_id"] for r in out} == set(docs)
    # same keep decisions as the int-id corpus (u1 < u2 lexicographically)
    rows = {r["doc_id"]: r for r in out}
    assert rows["u1"]["n_dropped"] == 0 and rows["u2"]["n_dropped"] == 3


def test_c4_filter_batch_map(ray_session):
    import ray.data

    texts = ["\n".join([GOOD] * 3),
             "tiny",
             GOOD + "\nLorem Ipsum dolor sit amet.\n" + GOOD + "\n" + GOOD,
             ""]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}))
    rows = {r["doc_id"]: r for r in c4.c4_filter(ds).take_all()}
    for i, t in enumerate(texts):
        want = c4.doc_c4(t)
        for k, v in want.items():
            assert rows[i][k] == v, (i, k)


# ----------------------------------------------------- vectorized parity
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _assert_c4_parity(texts):
    vec = c4.c4_batch(pa.array(texts, pa.string()))
    clean = vec["clean_text"].to_pylist()
    for i, t in enumerate(texts):
        want = c4.doc_c4(t)
        for k, v in want.items():
            got = clean[i] if k == "clean_text" else vec[k][i]
            assert got == v, (i, k, v, got, repr(t)[:120])


def test_c4_batch_parity_edges():
    _assert_c4_parity([
        "", None, "\n\n", GOOD, GOOD + "\n" + GOOD,
        "lorem ipsum dolor sit amet today.", "code { brace }",
        "unsafeword0 in this line with enough words.",
        "this long line does not end with punctuation",
        "only four words here.", 'he said this ends with a quote"',
        "please enable JavaScript to view this page.",
        "x." * 40, "...", "a!b?c.", GOOD + "\nshort.", "é ü ñ lines.",
        "İstanbul line has five words.",  # U+0130: Python vs Arrow lower
    ])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet='ab1 .!?"{\ncookieİ', min_size=0, max_size=80),
    min_size=1, max_size=10))
def test_c4_batch_parity_fuzz(texts):
    _assert_c4_parity(texts)
