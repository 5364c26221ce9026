"""Gopher quality-rule filter (stages/gopher.py): exact-int rule boundaries,
the pinned symbol/line/gram semantics, and the batch map."""
import pyarrow as pa

from janet_ray.stages import gopher


def _flags(text):
    return gopher.doc_gopher_flags(text)


def _long_prose(n=60):
    # 60 distinct-ish words, mean length in [3, 10], two required stopwords
    return "the quick brown fox jumps over lazy dogs with " + " ".join(
        f"word{k}" for k in range(n - 9))


def test_word_count_bounds():
    assert _flags(_long_prose())["ok_words"] == 1
    assert _flags("only four small words")["ok_words"] == 0
    assert _flags("")["ok_words"] == 0


def test_mean_word_length_bounds():
    base = _long_prose()
    assert _flags(base)["ok_mean_word_len"] == 1
    # flooding with 1-char words drags the mean below 3
    assert _flags(base + " " + "a " * 400)["ok_mean_word_len"] == 0
    assert _flags("")["ok_mean_word_len"] == 0


def test_symbol_ratio_counts_hashes_and_nonoverlapping_ellipses():
    base = _long_prose()
    assert _flags(base)["ok_symbol"] == 1
    # 60 words -> 7 symbols breaches 1/10
    assert _flags(base + " " + "#" * 7)["ok_symbol"] == 0
    # '.....' is ONE non-overlapping '...' (str.count == SQL replace arith)
    f5 = _flags(base + " .....")
    f6 = _flags(base + " ......")
    assert f5["ok_symbol"] == 1 and f6["ok_symbol"] == 1
    assert _flags(base + " ..." * 7)["ok_symbol"] == 0


def test_bullet_ratio_boundary():
    base = _long_prose()
    # 9 bullet lines of 10 total = exactly 9/10 -> pass
    nine = base + "".join(f"\n- b{k}" for k in range(9))
    assert _flags(nine)["ok_bullet"] == 1
    # 10 of 11 > 9/10 -> fail; '*' prefix counts too
    ten = base + "".join(f"\n* b{k}" for k in range(10))
    assert _flags(ten)["ok_bullet"] == 0


def test_ellipsis_line_ratio_boundary():
    base = _long_prose()
    # 3 of 10 lines ending '...' = exactly 3/10 -> pass
    t = base + "\nx..." * 3 + "\ny" * 6
    assert _flags(t)["ok_ellipsis"] == 1
    t = base + "\nx..." * 4 + "\ny" * 6   # 4/11 > 3/10
    assert _flags(t)["ok_ellipsis"] == 0


def test_alpha_word_coverage():
    base = _long_prose()
    assert _flags(base)["ok_alpha_words"] == 1
    # 60 alpha words + 16 digit-only words -> 60/76 < 4/5
    assert _flags(base + " " + " ".join(str(k) for k in range(100, 116))
                  )["ok_alpha_words"] == 0
    assert _flags("")["ok_alpha_words"] == 0


def test_required_stopwords_distinct():
    base = " ".join(f"word{k}" for k in range(60))
    assert _flags(base)["ok_stopwords"] == 0
    assert _flags(base + " the the the the")["ok_stopwords"] == 0  # 1 distinct
    assert _flags(base + " the of")["ok_stopwords"] == 1


def test_dup_line_gates():
    base = _long_prose()
    t = base + "\nsame\nsame\nsame"        # 2 dup of 4 lines = 1/2 > 3/10
    f = _flags(t)
    assert f["ok_dup_lines"] == 0
    # distinct lines -> both dup gates pass
    f = _flags(base + "\none\ntwo\nthree")
    assert f["ok_dup_lines"] == 1 and f["ok_dup_line_chars"] == 1


def test_top_2gram_gate():
    spam = "buy now " * 40                  # one 2-gram dominates
    assert _flags(spam)["ok_top_2gram"] == 0
    assert _flags(_long_prose())["ok_top_2gram"] == 1
    assert _flags("one")["ok_top_2gram"] == 1   # < n tokens -> vacuous pass


def test_gopher_filter_batch_map(ray_session):
    import ray.data

    texts = [_long_prose(), "tiny", "buy now " * 40 + "the of stuff"]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
    rows = {r["doc_id"]: r for r in gopher.gopher_filter(ds).take_all()}
    for i, t in enumerate(texts):
        want = gopher.doc_gopher_flags(t)
        for k, v in want.items():
            assert rows[i][k] == v, (i, k)
        assert rows[i]["keep"] == min(want[c] for c in gopher.FLAG_COLS)


# ----------------------------------------------------- vectorized parity
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _assert_batch_parity(texts):
    vec = gopher.gopher_flags_batch(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        want = gopher.doc_gopher_flags(t)
        for k, v in want.items():
            assert vec[k][i] == v, (i, k, v, vec[k][i], repr(t)[:120])


def test_batch_kernel_parity_edges():
    _assert_batch_parity([
        "", "\n\n", "a", "the be to of and that have with",
        "- bullet\n* bullet2\nplain...\n...", "#...#...", ".....",
        "dup\ndup\ndup\nuniq", "ab c ab c ab c", "a bc a bc",
        "word " * 60, None, "x\n" * 30, "9 8 7 6 5", "ab c\na bc",
        "the the the the", "...\n...\n...", "*", "-", "é ü ñ É Ü",
        "İstanbul and İzmir are cities",  # U+0130: Python vs Arrow lower
        "a" * 500, ("lorem " * 30 + "\n") * 5, "x y x y x z x y",
    ])


def test_batch_kernel_gram_tiebreak_is_min_string():
    # two 2-grams tie at count 2; Python picks min gram STRING — the fused
    # id-pair order must agree even when one token prefixes another
    _assert_batch_parity(["ab c ab c a bc a bc", "zz q zz q a b a b"])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet="ab1 .#*-\n\"!?éİ", min_size=0, max_size=80),
    min_size=1, max_size=12))
def test_batch_kernel_parity_fuzz(texts):
    _assert_batch_parity(texts)
