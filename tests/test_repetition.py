"""Repetition statistics (stages/repetition.py): pinned Gopher-family
semantics, edge cases, SQL-twin parity, distributed == local."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.stages.repetition import (
    add_repetition_stats,
    doc_repetition,
    repetition_sql,
    repetition_stats,
)


def test_empty_and_tiny():
    assert doc_repetition("") == (0, 0.0, 0.0, 0.0)
    assert doc_repetition(None) == (0, 0.0, 0.0, 0.0)
    assert doc_repetition("one") == (1, 0.0, 0.0, 0.0)   # < 2 tokens
    # whitespace-only: split gives no non-empty lines, no tokens
    assert doc_repetition("\n\n\n") == (0, 0.0, 0.0, 0.0)


def test_duplicate_lines():
    # 4 lines, "aa" repeated 3x: dup_line_frac = (4-2)/4;
    # chars: all=2+2+2+3=9, distinct=2+3=5 -> dup_line_char_frac = 4/9
    n, dlf, dlcf, _ = doc_repetition("aa\naa\naa\nbbb")
    assert n == 4
    assert dlf == (4 - 2) / 4
    assert dlcf == (9 - 5) / 9


def test_top_ngram_overlap_can_exceed_one():
    # tokens [a,a,a,a]: gram 'a a' count 3, len 3, tchars 7 -> 9/7 > 1
    _, _, _, tgf = doc_repetition("a a a a")
    assert tgf == 3 * 3 / 7


def test_top_ngram_tie_break_lexicographic():
    # 'b c' and 'a b' both occur once in "a b" "b c"? tokens [a,b,c]:
    # grams 'a b','b c' each once -> smallest gram 'a b' wins
    _, _, _, tgf = doc_repetition("a b c")
    tchars = len("a b c")
    assert tgf == 1 * len("a b") / tchars


_TEXT_ALPHABET = st.sampled_from(
    ["aa", "bbb", "line one", "\n", " ", "dup dup", "x1 y2", "the the the"])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(_TEXT_ALPHABET, max_size=8).map(" ".join),
                min_size=1, max_size=6).map("\n".join))
def test_sql_parity(text):
    """Python implementation == the generated DuckDB twin, bit-exact."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1 AS doc_id, ? AS text",
                [text])
    row = con.execute(repetition_sql()).fetchone()
    got = doc_repetition(text)
    assert (row[1], row[2], row[3], row[4]) == got


def test_distributed_matches_local(ray_session):
    import ray

    texts = ["aa\naa\nbbb", "", "a a a a", "the quick\nthe quick\nbrown fox"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    out = repetition_stats(ds).to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        n, dlf, dlcf, tgf = doc_repetition(t)
        assert out.loc[i, "n_lines"] == n
        assert out.loc[i, "dup_line_frac"] == dlf
        assert out.loc[i, "dup_line_char_frac"] == dlcf
        assert out.loc[i, "top_2gram_char_frac"] == tgf


def test_add_columns_preserves_input():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["aa\naa"], pa.string())})
    out = add_repetition_stats(t)
    assert out.column_names == ["doc_id", "text", "n_lines", "dup_line_frac",
                                "dup_line_char_frac", "top_2gram_char_frac"]
