"""textstats operators + their generated-SQL parity (the oracle contract)."""
import duckdb
import pyarrow as pa
import pytest

from janet_ray.stages import textstats as ts


def test_lang_id_basic():
    assert ts.lang_id("the cat and the hat of the house") == "en"
    assert ts.lang_id("el perro de la casa que en un una para") == "es"
    assert ts.lang_id("der hund und die katze mit von zu den") == "de"
    assert ts.lang_id("le chien et les chats de la maison pour") == "fr"
    assert ts.lang_id("数据账户支付服务客户通知年度摘要") == "zh"
    assert ts.lang_id("xyzzy qwerty plugh") == "unknown"
    assert ts.lang_id("") == "unknown"


def test_lang_id_tie_break_deterministic():
    # 'la de en un' scores es=4 fr=3('la de en'? 'un' also fr) → overlapping
    # stopwords must resolve by LANG_PRIORITY order, stably
    t = "de la en un une"
    assert ts.lang_id(t) == ts.lang_id(t)


def test_fingerprint_normalizes():
    assert ts.fingerprint("Hello   World") == ts.fingerprint("hello world")
    assert ts.fingerprint(" hello world ") == ts.fingerprint("hello world")
    assert ts.fingerprint("hello") != ts.fingerprint("world")


def test_text_stats_row():
    r = ts.text_stats_row("The cat sat.")
    assert r["n_chars"] == 12
    assert r["n_tokens"] == 3
    assert r["n_alpha"] == 9
    assert r["mean_token_len"] == (3 + 3 + 4) / 3
    assert r["n_stop_en"] == 1  # 'the'
    empty = ts.text_stats_row("")
    assert empty["alpha_ratio"] == 0.0 and empty["stopword_ratio"] == 0.0


def test_add_token_count_vectorized():
    t = pa.table({"text": ["a b  c", "", "one"]})
    out = ts.add_token_count(t)
    assert out["n_tokens"].to_pylist() == [3, 0, 1]


@pytest.fixture(scope="module")
def sample_table():
    rows = [
        "The quick brown fox jumps over the lazy dog",
        "el rio de la plata es un lugar en que los barcos",
        "der alte mann und das meer ist ein buch von hemingway",
        "le petit prince est un livre pour les enfants et des adultes",
        "数据账户支付服务客户通知年度摘要信息系统报告",
        "",
        "mixed 语言 content the of and in data 有一些中文",
        "    spaced     out      tokens   ",
    ]
    return pa.table({"doc_id": list(range(len(rows))), "text": rows})


def test_sql_parity_full(sample_table):
    """Every generated SQL expression matches the Python implementation exactly —
    this is what makes the driver's oracle comparison parity-by-construction."""
    con = duckdb.connect()
    con.register("documents", sample_table)
    stats = ts.textstats_sql()
    sql = (
        f"SELECT doc_id, {ts.lang_id_sql()} AS lang_pred, "
        f"{ts.fingerprint_sql()} AS fp, {ts.token_count_sql()} AS tc, "
        + ", ".join(f"{e} AS {n}" for n, e in stats.items())
        + " FROM documents ORDER BY doc_id"
    )
    oracle = con.execute(sql).fetch_arrow_table().to_pylist()
    for row, text in zip(oracle, sample_table["text"].to_pylist()):
        mine = ts.text_stats_row(text)
        assert row["lang_pred"] == ts.lang_id(text), text
        assert row["fp"] == ts.fingerprint(text), text
        assert row["tc"] == mine["n_tokens"]
        for k in ("n_chars", "n_tokens", "n_alpha", "n_stop_en",
                  "alpha_ratio", "stopword_ratio", "mean_token_len"):
            assert row[k] == mine[k], (text, k)


def test_batch_ops_roundtrip(ray_session):
    import ray.data

    t = pa.table({"doc_id": [1, 2], "text": ["the cat and dog", "el la de que y en"]})
    ds = ray.data.from_arrow(t)
    out = (
        ds.map_batches(ts.add_textstats, batch_format="pyarrow")
        .map_batches(ts.add_lang_id, batch_format="pyarrow")
        .map_batches(ts.add_fingerprint, batch_format="pyarrow")
    )
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["lang_pred"] == "en"
    assert rows[1]["lang_pred"] == "es"
    assert rows[0]["fp"] == ts.fingerprint("the cat and dog")
    assert rows[0]["n_tokens"] == 4
