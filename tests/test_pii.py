"""PII redaction (stages/pii.py): vectorized scrub semantics, redaction-order
pinning, RE2 parity with the DuckDB twin, distributed == local."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from janet_ray.stages.pii import add_pii_scrub, pii_scrub, pii_sql


def _scrub_one(text: str):
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text], pa.string())})
    out = add_pii_scrub(t)
    return (out["text_redacted"][0].as_py(), out["n_emails"][0].as_py(),
            out["n_phones"][0].as_py())


def test_email_and_phone():
    red, ne, np_ = _scrub_one("mail a.b+c@foo-bar.org or call +1-555-012399 ok")
    assert red == "mail <EMAIL> or call <PHONE> ok"
    assert (ne, np_) == (1, 1)


def test_no_pii_passthrough():
    red, ne, np_ = _scrub_one("nothing to see here 123")
    assert red == "nothing to see here 123"
    assert (ne, np_) == (0, 0)


def test_order_pinned_email_digits_not_phone():
    # digits inside an e-mail local part must not later count as a phone:
    # the e-mail is redacted FIRST and the token has no digits
    red, ne, np_ = _scrub_one("x 12345678@nums.io y")
    assert red == "x <EMAIL> y"
    assert (ne, np_) == (1, 0)


def test_multiple_matches():
    red, ne, np_ = _scrub_one("a@b.co c@d.eu 0-1234567-9 12-34-56-78")
    assert ne == 2 and np_ == 2
    assert red == "<EMAIL> <EMAIL> <PHONE> <PHONE>"


_CHUNK = st.sampled_from([
    "plain words", "a@b.co", "user.name+tag@foo.example.org", "12345678",
    "+44-1234-5678", "no@tld", "@", "a@b", "555-0100", "x-1-2-3-4-5-6-7-8",
    "dot.end@site.com.", "", " ",
])


@settings(max_examples=80, deadline=None)
@given(st.lists(_CHUNK, max_size=8).map(" ".join))
def test_sql_parity(text):
    """Arrow RE2 kernels == DuckDB RE2 kernels on the same constants."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 7 AS doc_id, ? AS text",
                [text])
    row = con.execute(pii_sql()).fetchone()
    red, ne, np_ = _scrub_one(text)
    assert (row[1], row[2], row[3]) == (red, ne, np_)


def test_distributed_matches_local(ray_session):
    import ray

    texts = ["mail me: a@b.co", "call +1-555-012399", "clean", ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    out = pii_scrub(ds).to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        red, ne, np_ = _scrub_one(t)
        assert out.loc[i, "text_redacted"] == red
        assert out.loc[i, "n_emails"] == ne
        assert out.loc[i, "n_phones"] == np_
