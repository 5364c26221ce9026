"""Unicode normalization (stages/textnorm.py): chain-order semantics,
batch-vs-scalar parity, DuckDB nfc_normalize dialect parity (hypothesis)."""

import unicodedata

import pytest

from janet_ray.stages.textnorm import normalize_column, normalize_text

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def test_scalar_chain():
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"       # both \r\n and \r
    assert normalize_text("x\x00\x07y\tz") == "xy\tz"      # tab survives
    assert normalize_text("café") == "café"     # NFC composes
    assert normalize_text(None) == ""
    # order: \r consumed as newline BEFORE the control strip
    assert normalize_text("a\rb") == "a\nb"


def test_batch_matches_scalar(ray_session):
    import ray

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["plain", "a\r\nb", "café bar", "ctl\x1fhere", ""])]
    out = (normalize_column(ray.data.from_items(rows)).to_pandas()
           .set_index("doc_id"))
    for r in rows:
        assert out.loc[r["doc_id"], "text_norm"] == normalize_text(r["text"])
        assert bool(out.loc[r["doc_id"], "changed"]) == (
            normalize_text(r["text"]) != r["text"])


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis unavailable")
@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=40))
def test_duckdb_nfc_parity(s):
    """DuckDB nfc_normalize must agree with Python NFC on arbitrary
    non-surrogate text (the oracle's load-bearing assumption)."""
    import duckdb

    # chr(0) is not representable in DuckDB varchar literals; the chain
    # strips C0 controls before NFC anyway, so compare post-strip inputs
    from janet_ray.stages.textnorm import _CONTROL_RE, _NEWLINE_RE

    t = _CONTROL_RE.sub("", _NEWLINE_RE.sub("\n", s))
    got = duckdb.connect().execute(
        "SELECT nfc_normalize(?)", [t]).fetchone()[0]
    assert got == unicodedata.normalize("NFC", t)
