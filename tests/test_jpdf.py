import pytest

from janet_ray.formats import jpdf


def test_text_page_roundtrip():
    doc = jpdf.encode([{"items": [(10, 20, "Hello"), (60, 20, "World")]}])
    pages = jpdf.parse(doc)
    assert pages[0]["kind"] == "text"
    assert pages[0]["items"] == [(10, 20, "Hello"), (60, 20, "World")]


def test_scan_page_roundtrip_inverts_wrap():
    text = "Notice of Cancellation Policy Number 612266004 FEBRUARY 25, 2024 Page 1"
    doc = jpdf.encode([{"scan": text}])
    page = jpdf.parse(doc)[0]
    decoded = jpdf.decode_bitmap(page["packed"], page["width"], page["height"])
    assert decoded == "\n".join(jpdf.wrap_text(text))


def test_charset_roundtrip():
    text = jpdf.CHARSET
    doc = jpdf.encode([{"scan": text}])
    page = jpdf.parse(doc)[0]
    decoded = jpdf.decode_bitmap(page["packed"], page["width"], page["height"])
    assert decoded.replace("\n", "") == text.replace(" ", " ")


def test_unknown_char_decodes_as_question_mark():
    doc = jpdf.encode([{"scan": "héllo"}])
    page = jpdf.parse(doc)[0]
    assert "?" in jpdf.decode_bitmap(page["packed"], page["width"], page["height"])


def test_page_count_probe():
    doc = jpdf.encode([{"scan": "a"}, {"items": [(0, 0, "x")]}, {"scan": "b"}])
    assert jpdf.page_count(doc) == 3


@pytest.mark.parametrize(
    "payload",
    [
        b"not a pdf at all",
        jpdf.MAGIC + b"PG",  # truncated PG header
        jpdf.MAGIC + b"XX" + b"\x00" * 8,  # unknown tag
        jpdf.MAGIC,  # no trailer
        jpdf.MAGIC + b"SC\xff\xff\xff\xff",  # truncated bitmap
    ],
)
def test_malformed_raises_jpdferror(payload):
    with pytest.raises(jpdf.JPdfError):
        jpdf.parse(payload)


def test_wrap_text_hard_splits_overlong_tokens():
    lines = jpdf.wrap_text("x" * 95)
    assert lines == ["x" * 40, "x" * 40, "x" * 15]
