"""P9 filename derivation + P13 metadata heuristics + P12 tolerant parse
(LLM-fallback semantics mirrored from apps/legacy/tests/services/openai.test.ts:24-62:
any failure → identity)."""

from janet_ray.stages.metadata import extract_metadata, tolerant_json_extract
from janet_ray.stages.naming import derive_filename
from janet_ray.functions.text import (
    find_first_date,
    format_long_date,
    sanitize_filename,
    timestamp_slug,
    truncate_content,
)


TRAVELERS_TEXT = (
    "Notice of Cancellation TRAVELERS Policy Number 612266004 "
    "FEBRUARY 25, 2024 this notice is to inform you. Page 1"
)


def test_travelers_filename():
    assert (
        derive_filename("https://travelers.example/notice-0001", TRAVELERS_TEXT)
        == "2024-02-25 Travelers - Notice of Cancellation 612266004.pdf"
    )


def test_fallback_identity_on_no_text():
    assert derive_filename("https://x.example/path/report-77", None) == "report-77.pdf"
    assert derive_filename("https://x.example/path/doc.pdf", "") == "doc.pdf"


def test_fallback_identity_on_no_date():
    assert derive_filename("https://x.example/abc", "no dates here at all") == "abc.pdf"


def test_host_fallback_company():
    got = derive_filename("https://acme.example/d1", "Invoice No. A1234 dated 2024-03-05 total due")
    assert got == "2024-03-05 Acme - Invoice A1234.pdf"


def test_colloquial_org_name():
    got = derive_filename("https://x.example/d", "Mozilla Corporation W2 January 2, 2024 Form")
    assert got.startswith("2024-01-02 Mozilla - ")


def test_date_formats():
    assert find_first_date("due 02/25/2024 ok") == (2024, 2, 25)
    assert find_first_date("on 2024-02-25 ok") == (2024, 2, 25)
    assert find_first_date("FEBRUARY 25, 2024") == (2024, 2, 25)
    assert find_first_date("Feb 25th, 2024") == (2024, 2, 25)
    assert find_first_date("13/45/2024 nothing valid") is None
    # earliest mention wins
    assert find_first_date("2023-01-01 then FEBRUARY 25, 2024") == (2023, 1, 1)


def test_metadata_travelers():
    md, failed = extract_metadata(TRAVELERS_TEXT)
    assert not failed
    assert md["document_type"] == "notice of cancellation"
    assert md["issuing_organization"] == "Travelers"
    assert md["primary_date"] == "02/25/2024"
    assert md["account_details"] == "612266004"
    assert "Notice" in md["labels"] and "Insurance" in md["labels"]


def test_metadata_failure_flag():
    md, failed = extract_metadata("")
    assert failed and md["document_type"] is None
    md, failed = extract_metadata(None)
    assert failed


def test_metadata_money_and_holder():
    md, failed = extract_metadata(
        "Dear Jason Statement from Chase 01/05/2024 amount due $1,234.56 and $10.00 also Diana attended"
    )
    assert md["monetary_amounts"] == ["$1,234.56", "$10.00"]
    assert md["account_holder"] == "Jason"
    assert md["other_people"] == ["Diana"]


def test_tolerant_json_extract():
    assert tolerant_json_extract('{"a": 1}') == {"a": 1}
    assert tolerant_json_extract('noise before {"a": 1} after') == {"a": 1}
    assert tolerant_json_extract("not json at all") is None
    assert tolerant_json_extract("") is None


def test_scalar_functions():
    assert sanitize_filename("a b/c:d.pdf") == "a_b_c_d.pdf"
    assert truncate_content("x" * 20000) == "x" * 10000
    assert format_long_date("2024-02-25") == "February 25th, 2024"
    assert format_long_date("02/01/2024") == "February 1st, 2024"
    assert format_long_date("garbage") is None
    from datetime import datetime

    assert ":" not in timestamp_slug(datetime(2024, 1, 2, 3, 4, 5, 123000))
