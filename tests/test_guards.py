"""SURVEY §4 timeouts + A2/A5 — per-row deadline, strict failed-page gate,
OCR confidence (reference: pdf.ts:61-70 / ocr-utils.ts:115-117 timeouts,
ocr-controller.ts:120-131 strict gate, ocr.ts:58 confidence)."""

import time

import numpy as np
import pyarrow as pa
import pytest

from janet_ray.formats import jpdf
from janet_ray.functions.deadline import RowDeadlineExceeded, row_deadline
from janet_ray.stages import ocr as ocr_mod
from janet_ray.stages.extract import ExtractStage
from janet_ray.stages.router import sniff_routes


def _pages_batch(payloads, texts=None):
    n = len(payloads)
    t = pa.table({
        "url": pa.array([f"https://x.example/{i}" for i in range(n)], pa.string()),
        "warc_ts": pa.array([0] * n, pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array(texts or [None] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    return sniff_routes(t)


# ------------------------------------------------------------------ deadline

def test_row_deadline_interrupts_pure_python_loop():
    t0 = time.monotonic()
    with pytest.raises(RowDeadlineExceeded):
        with row_deadline(0.2):
            while True:  # pathological row: unbounded pure-Python loop
                pass
    assert time.monotonic() - t0 < 5.0


def test_row_deadline_disarmed_none_and_zero():
    with row_deadline(None):
        assert True
    with row_deadline(0):
        assert True


def test_row_deadline_no_residual_timer():
    with pytest.raises(RowDeadlineExceeded):
        with row_deadline(0.1):
            time.sleep(5)
    time.sleep(0.25)  # an expired timer would fire here and kill the test


def test_row_deadline_interrupts_on_non_main_thread():
    """Ray 2.49 runs actor-pool map_batches UDFs on a non-main worker thread,
    where SIGALRM never fires (ADVICE r2 high finding) — the watchdog path must
    deliver the deadline there."""
    import threading

    result = {}

    def worker():
        t0 = time.monotonic()
        try:
            with row_deadline(0.2) as guard:
                result["armed"] = guard.armed
                while True:
                    pass
        except RowDeadlineExceeded as e:
            result["raised"] = True
            result["msg"] = str(e)
        result["elapsed"] = time.monotonic() - t0

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=10.0)
    assert not t.is_alive()
    assert result["armed"] and result["raised"]
    assert "deadline" in result["msg"]
    assert result["elapsed"] < 5.0


def test_row_deadline_thread_no_leak_into_next_row():
    """A deadline that expires right as the row finishes must not deliver its
    exception into subsequent rows (fired-but-undelivered cancel path)."""
    import threading

    errors = []

    def worker():
        try:
            # 200 quick rows, each armed with a deadline it just barely makes
            # or misses — any stale async exception surfaces in a later row
            for _ in range(200):
                try:
                    with row_deadline(0.002):
                        t0 = time.monotonic()
                        while time.monotonic() - t0 < 0.002:
                            pass
                except RowDeadlineExceeded:
                    pass  # expected for the rows that missed
            # a long undeadlined tail: a leaked exception would land here
            t0 = time.monotonic()
            while time.monotonic() - t0 < 0.3:
                pass
        except RowDeadlineExceeded:
            errors.append("stale deadline leaked into undeadlined code")

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=30.0)
    assert not t.is_alive()
    assert errors == []


def test_row_deadline_fired_cancelled_when_body_raises_own_exception(monkeypatch):
    """If the row body raises its OWN exception in the same instant the
    watchdog fires, the pending (undelivered) async RowDeadlineExceeded must
    be cancelled — otherwise it lands at an arbitrary later bytecode in the
    thread (ADVICE r03). Deterministic: stub delivery so 'fired' never turns
    into 'delivered', then check __exit__ cancels on a foreign exception."""
    import threading

    from janet_ray.functions import deadline as dl

    cancelled = []
    monkeypatch.setattr(dl, "_async_raise", lambda ident: None)
    monkeypatch.setattr(dl, "_async_cancel", lambda ident: cancelled.append(ident))

    result = {}

    def worker():
        try:
            with dl.row_deadline(0.01):
                time.sleep(0.1)  # let the watchdog fire (delivery stubbed out)
                raise ValueError("row's own error")
        except ValueError:
            result["own_exc"] = True

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=10.0)
    assert not t.is_alive()
    assert result.get("own_exc"), "body's own exception must propagate"
    assert cancelled, ("pending async deadline exception must be cancelled "
                       "when the body raises a non-deadline exception")


class HangingEngine(ocr_mod.OcrEngine):
    """Wedges forever on decode — the synthetic pathological document."""

    def decode_page(self, packed, width, height):
        while True:
            pass


def test_extract_stage_converts_hung_row_to_error_row():
    scan = jpdf.encode([{"scan": "will hang"}])
    ok_html = (b"<!DOCTYPE html><html><body><article><h1>t</h1><p>"
               + b"fine content word " * 30 + b"</p></article></body></html>")
    stage = ExtractStage(engine_factory=HangingEngine, deadline_s=0.3)
    t0 = time.monotonic()
    out = stage(_pages_batch([scan, ok_html])).to_pandas()
    assert time.monotonic() - t0 < 10.0
    hung = out.iloc[0]
    assert hung["route"] == "error" and not hung["success"]
    assert "deadline" in hung["error"]
    assert out.iloc[1]["success"]  # the batch survived the poison row


def test_deadline_fires_through_real_actor_pool(ray_session):
    """End-to-end proof (ADVICE r2 high finding): the deadline must fire inside
    an actual Ray actor-pool map_batches stage, where the UDF runs on a
    non-main worker thread and SIGALRM is dead. Under the old SIGALRM-only
    guard this test hangs forever."""
    import ray

    from janet_ray.pipelines.extract import build_extract_pipeline

    def _hang_handler(payload, hint_text):
        # §2.10 route handler that wedges — the poison row. Defined INSIDE the
        # test: cloudpickle serializes nested functions by value, while a
        # module-level function would ship by reference to the un-importable
        # `test_guards` module and kill every actor at deserialization.
        while True:
            pass

    scan = jpdf.encode([{"scan": "routed to the hanging handler"}])
    ok_html = (b"<!DOCTYPE html><html><body><article><h1>t</h1><p>"
               + b"fine content word " * 30 + b"</p></article></body></html>")
    pages = pa.table({
        "url": pa.array(["https://x.example/hang", "https://x.example/ok"],
                        pa.string()),
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([scan, ok_html], pa.binary()),
        "text": pa.array([None, None], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    })
    out = build_extract_pipeline(
        ray.data.from_arrow(pages), deadline_s=0.5, concurrency=(1, 2),
        dedupe=False, sort=False, route_handlers={"pdf": _hang_handler},
    ).take_all()
    rows = {r["url"]: r for r in out}
    hung = rows["https://x.example/hang"]
    assert hung["route"] == "error" and not hung["success"]
    assert "deadline" in hung["error"]
    assert rows["https://x.example/ok"]["success"]


# ---------------------------------------------------------------- strict gate

class FlakyEngine(ocr_mod.OcrEngine):
    """Fails decode on every second page."""

    def __init__(self):
        self.calls = 0

    def decode_page_stats(self, packed, width, height):
        self.calls += 1
        if self.calls % 2 == 0:
            raise RuntimeError("synthetic page failure")
        return jpdf.decode_bitmap(packed, width, height), 0.9


def test_ocr_document_stats_counts_failed_pages():
    pages = jpdf.parse(jpdf.encode([{"scan": "page one"}, {"scan": "page two"},
                                    {"scan": "page three"}]))
    text, spans, n, n_failed, conf = ocr_mod.ocr_document_stats(pages, FlakyEngine())
    assert n == 3 and n_failed == 1
    assert "page one" in text and "page three" in text and "page two" not in text
    assert conf == pytest.approx(0.9)
    # the failed page contributes an empty slot but order is preserved
    assert [s["page"] for s in spans] == [0, 2]


def test_strict_gate_raises_and_stage_emits_error_row():
    pages = jpdf.parse(jpdf.encode([{"scan": "a"}, {"scan": "b"}]))
    with pytest.raises(ocr_mod.OcrStrictError):
        ocr_mod.ocr_document_stats(pages, FlakyEngine(), strict=True)

    scan = jpdf.encode([{"scan": "one"}, {"scan": "two"}])
    stage = ExtractStage(engine_factory=FlakyEngine, strict_ocr=True)
    out = stage(_pages_batch([scan])).to_pandas().iloc[0]
    assert out["route"] == "error" and "strict gate" in out["error"]

    lax = ExtractStage(engine_factory=FlakyEngine, strict_ocr=False)
    row = lax(_pages_batch([scan])).to_pandas().iloc[0]
    assert row["success"] and row["n_failed_pages"] == 1
    assert row["ocr_confidence"] == pytest.approx(0.9)


# ---------------------------------------------------------------- confidence

def test_glyph_engine_confidence_degrades_on_corruption():
    packed, w, h = jpdf.raster_page("hello world")
    text, conf = ocr_mod.GlyphGridEngine().decode_page_stats(packed, w, h)
    assert conf == 1.0 and text == "hello world"

    # corrupt one glyph cell: flip bits in the first cell's rows
    bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8)
                         .reshape(h, (w + 7) // 8), axis=1)[:, :w].astype(bool)
    bits[0:jpdf.GLYPH_H, 0:jpdf.GLYPH_W] = ~bits[0:jpdf.GLYPH_H, 0:jpdf.GLYPH_W]
    corrupted = np.packbits(bits, axis=1).tobytes()
    text2, conf2 = ocr_mod.GlyphGridEngine().decode_page_stats(corrupted, w, h)
    assert text2.startswith("?")
    assert 0.0 < conf2 < 1.0
    n_glyphs = sum(1 for c in "hello world" if c != " ")
    assert conf2 == pytest.approx((n_glyphs - 1) / n_glyphs)


def test_extract_stage_default_confidence_columns():
    """Clean OCR docs report confidence 1.0 and zero failed pages; html rows
    carry nulls (confidence is an OCR-route concept)."""
    scan = jpdf.encode([{"scan": "clean scan text"}])
    html = (b"<!DOCTYPE html><html><body><article><h1>t</h1><p>"
            + b"real content word " * 30 + b"</p></article></body></html>")
    out = ExtractStage()(_pages_batch([scan, html])).to_pandas()
    ocr_row = out[out["route"] == "ocr"].iloc[0]
    assert ocr_row["ocr_confidence"] == 1.0 and ocr_row["n_failed_pages"] == 0
    html_row = out[out["route"] == "html"].iloc[0]
    assert html_row["n_failed_pages"] == 0
    assert html_row["ocr_confidence"] is None or np.isnan(html_row["ocr_confidence"])


# ------------------------------------------------------------------- retries

def test_retry_with_backoff_schedule():
    """Delays follow base*2^k + jitter and the call succeeds on the last
    allowed attempt (3 retries — ocr-utils.ts:108-110)."""
    import random

    from janet_ray.functions.retry import retry_with_backoff

    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise ConnectionError("transient")
        return "ok"

    out = retry_with_backoff(flaky, retries=3, base_s=1.0, max_jitter_s=0.0,
                             sleep=delays.append, rng=random.Random(0))
    assert out == "ok" and calls["n"] == 4
    assert delays == [1.0, 2.0, 4.0]

    calls["n"] = 0
    with pytest.raises(ConnectionError):
        retry_with_backoff(flaky, retries=2, base_s=1.0, max_jitter_s=0.0,
                           sleep=lambda s: None)
    assert calls["n"] == 3  # initial + 2 retries


def test_retrying_engine_recovers_transient_failures():
    class TransientEngine(ocr_mod.OcrEngine):
        def __init__(self):
            self.calls = 0

        def decode_page_stats(self, packed, width, height):
            self.calls += 1
            if self.calls % 3 != 0:  # two failures, then success
                raise ConnectionError("flaky RPC")
            return jpdf.decode_bitmap(packed, width, height), 0.75

    inner = TransientEngine()
    eng = ocr_mod.RetryingEngine(inner, retries=3, base_s=0.0, max_jitter_s=0.0,
                                 sleep=lambda s: None)
    pages = jpdf.parse(jpdf.encode([{"scan": "retry me"}]))
    text, spans, n, n_failed, conf = ocr_mod.ocr_document_stats(pages, eng)
    assert text == "retry me" and n_failed == 0 and conf == 0.75
    assert inner.calls == 3


def test_retrying_engine_does_not_swallow_deadline():
    """RowDeadlineExceeded must pass through retry_with_backoff — retrying a
    deadline expiry would defeat the per-row guard (review r2 finding #1)."""
    from janet_ray.functions.deadline import RowDeadlineExceeded
    from janet_ray.functions.retry import retry_with_backoff

    calls = {"n": 0}

    def hung():
        calls["n"] += 1
        raise RowDeadlineExceeded("row exceeded 30s deadline")

    with pytest.raises(RowDeadlineExceeded):
        retry_with_backoff(hung, retries=3, sleep=lambda s: None)
    assert calls["n"] == 1  # no retry attempts

    # and end-to-end: a RetryingEngine-wrapped hanging engine still deadlines
    inner = HangingEngine()
    eng_factory = lambda: ocr_mod.RetryingEngine(HangingEngine(), retries=3,
                                                 base_s=0.0, sleep=lambda s: None)
    scan = jpdf.encode([{"scan": "will hang"}])
    stage = ExtractStage(engine_factory=eng_factory, deadline_s=0.3)
    t0 = time.monotonic()
    row = stage(_pages_batch([scan])).to_pandas().iloc[0]
    assert time.monotonic() - t0 < 10.0
    assert row["route"] == "error" and "deadline" in row["error"]


def test_confidence_mean_ignores_null_confidence_rows(ray_session):
    """run_metrics divides by rows that REPORT a confidence, not all ocr rows
    (review r2 finding #2). The glyph stage can't emit a null-confidence ocr
    row itself, but custom engines / future routes can — drive run_metrics
    directly with a schema-shaped table."""
    import ray

    from janet_ray.pipelines.extract import run_metrics
    from janet_ray.schemas import EXTRACTED_SCHEMA, SPAN_TYPE

    n = 3
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "host": pa.array(["h"] * n, pa.string()),
        "warc_ts": pa.array([0] * n, pa.timestamp("us")),
        "lang": pa.array(["en"] * n, pa.string()),
        "filename": pa.array(["f"] * n, pa.string()),
        "text": pa.array(["x"] * n, pa.string()),
        "spans": pa.array([[]] * n, pa.list_(SPAN_TYPE)),
        "route": pa.array(["ocr", "ocr", "html"], pa.string()),
        "success": pa.array([True] * n, pa.bool_()),
        "error": pa.array([""] * n, pa.string()),
        "n_pages": pa.array([1] * n, pa.int32()),
        "n_chars": pa.array([1] * n, pa.int64()),
        "n_failed_pages": pa.array([0, 1, 0], pa.int32()),
        "ocr_confidence": pa.array([1.0, None, None], pa.float64()),
    }, schema=EXTRACTED_SCHEMA)
    m = run_metrics(ray.data.from_arrow(t))
    assert m["ocr_confidence_mean"] == 1.0  # not 0.5 (null row excluded)
    assert m["failed_pages"] == 1
