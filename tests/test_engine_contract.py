"""OcrEngine adapter conformance suite (VERDICT r04 #6).

The sandbox cannot run real codecs (no pdfium/tesseract/PIL — SURVEY.md
§7.0), so the production integration seam is the ``OcrEngine`` interface
(stages/ocr.py). This module IS the written adapter contract: a reusable
check-list any production engine (Tesseract, a Vision-API client, pdfium
raster + OCR subprocess) must pass before being dropped into
``ExtractStage(engine_factory=...)``. Wire a new engine by appending its
factory to ``CONFORMING_FACTORIES`` — every contract test parametrizes
over that list.

Contract points, each mapped to the reference behavior it preserves
(apps/ocr/src/lib/ocr-utils.ts:88-157, ocr-controller.ts:120-131,
apps/legacy/src/services/ocr.ts:40-88):

  C1  warm-state construction: the factory is the expensive step and the
      instance is reusable across many decode calls (actor-pool `__init__`
      semantics — the Vision-client singleton intent, ocr-utils.ts:61-83);
  C2  decode_page returns ``str`` and is deterministic — byte-identical
      text for byte-identical input (the engine sits inside a byte-golden
      checkpoint/resume pipeline);
  C3  decode_page_stats returns ``(same text, confidence ∈ [0, 1])``
      (legacy ocr.ts:58 word-confidence mean);
  C4  failures are raised, never swallowed into empty strings — per-page
      failure accounting (``pageCount - pageData.length``,
      ocr-controller.ts:120-124) depends on the exception reaching
      ocr_document_stats;
  C5  the factory and its instances survive pickling (Ray ships the
      callable class to actors);
  C6  composability with RetryingEngine (transient-failure policy:
      3 retries, exp backoff 1s·2^k + ≤1s jitter, ocr-utils.ts:107-151)
      and with the per-row deadline (RowDeadlineExceeded must propagate
      through, never be retried).
"""

from __future__ import annotations

import pickle

import pytest

from janet_ray.formats import jpdf
from janet_ray.stages import ocr as ocr_mod

# Production adapters: append your factory here (a zero-arg callable
# returning an OcrEngine) and run this file. Everything in
# CONFORMING_FACTORIES must pass C1-C5; C6 is wrapper-level and runs once.
CONFORMING_FACTORIES = [
    ocr_mod.GlyphGridEngine,
    lambda: ocr_mod.RetryingEngine(ocr_mod.GlyphGridEngine(), sleep=lambda s: None),
]
_IDS = ["GlyphGridEngine", "RetryingEngine(GlyphGridEngine)"]


def _sample_page() -> tuple[bytes, int, int]:
    """A real scan page from the deterministic jpdf format."""
    payload = jpdf.encode([{"scan": "conformance probe page one\nwith two lines"}])
    page = jpdf.parse(payload)[0]
    assert page["kind"] == "scan"
    return page["packed"], page["width"], page["height"]


@pytest.mark.parametrize("factory", CONFORMING_FACTORIES, ids=_IDS)
def test_c1_warm_instance_is_reusable(factory):
    engine = factory()
    packed, w, h = _sample_page()
    first = engine.decode_page(packed, w, h)
    # same instance, many calls — no per-call construction, no state decay
    for _ in range(5):
        assert engine.decode_page(packed, w, h) == first


@pytest.mark.parametrize("factory", CONFORMING_FACTORIES, ids=_IDS)
def test_c2_decode_is_deterministic_text(factory):
    packed, w, h = _sample_page()
    a = factory().decode_page(packed, w, h)
    b = factory().decode_page(packed, w, h)
    assert isinstance(a, str) and a == b
    assert "conformance probe page one" in a


@pytest.mark.parametrize("factory", CONFORMING_FACTORIES, ids=_IDS)
def test_c3_stats_confidence_contract(factory):
    engine = factory()
    packed, w, h = _sample_page()
    text, conf = engine.decode_page_stats(packed, w, h)
    assert text == engine.decode_page(packed, w, h)
    assert isinstance(conf, float) and 0.0 <= conf <= 1.0
    # a fully-recognized page reports full confidence
    assert conf == 1.0


def test_c3_partial_confidence_below_one():
    # corrupt one glyph cell: confidence must drop below 1, stay >= 0,
    # and the text must still come back for the recognized glyphs
    engine = ocr_mod.GlyphGridEngine()
    packed, w, h = _sample_page()
    grid = bytearray(packed)
    grid[: jpdf.GLYPH_W * jpdf.GLYPH_H // 8 + 1] = b"\xff" * (
        jpdf.GLYPH_W * jpdf.GLYPH_H // 8 + 1)
    text, conf = engine.decode_page_stats(bytes(grid), w, h)
    assert 0.0 <= conf < 1.0
    assert isinstance(text, str)


@pytest.mark.parametrize("factory", CONFORMING_FACTORIES, ids=_IDS)
def test_c4_malformed_input_raises(factory):
    engine = factory()
    with pytest.raises(Exception):
        engine.decode_page(b"\x00", 3, -1)


@pytest.mark.parametrize("factory", CONFORMING_FACTORIES, ids=_IDS)
def test_c5_factory_and_instance_pickle(factory):
    import ray.cloudpickle as cp

    packed, w, h = _sample_page()
    want = factory().decode_page(packed, w, h)
    # the factory ships to actors via cloudpickle...
    rebuilt_factory = cp.loads(cp.dumps(factory))
    assert rebuilt_factory().decode_page(packed, w, h) == want
    # ...and a warm instance must survive a round-trip too (task retries)
    inst = cp.loads(cp.dumps(factory()))
    assert inst.decode_page(packed, w, h) == want
    # plain pickle for the non-closure engine classes
    assert pickle.loads(pickle.dumps(ocr_mod.GlyphGridEngine()))\
        .decode_page(packed, w, h) == want


# --------------------------------------------------------------- C6 wrappers

class _FlakyEngine(ocr_mod.OcrEngine):
    """Fails transiently N times then delegates — the production failure
    mode RetryingEngine exists for."""

    def __init__(self, failures: int):
        self._inner = ocr_mod.GlyphGridEngine()
        self.remaining = failures
        self.calls = 0

    def decode_page(self, packed, w, h):
        self.calls += 1
        if self.remaining > 0:
            self.remaining -= 1
            raise RuntimeError("transient OCR backend failure")
        return self._inner.decode_page(packed, w, h)


def test_c6_retry_recovers_within_budget_and_pins_backoff():
    import random

    packed, w, h = _sample_page()
    slept: list[float] = []
    flaky = _FlakyEngine(failures=3)
    eng = ocr_mod.RetryingEngine(flaky, sleep=slept.append,
                                 rng=random.Random(7))
    text = eng.decode_page(packed, w, h)
    assert "conformance probe" in text and flaky.calls == 4
    # the reference schedule: base 1s * 2^k plus <= 1s jitter, 3 sleeps
    assert len(slept) == 3
    for k, s in enumerate(slept):
        assert 2 ** k <= s <= 2 ** k + 1.0


def test_c6_exhausted_retries_propagate_original_error():
    packed, w, h = _sample_page()
    eng = ocr_mod.RetryingEngine(_FlakyEngine(failures=10),
                                 sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="transient"):
        eng.decode_page(packed, w, h)


def test_c6_deadline_expiry_is_never_retried():
    from janet_ray.functions.deadline import RowDeadlineExceeded

    class _HungEngine(ocr_mod.OcrEngine):
        def __init__(self):
            self.calls = 0

        def decode_page(self, packed, w, h):
            self.calls += 1
            raise RowDeadlineExceeded("row exceeded wall-clock deadline")

    hung = _HungEngine()
    eng = ocr_mod.RetryingEngine(hung, sleep=lambda s: None)
    packed, w, h = _sample_page()
    with pytest.raises(RowDeadlineExceeded):
        eng.decode_page(packed, w, h)
    assert hung.calls == 1  # one shot — the itimer is already consumed


def test_c6_failure_accounting_through_ocr_document_stats():
    """The C4 raise is what per-page failure slots are built from: a doc
    whose middle page fails keeps page order, counts one failed page,
    averages confidence over the surviving scan pages only, and the
    strict gate turns the same state into OcrStrictError."""

    class _MidPageFails(ocr_mod.OcrEngine):
        def __init__(self):
            self._inner = ocr_mod.GlyphGridEngine()
            self._n = 0

        def decode_page(self, packed, w, h):
            self._n += 1
            if self._n == 2:
                raise RuntimeError("page 2 backend failure")
            return self._inner.decode_page(packed, w, h)

        def decode_page_stats(self, packed, w, h):
            return self.decode_page(packed, w, h), 0.5

    payload = jpdf.encode([{"scan": "page one text"}, {"scan": "page two text"},
                           {"scan": "page three text"}])
    pages = jpdf.parse(payload)
    text, spans, n_pages, n_failed, conf = ocr_mod.ocr_document_stats(
        pages, _MidPageFails())
    assert n_pages == 3 and n_failed == 1
    assert "page one text" in text and "page three text" in text
    assert "page two text" not in text
    assert conf == pytest.approx(0.5)
    with pytest.raises(ocr_mod.OcrStrictError):
        ocr_mod.ocr_document_stats(pages, _MidPageFails(), strict=True)


def test_engine_factory_reaches_the_actor_pool(ray_session):
    import pyarrow as pa
    import ray.data

    from janet_ray.pipelines.extract import build_extract_pipeline

    class _ShoutingEngine(ocr_mod.OcrEngine):
        """Conforming marker engine: identical geometry, uppercased text —
        proves a custom adapter actually drives the scan route end-to-end.
        Defined INSIDE the test so cloudpickle ships it by VALUE: a module
        top-level class pickles by reference, and Ray workers cannot import
        the tests package — the actor would crash-loop on deserialization."""

        def __init__(self):
            self._inner = ocr_mod.GlyphGridEngine()

        def decode_page(self, packed, w, h):
            return self._inner.decode_page(packed, w, h).upper()

    payload = jpdf.encode([{"scan": "plumbed through the pool"}])
    ds = ray.data.from_arrow(pa.table({
        "url": ["http://e.com/scan1"],
        "html": pa.array([payload], pa.large_binary()),
        "warc_ts": [1],
    }))
    out = build_extract_pipeline(
        ds, concurrency=1, sort=False, dedupe=False,
        engine_factory=lambda: ocr_mod.RetryingEngine(
            _ShoutingEngine(), sleep=lambda s: None)).to_pandas()
    assert len(out) == 1
    assert "PLUMBED THROUGH THE POOL" in out.iloc[0]["text"]
