"""§2.10 extension surface — custom content-type sniffers + route handlers
(the engine analogue of the reference's plugin install/render hooks,
apps/search/src/searchPlugin.tsx:38-56, targetPageFilter useSearch.ts:118-120)."""

import pyarrow as pa
import pytest

from janet_ray.pipelines.extract import build_extract_pipeline
from janet_ray.stages.extract import ExtractStage
from janet_ray.stages.router import make_sniffer, sniff_routes

JMARK_MAGIC = b"JMARK\n"


def is_jmark(prefix: bytes) -> bool:
    return prefix.startswith(JMARK_MAGIC)


def jmark_handler(payload: bytes, hint_text):
    body = payload[len(JMARK_MAGIC):].decode("utf-8")
    return body, [{"page": 0, "start": 0, "end": len(body), "kind": "jmark"}], 1


def _batch(payloads):
    n = len(payloads)
    return pa.table({
        "url": pa.array([f"https://x.example/{i}" for i in range(n)], pa.string()),
        "warc_ts": pa.array([0] * n, pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array([None] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })


def test_custom_sniffer_routes_before_builtins():
    b = _batch([JMARK_MAGIC + b"custom body", b"%PDF-1.7\nrest",
                b"<html><p>x</p></html>"])
    routed = sniff_routes(b, custom_sniffers=[("jmark", is_jmark)])
    assert routed["route"].to_pylist() == ["jmark", "pdf", "html"]
    # without the sniffer the same payload is unrecognized
    assert sniff_routes(b)["route"].to_pylist()[0] == "error"


def test_route_handler_extracts_custom_format():
    b = sniff_routes(_batch([JMARK_MAGIC + b"hello custom world"]),
                     custom_sniffers=[("jmark", is_jmark)])
    stage = ExtractStage(route_handlers={"jmark": jmark_handler})
    row = stage(b).to_pandas().iloc[0]
    assert row["success"] and row["route"] == "jmark"
    assert row["text"] == "hello custom world"
    assert row["spans"][0]["kind"] == "jmark"


def test_handler_exception_is_error_row():
    def bad_handler(payload, hint):
        raise ValueError("corrupt jmark")

    b = sniff_routes(_batch([JMARK_MAGIC + b"x"]),
                     custom_sniffers=[("jmark", is_jmark)])
    row = ExtractStage(route_handlers={"jmark": bad_handler})(b).to_pandas().iloc[0]
    assert row["route"] == "error" and "corrupt jmark" in row["error"]


def test_custom_route_without_handler_is_error_row():
    b = sniff_routes(_batch([JMARK_MAGIC + b"x"]),
                     custom_sniffers=[("jmark", is_jmark)])
    row = ExtractStage()(b).to_pandas().iloc[0]
    assert row["route"] == "error" and row["error"] == "unrecognized payload"


def test_end_to_end_pipeline_with_extension(ray_session):
    import ray

    # locals (not module-level defs): cloudpickle ships them by VALUE, so Ray
    # workers don't need the tests/ dir on their import path
    def is_jmark_local(prefix: bytes) -> bool:
        return prefix.startswith(b"JMARK\n")

    def jmark_handler_local(payload: bytes, hint_text):
        body = payload[6:].decode("utf-8")
        return body, [{"page": 0, "start": 0, "end": len(body), "kind": "jmark"}], 1

    payloads = [JMARK_MAGIC + f"doc {i} body".encode() for i in range(6)]
    payloads.append(b"<!DOCTYPE html><html><body><article><h1>t</h1><p>"
                    + b"normal content word " * 30 + b"</p></article></body></html>")
    ds = ray.data.from_arrow(_batch(payloads))
    out = build_extract_pipeline(
        ds, dedupe=False, sort=True, concurrency=2,
        custom_sniffers=[("jmark", is_jmark_local)],
        route_handlers={"jmark": jmark_handler_local},
    ).to_pandas()
    jm = out[out["route"] == "jmark"]
    assert len(jm) == 6 and jm["success"].all()
    assert sorted(jm["text"]) == [f"doc {i} body" for i in range(6)]
    assert (out["route"] == "html").sum() == 1
