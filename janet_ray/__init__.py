"""janet_ray — a Ray-Data-native web-scale main-content extraction engine.

Public API (stable surface a reference user migrates to):

    from janet_ray import build_extract_pipeline, run_partitioned, read_output
    from janet_ray.sources.warc import read_warc
    from janet_ray.stages import dedup, similarity, textstats, media, joins

Library code NEVER calls ray.init()/ray.shutdown(); the caller (CLI, bench,
tests, the graft driver) owns the Ray session.
"""

from janet_ray.pipelines.checkpoint import read_output, run_partitioned
from janet_ray.pipelines.extract import (
    build_extract_pipeline,
    dedupe_last_wins,
    run_metrics,
)
from janet_ray.schemas import EXTRACTED_SCHEMA, PAGES_SCHEMA, SPAN_TYPE

__all__ = [
    "build_extract_pipeline",
    "dedupe_last_wins",
    "run_metrics",
    "run_partitioned",
    "read_output",
    "PAGES_SCHEMA",
    "EXTRACTED_SCHEMA",
    "SPAN_TYPE",
]
