"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → mixed-route
    CC-style pages → sniff → skewed actor-pool extraction → last-wins dedupe →
    stable sort. Returns the extracted Dataset."""
    import ray.data

    from janet_ray.pipelines.extract import build_extract_pipeline
    from janet_ray.sources import documents as docsrc

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.map_batches(docsrc.mixed_pages_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    return build_extract_pipeline(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 / §2.11."""
    from janet_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles (generated from the same constants as the Ray operators
    where possible — see janet_ray/stages/textstats.py). Keys absent here
    (extract_ocr_text, simhash_neardup, ivf_topk, ocr_word_boxes,
    embedding_neardup_ivf, searchable_artifact, ocr_highlights, lm_surprise)
    are non-SQL-expressible and take the driver's rows-only check."""
    from janet_ray.pipelines.queries import build_oracles

    return build_oracles()
