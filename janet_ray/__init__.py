"""janet_ray — a Ray-Data-native web-scale main-content extraction engine.

Public API (stable surface a reference user migrates to):

    from janet_ray import build_extract_pipeline, run_partitioned, read_output
    from janet_ray.sources.warc import read_warc
    from janet_ray.stages import dedup, similarity, textstats, media, joins

Attribute access is LAZY (PEP 562): importing ``janet_ray`` — or a
dependency-free submodule like ``janet_ray.sources.warc`` — does not pull in
``ray.data``. Library code NEVER calls ray.init()/ray.shutdown(); the caller
(CLI, bench, tests, the graft driver) owns the Ray session.
"""

_EXPORTS = {
    "build_extract_pipeline": ("janet_ray.pipelines.extract", "build_extract_pipeline"),
    "dedupe_last_wins": ("janet_ray.pipelines.extract", "dedupe_last_wins"),
    "run_metrics": ("janet_ray.pipelines.extract", "run_metrics"),
    "run_partitioned": ("janet_ray.pipelines.checkpoint", "run_partitioned"),
    "run_incremental": ("janet_ray.pipelines.checkpoint", "run_incremental"),
    "read_output": ("janet_ray.pipelines.checkpoint", "read_output"),
    "group_topk": ("janet_ray.stages.rank", "group_topk"),
    "distributed_quantiles": ("janet_ray.stages.stats", "distributed_quantiles"),
    "distinct_count": ("janet_ray.stages.stats", "distinct_count"),
    "search_highlights": ("janet_ray.stages.highlights", "search_highlights"),
    "build_inverted_index": ("janet_ray.stages.index", "build_inverted_index"),
    "build_index_segments": ("janet_ray.stages.index", "build_index_segments"),
    "index_lookup": ("janet_ray.stages.index", "index_lookup"),
    "index_lookup_bm25": ("janet_ray.stages.index", "index_lookup_bm25"),
    "pack_sequences": ("janet_ray.stages.pack", "pack_sequences"),
    "winnow_fingerprints": ("janet_ray.stages.winnow", "winnow_fingerprints"),
    "winnow_neardup_pairs": ("janet_ray.stages.winnow", "winnow_neardup_pairs"),
    "repetition_stats": ("janet_ray.stages.repetition", "repetition_stats"),
    "pii_scrub": ("janet_ray.stages.pii", "pii_scrub"),
    "decontaminate": ("janet_ray.stages.decontam", "decontaminate"),
    "quantile_buckets": ("janet_ray.stages.bucketing", "quantile_buckets"),
    "build_bloom": ("janet_ray.stages.bloom", "build_bloom"),
    "bloom_filter_new": ("janet_ray.stages.bloom", "bloom_filter_new"),
    "distributed_kmeans": ("janet_ray.stages.cluster", "distributed_kmeans"),
    "kmeans_assign": ("janet_ray.stages.cluster", "kmeans_assign"),
    "extract_links": ("janet_ray.stages.links", "extract_links"),
    "pagerank": ("janet_ray.stages.graph", "pagerank"),
    "hits": ("janet_ray.stages.graph", "hits"),
    "anchor_corpus": ("janet_ray.stages.links", "anchor_corpus"),
    "anti_join_values": ("janet_ray.stages.frontier", "anti_join_values"),
    "crawl_frontier": ("janet_ray.stages.frontier", "crawl_frontier"),
    "train_bpe": ("janet_ray.stages.bpe", "train_bpe"),
    "paragraph_dedup": ("janet_ray.stages.paradedup", "paragraph_dedup"),
    "classify": ("janet_ray.stages.classifier", "classify"),
    "merge_segments": ("janet_ray.stages.index", "merge_segments"),
    "hll_build": ("janet_ray.stages.sketch", "hll_build"),
    "hll_distinct": ("janet_ray.stages.sketch", "hll_distinct"),
    "dd_build": ("janet_ray.stages.ddsketch", "dd_build"),
    "dd_quantiles": ("janet_ray.stages.ddsketch", "dd_quantiles"),
    "cms_build": ("janet_ray.stages.cms", "cms_build"),
    "cms_query": ("janet_ray.stages.cms", "cms_query"),
    "normalize_column": ("janet_ray.stages.textnorm", "normalize_column"),
    "lookup_url": ("janet_ray.pipelines.checkpoint", "lookup_url"),
    "canonicalize_urls": ("janet_ray.stages.urlnorm", "canonicalize_urls"),
    "canonical_url": ("janet_ray.stages.urlnorm", "canonical_url"),
    "shared_token_spans": ("janet_ray.stages.spans", "shared_token_spans"),
    "cut_duplicate_spans": ("janet_ray.stages.spans", "cut_duplicate_spans"),
    "word_frequencies": ("janet_ray.stages.bpe", "word_frequencies"),
    "encode_corpus": ("janet_ray.stages.bpe", "encode_corpus"),
    "drop_empty_blocks": ("janet_ray.stages.joins", "drop_empty_blocks"),
    "row_deadline": ("janet_ray.functions.deadline", "row_deadline"),
    "retry_with_backoff": ("janet_ray.functions.retry", "retry_with_backoff"),
    "PAGES_SCHEMA": ("janet_ray.schemas", "PAGES_SCHEMA"),
    "EXTRACTED_SCHEMA": ("janet_ray.schemas", "EXTRACTED_SCHEMA"),
    "SPAN_TYPE": ("janet_ray.schemas", "SPAN_TYPE"),
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    try:
        module, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module 'janet_ray' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)
