"""janet_ray — a from-scratch Ray-Data-native main-content extraction engine.

Capabilities modeled on the reference ``jasonLaster/janet`` (see SURVEY.md for the
operator inventory with file:line citations), re-expressed as idiomatic Ray Data:
``ray.data.read_parquet`` over Common-Crawl-style page tables
``(url, warc_ts, html:binary, text, lang)`` → zero-copy Arrow ``map_batches`` stages
(byte sniffer router → HTML boilerplate-strip / PDF layout parse / OCR actor pool) →
``groupby(url)`` dedupe → ``sort(url)`` → partitioned Parquet with lineage manifests.

No code is copied from the reference; it defines WHAT is computed (routing semantics,
join/trim rules, span shapes, filename format), not HOW.
"""

__version__ = "0.1.0"
