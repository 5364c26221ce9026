"""The flagship Ray Data pipeline (SURVEY.md §3.1 re-expressed Ray-Data-first).

    read_parquet(pages)
      → map_batches(sniff_routes)                 stateless, 16B/row inspected
      → size-bucket split (skew: giant payloads get a small batch budget)
      → map_batches(ExtractStage, actor pool)     warm OCR engine per actor
      → union
      → groupby(url) last-wins dedupe             (J2/J4/A6: latest warc_ts per url)
      → sort(url)                                 stable output order

The reference's flagship is a strictly sequential per-document loop
(apps/legacy/rename.ts:77-90); here inter-document parallelism is the streaming
executor scheduling blocks (SURVEY.md §4), and the mappings-JSON checkpoint becomes
per-partition manifests (pipelines/checkpoint.py).

Skew handling (SURVEY.md §7.2.7): by default a SINGLE pass — giant payloads are
bounded by Ray's block-size targets (`DataContext.target_max_block_size` caps the
bytes a task holds) and the actor processes rows one at a time, so a megapage row
costs latency on its block only, which the streaming executor absorbs by scheduling
other blocks in parallel. With ``skew_split=True`` the routed dataset is
materialized ONCE into the object store and then split into a normal branch (large
``batch_size``) and a giant branch (``giant_batch_size`` rows/batch) — tighter p99
batch times at the price of a mid-pipeline materialization. Never filter the same
lazy lineage twice without materializing: Ray Data re-executes the whole upstream
read per consumer, doubling the 100 TB scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from janet_ray.stages.extract import ExtractStage
from janet_ray.stages.router import sniff_routes

DEFAULT_SKEW_THRESHOLD = 64 * 1024  # bytes of payload → "giant" bucket


def _with_size(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "payload_bytes", pc.cast(pc.binary_length(batch["html"]), pa.int64())
    )


def _drop_size(batch: pa.Table) -> pa.Table:
    return batch.drop_columns(["payload_bytes"])


def build_extract_pipeline(
    ds: "ray.data.Dataset",
    *,
    batch_size: int | None = None,  # None = whole Arrow blocks: batches stay
    # byte-bounded by DataContext.target_max_block_size (multi-MB payloads ⇒
    # few rows/batch automatically) and per-batch overhead amortizes — measured
    # 24% faster than batch_size=64 at sf0.1×256
    giant_batch_size: int = 4,
    concurrency=None,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    skew_split: bool = False,
    dedupe: bool = True,
    sort: bool = True,
    num_cpus: float | None = None,  # per-actor CPU reservation; >1 for engines
    # that thread internally (real Tesseract), <1 to oversubscribe cheap stages
    max_task_retries: int = 0,  # explicit actor-task retry budget. DEFAULT OFF:
    # Ray Data already re-executes failed tasks via its own lineage, and setting
    # max_task_retries>0 forces per-task result-lineage tracking that measured
    # ~60% slower on the sf0.1 headline (8.9s vs 5.5s). Turn on only for
    # engines with crashy native code; per-ROW transient retries are
    # RetryingEngine's job (stages/ocr.py, ocr-utils.ts:108-110 semantics)
    custom_sniffers=None,  # §2.10: [(route, predicate)] → router.make_sniffer
    route_handlers: dict | None = None,  # §2.10: {route: handler} → ExtractStage
    deadline_s: float | None = 30.0,  # per-row wall-clock budget (SURVEY §4)
    strict_ocr: bool = False,  # A2 strict gate: any failed page fails the doc
    dedupe_salt_parts: int = 0,  # hot-key salting for the url dedupe (ROADMAP 7)
    pre_routed: bool = False,  # input already carries the router's `route`
    # column (the persisted stage checkpoint, pipelines/checkpoint.py) — skip
    # the sniff stage instead of re-deriving it
    engine_factory=None,  # OcrEngine factory for the scan route; any impl
    # passing tests/test_engine_contract.py drops in here (production seam —
    # e.g. lambda: RetryingEngine(TesseractEngine()))
) -> "ray.data.Dataset":
    """pages Dataset → extracted Dataset (EXTRACTED_SCHEMA)."""
    from janet_ray.stages.router import make_sniffer

    if pre_routed:
        routed = ds
    else:
        sniffer = make_sniffer(custom_sniffers) if custom_sniffers else sniff_routes
        routed = ds.map_batches(sniffer, batch_format="pyarrow", zero_copy_batch=True)

    # An int concurrency becomes an autoscaling (1, c) pool: a fixed-size pool
    # would reserve every CPU up front and starve the read tasks feeding it — a
    # deadlock on small machines, a utilization hole on big ones (ray_guide "a pool
    # that reserves every CPU starves the read stage").
    if concurrency is None:
        # default: autoscale up to (cluster CPUs - 1), always leaving headroom for
        # the read/shuffle tasks that feed the pools
        import ray

        total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(1, total - 1))
    if isinstance(concurrency, int):
        concurrency = (1, max(1, concurrency))
    kw = {"concurrency": concurrency}
    if max_task_retries:
        kw["max_task_retries"] = max_task_retries
        kw["max_restarts"] = max_task_retries
    ctor: dict = {}
    if route_handlers:
        ctor["route_handlers"] = route_handlers
    if deadline_s != 30.0:
        ctor["deadline_s"] = deadline_s
    if strict_ocr:
        ctor["strict_ocr"] = strict_ocr
    if engine_factory is not None:
        ctor["engine_factory"] = engine_factory
    if ctor:
        kw["fn_constructor_kwargs"] = ctor
    if num_cpus is not None:
        kw["num_cpus"] = num_cpus

    if not skew_split:
        out = routed.map_batches(
            ExtractStage, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True, **kw,
        )
    else:
        # Materialize ONCE, then branch — two filters on the same lazy lineage
        # would re-execute the read + sniff per branch (2× the input scan).
        sized = routed.map_batches(
            _with_size, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        normal = sized.map_batches(
            lambda t: t.filter(pc.less_equal(t["payload_bytes"], skew_threshold)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(_drop_size, batch_format="pyarrow", zero_copy_batch=True)
        giant = sized.map_batches(
            lambda t: t.filter(pc.greater(t["payload_bytes"], skew_threshold)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).map_batches(_drop_size, batch_format="pyarrow", zero_copy_batch=True)
        extracted_n = normal.map_batches(
            ExtractStage, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True, **kw,
        )
        extracted_g = giant.map_batches(
            ExtractStage, batch_format="pyarrow", batch_size=giant_batch_size,
            zero_copy_batch=True, **kw,
        )
        out = extracted_n.union(extracted_g)

    if dedupe:
        out = dedupe_last_wins(out, salt_parts=dedupe_salt_parts)
    if sort:
        out = out.sort("url")
    return out


N_DEDUPE_PARTS = 64


def dedupe_last_wins(ds: "ray.data.Dataset",
                     salt_parts: int = 0) -> "ray.data.Dataset":
    """A6/J4 — exact per-url dedupe, keep the latest ``warc_ts`` (the keyed
    last-wins upsert of apps/legacy/src/utils/file.ts:40-49).

    One hash shuffle on a COARSE partition key (group-per-url would mean one
    Python call per url — 10^12 calls at design scale); inside a partition the
    per-url argmax is a vectorized sort + run-boundary take.

    ``salt_parts > 1`` arms HOT-KEY SALTING (ROADMAP item 7): a url holding a
    large share of the corpus (a crawl artifact re-fetched millions of times)
    would otherwise funnel every copy into one partition. The salted pre-pass
    spreads each url's copies across ``salt_parts`` partition keys
    (row-position salt), reduces each to its local last-wins survivor, and the
    ordinary shuffle then merges at most ``salt_parts`` rows per url. The
    idempotent reducer (max warc_ts) makes the two-stage fold exact."""
    from janet_ray.functions.partitioning import stable_hash_column, with_part

    def add_part(batch: pa.Table) -> pa.Table:
        return with_part(batch, ["url"], n_parts=N_DEDUPE_PARTS)

    def add_salted_part(batch: pa.Table) -> pa.Table:
        h = stable_hash_column(batch, ["url"])
        salt = np.arange(batch.num_rows, dtype=np.int64) % salt_parts
        part = ((h * np.int64(salt_parts) + salt) % N_DEDUPE_PARTS).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    if salt_parts > 1:
        pre = ds.map_batches(add_salted_part, batch_format="pyarrow",
                             zero_copy_batch=True)
        ds = pre.groupby("part").map_groups(_latest_per_url_kernel,
                                            batch_format="pyarrow")

    withp = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return withp.groupby("part").map_groups(_latest_per_url_kernel,
                                            batch_format="pyarrow")


def _latest_per_url_kernel(part: pa.Table) -> pa.Table:
    """Vectorized within-partition last-wins: sort by (url, warc_ts desc),
    keep the first row of each url run."""
    if part.num_rows <= 1:
        return part.drop_columns(["part"])
    idx = pc.sort_indices(
        part, sort_keys=[("url", "ascending"), ("warc_ts", "descending"),
                         ("route", "ascending")]
    )
    t = part.take(idx)
    urls = t["url"].to_numpy(zero_copy_only=False)
    first_of_run = np.concatenate([[True], urls[1:] != urls[:-1]])
    return t.filter(pa.array(first_of_run)).drop_columns(["part"])


def run_metrics(extracted: "ray.data.Dataset") -> dict:
    """A1 — run counters (rename.ts:74-95): processed / success / failed + per-route
    row counts. ONE pass: a per-route groupby carries all the sums, and the driver
    folds route rows into the totals (two separate aggregates would execute the
    upstream pipeline twice)."""
    from ray.data.aggregate import Count, Sum

    per_route = extracted.groupby("route").aggregate(
        Count(alias_name="rows"),
        Sum("success", alias_name="succeeded"),
        Sum("n_chars", alias_name="chars"),
        Sum("n_failed_pages", alias_name="failed_pages"),
        Sum("ocr_confidence", alias_name="conf_sum"),
        Count("ocr_confidence", ignore_nulls=True, alias_name="conf_n"),
    ).take_all()
    routes = {r["route"]: int(r["rows"]) for r in per_route}
    processed = sum(routes.values())
    succeeded = sum(int(r["succeeded"] or 0) for r in per_route)
    # A5: mean over rows that actually REPORT a confidence (an ocr row whose
    # scan pages all failed carries null and must not drag the mean down)
    ocr_rows = next((int(r["conf_n"] or 0) for r in per_route
                     if r["route"] == "ocr"), 0)
    ocr_conf = next((r["conf_sum"] for r in per_route if r["route"] == "ocr"), None)
    return {
        "processed": processed,
        "succeeded": succeeded,
        "failed": processed - succeeded,
        "total_chars": sum(int(r["chars"] or 0) for r in per_route),
        # A2: per-page failure accounting across the run (ocr-controller.ts:120-124)
        "failed_pages": sum(int(r["failed_pages"] or 0) for r in per_route),
        "ocr_confidence_mean": (float(ocr_conf) / ocr_rows
                                if ocr_rows and ocr_conf is not None else None),
        "routes": routes,
    }
