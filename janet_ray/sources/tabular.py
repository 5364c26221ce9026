"""JSONL / CSV page-source adapters (S1 'another source format').

Thin wrappers over Ray Data's native readers that normalize arbitrary column
names into the engine's pages schema. The payload column may arrive as base64
text (JSON/CSV can't carry raw bytes) — decoded vectorized per batch.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc

from janet_ray.schemas import PAGES_SCHEMA


def _normalize(batch: pa.Table, mapping: dict[str, str], payload_b64: bool) -> pa.Table:
    n = batch.num_rows

    def col(role, default_type):
        name = mapping.get(role)
        if name and name in batch.column_names:
            return batch[name]
        return pa.nulls(n, default_type)

    url = pc.cast(col("url", pa.string()), pa.string())
    ts = col("warc_ts", pa.timestamp("us"))
    if pa.types.is_string(ts.type):
        # per-row ISO-8601 parse (handles 'Z', offsets, fractional seconds,
        # date-only, and MIXED formats within one column — real JSON exports
        # are rarely uniform); tz-aware values normalize to UTC-naive
        from datetime import datetime, timezone

        def parse_one(s):
            if s is None:
                return None
            try:
                dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
            except ValueError:
                return None
            if dt.tzinfo is not None:
                dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
            return dt

        ts = pa.array([parse_one(s) for s in ts.to_pylist()], pa.timestamp("us"))
    else:
        ts = pc.cast(ts, pa.timestamp("us"))
    raw = col("html", pa.binary())
    if payload_b64:
        payload = pa.array(
            [base64.b64decode(v) if v else None for v in raw.to_pylist()],
            pa.binary(),
        )
    else:
        payload = pc.cast(raw, pa.binary())
    text = pc.cast(pc.coalesce(col("text", pa.string()), pa.scalar("")), pa.string())
    lang = pc.cast(pc.coalesce(col("lang", pa.string()), pa.scalar("")), pa.string())
    return pa.table(
        {"url": url, "warc_ts": ts, "html": payload, "text": text, "lang": lang},
        schema=PAGES_SCHEMA,
    )


def read_pages_json(paths, *, mapping: dict[str, str] | None = None,
                    payload_b64: bool = True, **kw) -> "ray.data.Dataset":
    """JSONL files → pages Dataset. ``mapping`` maps schema roles
    (url/warc_ts/html/text/lang) to source field names."""
    import ray.data

    m = mapping or {c: c for c in PAGES_SCHEMA.names}
    ds = ray.data.read_json(paths, **kw)
    return ds.map_batches(lambda t: _normalize(t, m, payload_b64),
                          batch_format="pyarrow", zero_copy_batch=True)


def read_pages_csv(paths, *, mapping: dict[str, str] | None = None,
                   payload_b64: bool = True, **kw) -> "ray.data.Dataset":
    import ray.data

    m = mapping or {c: c for c in PAGES_SCHEMA.names}
    ds = ray.data.read_csv(paths, **kw)
    return ds.map_batches(lambda t: _normalize(t, m, payload_b64),
                          batch_format="pyarrow", zero_copy_batch=True)
