"""ROADMAP item 7 — salted hot-key dedupe: a single url holding 30%+ of the
corpus must not funnel into one partition (bounded partition sizes), and the
salted two-stage fold must be exactly equivalent to the unsalted path."""

import numpy as np
import pyarrow as pa
import pytest

from janet_ray.functions.partitioning import stable_hash_column
from janet_ray.pipelines.extract import N_DEDUPE_PARTS, dedupe_last_wins

HOT_URL = "https://hot.example/front-page"


def _skewed_corpus(n: int = 4000, hot_share: float = 0.35) -> pa.Table:
    """Deterministic corpus: one url re-crawled hot_share of the time, the rest
    unique. Distinct warc_ts per row keeps last-wins unambiguous."""
    n_hot = int(n * hot_share)
    urls = [HOT_URL] * n_hot + [f"https://cold.example/p{i}" for i in range(n - n_hot)]
    rng = np.random.RandomState(7)
    order = rng.permutation(n)
    urls = [urls[i] for i in order]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array([u.split("/")[2] for u in urls], pa.string()),
        "warc_ts": pa.array(np.arange(n, dtype=np.int64), pa.timestamp("us")),
        "route": pa.array(["html"] * n, pa.string()),
        "text": pa.array([f"body {i}" for i in range(n)], pa.string()),
    })


def test_salted_equals_unsalted(ray_session):
    import ray

    t = _skewed_corpus()
    plain = dedupe_last_wins(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    salted = dedupe_last_wins(ray.data.from_arrow(t), salt_parts=8).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(plain) == len(salted) == len(set(t["url"].to_pylist()))
    assert plain.equals(salted)
    # last-wins actually held: the hot url keeps its max warc_ts row
    hot = salted[salted["url"] == HOT_URL].iloc[0]
    hot_ts = [ts for u, ts in zip(t["url"].to_pylist(), t["warc_ts"].to_pylist())
              if u == HOT_URL]
    assert hot["warc_ts"] == max(hot_ts)


def test_salt_bounds_partition_sizes():
    """The salted pre-pass partition key spreads the hot url over salt_parts
    partitions: max partition share drops from ~hot_share to ~hot_share/salt."""
    t = _skewed_corpus()
    n = t.num_rows
    salt_parts = 8

    h = stable_hash_column(t, ["url"])
    unsalted = h % N_DEDUPE_PARTS
    salt = np.arange(n, dtype=np.int64) % salt_parts
    salted = (h * np.int64(salt_parts) + salt) % N_DEDUPE_PARTS

    unsalted_max = np.bincount(unsalted, minlength=N_DEDUPE_PARTS).max()
    salted_max = np.bincount(salted, minlength=N_DEDUPE_PARTS).max()
    assert unsalted_max >= 0.35 * n  # the skew is real without salt
    assert salted_max <= 0.35 * n / salt_parts + n / N_DEDUPE_PARTS * 2
    # and the hot url's copies really land on salt_parts distinct partitions
    hot_mask = np.array([u == HOT_URL for u in t["url"].to_pylist()])
    assert len(np.unique(salted[hot_mask])) == salt_parts


def test_second_stage_input_is_bounded(ray_session):
    """After the salted pre-pass, the merge stage sees at most salt_parts rows
    per url (the reduction actually happened before the unsalted shuffle)."""
    import ray

    t = _skewed_corpus()
    salt_parts = 8
    # replicate the pre-pass only
    from janet_ray.pipelines.extract import _latest_per_url_kernel

    def add_salted_part(batch: pa.Table) -> pa.Table:
        h = stable_hash_column(batch, ["url"])
        s = np.arange(batch.num_rows, dtype=np.int64) % salt_parts
        part = ((h * np.int64(salt_parts) + s) % N_DEDUPE_PARTS).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    pre = (ray.data.from_arrow(t)
           .map_batches(add_salted_part, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("part").map_groups(_latest_per_url_kernel, batch_format="pyarrow")
           .to_pandas())
    counts = pre.groupby("url").size()
    assert counts.max() <= salt_parts
    assert counts[HOT_URL] > 1  # the hot url genuinely used multiple salts
