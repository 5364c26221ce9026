"""LM-surprise quality scoring (CCNet-style perplexity filtering, SURVEY §2.11).

The canonical web-corpus quality signal (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020) scores each
document by the perplexity of a language model trained on clean text; high
surprise ⇒ boilerplate/gibberish. This is the engine-native version with an
in-repo model: a bigram model FIT ON THE CORPUS ITSELF in one distributed
counting pass, then broadcast once and applied per batch.

Two passes, both Ray-Data-first:

  1. ``build_bigram_model`` — per-batch (prev, word) value-count partials →
     one small groupby over (bigram, count) → top-``max_vocab`` by count
     (partial top-k per block + single reduce — never a full sort). The model
     (two dicts of ints) is aggregate-small by construction and ships via
     ``ray.put`` exactly once.
  2. ``score_surprise`` — per document, mean −log2 p̂(w|prev) over its
     bigrams with add-one smoothing: p̂ = (c(prev,w) + 1) / (c(prev·) + V).
     Pure per-batch map against the broadcast model; no shuffle.

Scores are floats from ``math.log2`` — deterministic for a fixed model and
text, but not SQL-hash-reproducible (libm ulp differences), so the query is
rows-only; correctness is pinned by an independent single-process reference
implementation plus ordering properties in tests.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

import ray

_TOKEN_RE = re.compile(r"[a-z0-9]+")
BOS = "<s>"  # sentence/document start token


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def doc_bigrams(text: str) -> list[tuple[str, str]]:
    toks = _tokens(text)
    if not toks:
        return []
    return list(zip([BOS] + toks[:-1], toks))


def build_bigram_model(ds, *, text_col: str = "text",
                       max_vocab: int = 50_000) -> dict:
    """Distributed bigram counting → {'bigrams': {(prev, w): c},
    'prev_totals': {prev: c_total}, 'vocab_size': V}.

    ``prev_totals`` are computed from the FULL counts (before the top-k cut),
    so smoothing denominators are exact; only the kept numerators are
    truncated — the standard memory/quality tradeoff, bounded by max_vocab.

    Scale contract: the driver-side model is O(unigram vocab + max_vocab) —
    like vocab_topk, the distinct-TOKEN count (not the row count) is what must
    stay bounded; an adversarial corpus of random strings needs an upstream
    token-frequency cut first."""

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for t in batch[text_col].to_pylist():
            for prev, w in doc_bigrams(t or ""):
                c[prev + "\x00" + w] += 1
        items = list(c.items())
        return pa.table({
            "bigram": pa.array([k for k, _ in items], pa.string()),
            "n": pa.array([v for _, v in items], pa.int64()),
        })

    from ray.data.aggregate import Sum

    # materialize: BOTH consumers below (the prev-totals fold and the top-k
    # cut) read `totals`; without this the corpus scan + count shuffle — the
    # dominant pass — executes twice (lazy lineage re-runs per consumer).
    # Size is bounded by distinct bigrams, the operator's scale contract.
    totals = (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
              .groupby("bigram").aggregate(Sum("n", alias_name="n_total"))
              .materialize())

    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch, sort_keys=[("n_total", "descending"),
                                                ("bigram", "ascending")])
        return batch.take(idx[:max_vocab])

    # prev_totals + vocab need ALL distinct rows; the kept-numerators table is
    # the top-k. Stream the full counts once, folding prev totals per batch.
    prev_totals: dict[str, int] = {}
    vocab: set[str] = set()
    kept: dict[tuple[str, str], int] = {}
    top = (totals.map_batches(local_topk, batch_format="pyarrow",
                              zero_copy_batch=True)
           .repartition(1).map_batches(local_topk, batch_format="pyarrow"))
    for b in totals.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for bg, n in zip(b["bigram"].to_pylist(), b["n_total"].to_pylist()):
            prev, w = bg.split("\x00", 1)
            prev_totals[prev] = prev_totals.get(prev, 0) + int(n)
            vocab.add(w)
    for b in top.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for bg, n in zip(b["bigram"].to_pylist(), b["n_total"].to_pylist()):
            prev, w = bg.split("\x00", 1)
            kept[(prev, w)] = int(n)
    return {"bigrams": kept, "prev_totals": prev_totals,
            "vocab_size": len(vocab)}


def surprise_of(text: str, model: dict) -> float | None:
    """Mean −log2 p̂(w|prev), add-one smoothed; None for token-less docs."""
    bgs = doc_bigrams(text)
    if not bgs:
        return None
    big, prev_tot = model["bigrams"], model["prev_totals"]
    v = model["vocab_size"] + 1
    acc = 0.0
    for prev, w in bgs:
        num = big.get((prev, w), 0) + 1
        den = prev_tot.get(prev, 0) + v
        acc -= math.log2(num / den)
    return acc / len(bgs)


def score_surprise(ds, model: dict, *, text_col: str = "text",
                   id_col: str = "doc_id", out_col: str = "surprise"):
    """Per-document LM surprise against a broadcast model (one ray.put; no
    shuffle — embarrassingly parallel scoring)."""
    ref = ray.put(model)

    def f(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        scores = [surprise_of(t or "", m) for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: batch[id_col],
            out_col: pa.array(scores, pa.float64()),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
