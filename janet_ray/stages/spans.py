"""Exact duplicated token spans across documents — the substring-level
dedup granularity (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better": exact substring matching catches the boilerplate
that document- and paragraph-level dedup miss).

Two stages, both bounded:

  1. CANDIDATE pairs from winnowing (`stages/winnow.py`): the SIGMOD'03
     coverage guarantee says any shared token run of ≥ k+w−1 tokens yields
     at least one shared fingerprint, so every pair of documents sharing a
     span of at least ``min_len ≥ k+w−1`` tokens surfaces as a candidate —
     candidate generation is the existing join-free two-shuffle chain, and
     recall for spans ≥ min_len is exact (not probabilistic).
  2. EXACT span extraction per candidate pair: all maximal shared token
     runs of length ≥ ``min_len``, found by a vectorized diagonal-run
     kernel over the 2-D token-equality matrix (O(|A|·|B|) per pair —
     bounded by ``max_tokens`` per side; the corpus never pays this, only
     candidate pairs do). Pinned semantics: a reported span (a_start,
     b_start, length) is MAXIMAL (not extendable either direction) and
     spans are emitted in (a_start, b_start) order.

The pair texts ship via the minhash-verify broadcast pattern: only the
candidate docs' token arrays are collected (never the corpus), keyed by
id, `ray.put` once; the pair stream maps statelessly against it. Above
``broadcast_limit`` distinct candidate docs the caller should pre-filter
(threshold/df knobs on the candidate chain) — the guard raises rather
than silently ships a corpus.

Not SQL-expressible (maximal-run extraction has no relational form);
pinned by a brute-force reference parity test; the registered query is
rows-only by declaration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_TOKEN_RE = None


def _tokens(text: str) -> list[str]:
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    return _TOKEN_RE.findall((text or "").lower())


def maximal_shared_runs(a: list[str], b: list[str],
                        min_len: int) -> list[tuple[int, int, int]]:
    """All maximal (a_start, b_start, length ≥ min_len) shared token runs —
    the reference kernel (used per candidate pair; also the test oracle).
    Vectorized over the equality matrix's diagonals."""
    if not a or not b:
        return []
    A = np.asarray(a, dtype=object)
    B = np.asarray(b, dtype=object)
    eq = A[:, None] == B[None, :]
    out: list[tuple[int, int, int]] = []
    n, m = eq.shape
    for d in range(-(n - 1), m):
        diag = np.diagonal(eq, offset=d)
        if not diag.any():
            continue
        dd = np.diff(np.concatenate([[0], diag.astype(np.int8), [0]]))
        starts = np.nonzero(dd == 1)[0]
        ends = np.nonzero(dd == -1)[0]
        for s, e in zip(starts, ends):
            if e - s >= min_len:
                ai = s if d >= 0 else s - d
                bi = s + d if d >= 0 else s
                out.append((int(ai), int(bi), int(e - s)))
    out.sort()
    return out


def shared_token_spans(ds, pairs, *, text_col: str = "text",
                       id_col: str = "doc_id", min_len: int = 7,
                       max_tokens: int = 4096,
                       broadcast_limit: int = 500_000):
    """(id_a, id_b, a_start, b_start, length) exact shared-span rows for
    every candidate pair. ``pairs`` is any Dataset with id_a/id_b columns
    (typically ``winnow_neardup_pairs`` output — with k+w−1 ≤ min_len its
    coverage guarantee makes recall exact)."""
    import ray

    # materialize: the pair stream is consumed twice (candidate-id fold +
    # the extraction map) — without this the whole upstream candidate chain
    # (two corpus shuffles) would re-execute from lineage
    pairs = pairs.materialize()
    cand_ids = set()
    for b in pairs.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            cand_ids.update(b["id_a"].to_pylist())
            cand_ids.update(b["id_b"].to_pylist())
        if len(cand_ids) > broadcast_limit:
            # fail BEFORE accumulating the whole set — the guard must bound
            # driver memory, not report an OOM post-mortem
            raise ValueError(
                f"candidate docs exceed broadcast_limit={broadcast_limit}; "
                "tighten the candidate chain's threshold/df knobs before "
                "span extraction")
    ids_ref = ray.put(cand_ids)

    def collect(batch: pa.Table) -> pa.Table:
        # cached per-worker deserialization — ray.get on a Python set/dict
        # is NOT zero-copy, so a raw per-batch get would re-deserialize the
        # whole candidate map every batch (ADVICE r03)
        from janet_ray.functions.broadcast import get_broadcast

        want = get_broadcast(ids_ref)
        ids = batch[id_col].to_pylist()
        keep = [i for i, v in enumerate(ids) if v in want]
        t = batch.take(pa.array(keep, pa.int64()))
        toks = [_tokens(x)[:max_tokens] for x in t[text_col].to_pylist()]
        return pa.table({
            "doc_id": t[id_col],
            "toks": pa.array(toks, pa.list_(pa.string())),
        })

    tok_map: dict = {}
    if cand_ids:  # zero candidates → empty map (concat of zero tables raises)
        for b in ds.map_batches(collect, batch_format="pyarrow",
                                zero_copy_batch=True).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for i, t in zip(b["doc_id"].to_pylist(), b["toks"].to_pylist()):
                tok_map[i] = t
    map_ref = ray.put(tok_map)

    def extract(batch: pa.Table) -> pa.Table:
        from janet_ray.functions.broadcast import get_broadcast

        toks = get_broadcast(map_ref)
        ia_o, ib_o, as_o, bs_o, ln_o = [], [], [], [], []
        for ia, ib in zip(batch["id_a"].to_pylist(),
                          batch["id_b"].to_pylist()):
            runs = maximal_shared_runs(toks.get(ia, []), toks.get(ib, []),
                                       min_len)
            for a_s, b_s, ln in runs:
                ia_o.append(ia)
                ib_o.append(ib)
                as_o.append(a_s)
                bs_o.append(b_s)
                ln_o.append(ln)
        return pa.table({
            "id_a": pa.array(ia_o, pa.int64()),
            "id_b": pa.array(ib_o, pa.int64()),
            "a_start": pa.array(as_o, pa.int64()),
            "b_start": pa.array(bs_o, pa.int64()),
            "length": pa.array(ln_o, pa.int64()),
        })

    return pairs.map_batches(extract, batch_format="pyarrow",
                             zero_copy_batch=True)


def _merge_intervals(starts: np.ndarray, ends: np.ndarray
                     ) -> list[tuple[int, int]]:
    """Union of [start, end) token intervals (vectorized sort + sweep)."""
    if len(starts) == 0:
        return []
    order = np.argsort(starts, kind="stable")
    s, e = starts[order], ends[order]
    out = [(int(s[0]), int(e[0]))]
    for i in range(1, len(s)):
        if s[i] <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], int(e[i])))
        else:
            out.append((int(s[i]), int(e[i])))
    return out


def cut_duplicate_spans(ds, spans, *, text_col: str = "text",
                        id_col: str = "doc_id",
                        broadcast_limit: int = 5_000_000):
    """The APPLY side of substring-level dedup (Lee et al. 2021 cut rule,
    pinned): for every shared span, the occurrence in the LOWER doc_id is
    kept and the higher doc's tokens [b_start, b_start+length) are cut;
    overlapping cuts within a doc merge to their union; surviving tokens
    re-join with single spaces (the engine tokenizer is lossy about
    original whitespace — the cut output is a TOKEN product, exactly like
    the reference pipeline's deduplicated training text).

    Returns (doc_id, text, n_tokens_removed). Shape mirrors
    paradedup's apply: the span rows (already ∝ duplicate rate) broadcast
    once below ``broadcast_limit``; the corpus streams through one
    stateless map and never shuffles."""
    import ray

    cut_rows = {"doc": [], "start": [], "end": []}
    n_cuts = 0
    for b in spans.iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        n_cuts += b.num_rows
        if n_cuts > broadcast_limit:
            # fail BEFORE accumulating everything — the guard bounds driver
            # memory rather than reporting an OOM post-mortem
            raise ValueError(
                f"cut intervals exceed broadcast_limit={broadcast_limit}; "
                "pre-aggregate the span set (higher min_len / threshold) "
                "before applying")
        cut_rows["doc"].extend(b["id_b"].to_pylist())
        st = b["b_start"].to_numpy(zero_copy_only=False)
        cut_rows["start"].extend(st.tolist())
        cut_rows["end"].extend(
            (st + b["length"].to_numpy(zero_copy_only=False)).tolist())
    doc_a = np.asarray(cut_rows["doc"], dtype=np.int64)
    st_a = np.asarray(cut_rows["start"], dtype=np.int64)
    en_a = np.asarray(cut_rows["end"], dtype=np.int64)
    order = np.lexsort((st_a, doc_a))
    ref = ray.put({"doc": doc_a[order], "start": st_a[order],
                   "end": en_a[order]})

    def apply(batch: pa.Table) -> pa.Table:
        from janet_ray.functions.broadcast import get_broadcast

        cuts = get_broadcast(ref)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_t, out_n = [], []
        for i, t in zip(ids, texts):
            lo = np.searchsorted(cuts["doc"], i, "left")
            hi = np.searchsorted(cuts["doc"], i, "right")
            if lo == hi:
                out_t.append(" ".join(_tokens(t)))
                out_n.append(0)
                continue
            toks = _tokens(t)
            ivs = _merge_intervals(cuts["start"][lo:hi], cuts["end"][lo:hi])
            keep = np.ones(len(toks), dtype=bool)
            for s, e in ivs:
                keep[s:min(e, len(toks))] = False
            kept = [tk for tk, k in zip(toks, keep) if k]
            out_t.append(" ".join(kept))
            out_n.append(int((~keep).sum()))
        return pa.table({
            id_col: batch[id_col],
            text_col: pa.array(out_t, pa.string()),
            "n_tokens_removed": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)
