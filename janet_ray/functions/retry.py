"""Retry-with-backoff policy (SURVEY.md §4 retries row).

The reference's OCR call retries transient failures 3 times with exponential
backoff ``1s·2^k`` plus ≤1 s uniform jitter under a per-attempt timeout
(apps/ocr/src/lib/ocr-utils.ts:107-151). Two layers reproduce that here:

  * TASK level — Ray Data already retries failed tasks; the extraction
    pipeline forwards ``max_task_retries`` to the actor pool so a crashed
    actor task is retried (the whole-job analogue of the reference's retry
    budget).
  * ROW level — ``retry_with_backoff`` / ``RetryingEngine`` wrap a flaky
    per-row call (a production OCR RPC) so a transient error is retried
    in-place instead of poisoning the row. The in-repo glyph engine is
    deterministic (retrying a deterministic failure is waste), so retries
    default OFF and the wrapper exists for production engines — exercised in
    tests with an injected flaky engine.

``sleep`` and ``rng`` are injectable for tests; production uses real
time.sleep and an unseeded RNG (jitter exists to de-synchronize retries
across workers — determinism would defeat it).
"""

from __future__ import annotations

import random
import time
from typing import Callable, TypeVar

T = TypeVar("T")


def retry_with_backoff(
    fn: Callable[[], T],
    *,
    retries: int = 3,
    base_s: float = 1.0,
    max_jitter_s: float = 1.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> T:
    """Call ``fn``; on a retryable failure sleep ``base_s·2^attempt + jitter``
    and try again, up to ``retries`` extra attempts (ocr-utils.ts:107-151:
    3 retries, exponential base 1 s, ≤1 s jitter). The final failure
    propagates — the caller's error-as-data arm owns the row outcome."""
    from janet_ray.functions.deadline import RowDeadlineExceeded

    rng = rng or random.Random()
    attempt = 0
    while True:
        try:
            return fn()
        except retry_on as e:
            # A row-deadline expiry is NOT transient: retrying it would defeat
            # the per-row wall-clock guard (the one-shot itimer is already
            # consumed) — always propagate so the stage emits the error row.
            if isinstance(e, RowDeadlineExceeded):
                raise
            if attempt >= retries:
                raise
            sleep(base_s * (2 ** attempt) + rng.random() * max_jitter_s)
            attempt += 1
