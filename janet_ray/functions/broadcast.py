"""Per-worker-process deserialization cache for broadcast objects.

``ray.get`` on a plasma ObjectRef is zero-copy for numpy arrays but
RE-DESERIALIZES Python dicts/sets/lists on EVERY call — a per-batch
``ray.get(ref)`` inside a ``map_batches`` UDF pays O(object size) per batch.
This module gives every worker process one small bounded cache so each
broadcast object deserializes ONCE per worker, however many batches flow
through. A few slots (not one) so two broadcast refs used by the SAME stage
(e.g. a candidate-id set plus a token map) don't evict each other per batch.

Usage inside a UDF: ``obj = get_broadcast(ref)`` wherever ``ray.get(ref)``
would appear. Refs are keyed by their hex id; eviction is FIFO once the slot
bound is reached (broadcast objects per live stage are few and small-side by
contract, so 8 slots is generous).
"""

from __future__ import annotations

_SLOTS = 8
_CACHE: dict = {}


def get_broadcast(ref):
    import ray

    key = ref.hex()
    if key not in _CACHE:
        if len(_CACHE) >= _SLOTS:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
