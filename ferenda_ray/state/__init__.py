"""Broadcast-state helpers.

``ray.put`` once on the driver; inside stateless map_batches tasks,
``fetch(ref)`` resolves the ObjectRef with a per-worker-process cache so
the payload is deserialized once per worker, not once per task/batch.
(Stateful ACTOR stages instead resolve refs in ``__init__``; this module
serves the stateless-task stages, which stay elastic — no fixed actor
pool to starve a small CPU budget.)
"""

from __future__ import annotations

_CACHE: dict = {}


def fetch(ref):
    """Resolve a broadcast ObjectRef (or pass through a plain object),
    memoized per worker process."""
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            key = ref.hex()
            if key not in _CACHE:
                _CACHE[key] = ray.get(ref)
            return _CACHE[key]
    except ImportError:
        pass
    return ref
