"""Session-lifetime cache registry.

DataFrame ``persist()`` entries live in Spark's SQL CacheManager — a
strong driver-side reference the ContextCleaner never garbage-collects
— so operators that persist internal frames WITHOUT handing the caller
a cleanup handle would leak one cached plan per call in a long-lived
session. Operators whose caches have no natural owner register them
here; :func:`release` (re-exported as ``queries.release_caches``)
returns the CacheManager to baseline, and the oracle harness asserts
emptiness after every sweep (r8).

Operators with a result handle (e.g. ``IncrementalDedupResult``) keep
ownership with the caller instead — double-release is harmless
(``unpersist`` on an unpersisted frame is a no-op) but a handle is the
better contract when the caller knows the materialization point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SESSION_CACHES: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Record ``df`` (already persisted) for :func:`release`."""
    _SESSION_CACHES.append(df)
    return df


def persist_registered(df: DataFrame) -> DataFrame:
    """``df.persist()`` + :func:`register` in one step."""
    return register(df.persist())


def release() -> int:
    """Unpersist every registered frame; returns how many were
    released. Safe anytime — a released plan recomputes, never errors."""
    n = len(_SESSION_CACHES)
    for df in _SESSION_CACHES:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    _SESSION_CACHES.clear()
    return n
