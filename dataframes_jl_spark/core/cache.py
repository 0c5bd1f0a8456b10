"""Structural persist/unpersist contract for library-held caches.

Several operators ``persist(MEMORY_AND_DISK)`` a bounded intermediate
that feeds multiple plan branches (the scan fan-out rule: Spark re-runs
identical aggregate subtrees per branch — ReuseExchange only matches
identical exchanges) and return a LAZY result, so they cannot unpersist
before the caller's action without voiding the cache. The historical
contract was documentation only ("call spark.catalog.clearCache() once
consumed"), which makes long-lived sessions safe only by discipline.

This module makes the contract structural (round-14 verdict ask #4):

- ``hold(result, *frames)`` attaches every persisted frame among
  ``frames`` — plus any handles already attached to them, so helpers
  like ``global_row_number`` propagate through compositions — to
  ``result.unpersist_handles``.
- ``release(result)`` unpersists every attached handle (idempotent,
  blocking=False) — the targeted alternative to a session-wide
  ``spark.catalog.clearCache()``.

``release`` is re-exported at package root; a caller that forgets it
loses nothing vs the old contract (clearCache still works), but a
caller that uses it can no longer leak caches from long-lived sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

HANDLES_ATTR = "unpersist_handles"


def hold(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach the persisted frames (and any handles they carry) to
    ``result.unpersist_handles`` and return ``result``.

    Frames that are not currently persisted contribute only their own
    attached handles — so a composition can pass every intermediate it
    built and only the actually-persisted ones are tracked. Identity-deduped:
    a frame consumed by two branches is unpersisted once.
    """
    merged: list[DataFrame] = []

    def _add(h: DataFrame) -> None:
        if all(h is not x for x in merged):
            merged.append(h)

    for f in frames:
        for inner in getattr(f, HANDLES_ATTR, ()):
            _add(inner)
        try:
            cached = bool(f.is_cached)
        except Exception:  # pragma: no cover - defensive for odd frames
            cached = True
        if cached:
            _add(f)
    setattr(result, HANDLES_ATTR, tuple(merged))
    return result


def release(result: DataFrame) -> DataFrame:
    """Unpersist every handle ``hold`` attached to ``result``.

    Idempotent (clears the handle list), non-blocking, and safe on
    frames that were never passed through ``hold``.
    """
    for h in getattr(result, HANDLES_ATTR, ()):
        try:
            h.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass
    setattr(result, HANDLES_ATTR, ())
    return result
