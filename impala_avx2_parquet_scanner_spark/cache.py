"""Query-boundary cache discipline: every persist() pairs with an
unpersist().

Query bodies persist() intermediates whose plan is referenced more than
once by the RETURNED DataFrame (an iterative loop, a stats pass feeding
a scoring pass).  The cache is only useful until the caller has
materialized the result — but the query function itself can never know
when that is, and unpersisting before return would drop the cache before
its first use.  ``tie_unpersist(result, *cached)`` closes the loop: the
cached frames are unpersisted when the returned result DataFrame is
garbage-collected, the earliest point at which no caller can cheaply
re-execute its plan.  A long-lived user session that composes many
operators therefore releases each query's scratch cache as soon as it
drops the result reference, instead of accumulating cached RDDs until
the session dies (the failure mode this module exists to prevent —
executor storage fills with dead blocks and evicts live ones).

Spark-side behavior notes:
* ``unpersist(blocking=False)`` is asynchronous block removal — no job
  stalls on release.
* Unpersisting a frame AFTER its consumer plan has executed is always
  safe: lineage recomputes if anything re-executes.
* The finalizer never runs at interpreter exit (``atexit = False``) —
  the JVM gateway may already be gone, and the process teardown frees
  everything anyway.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

__all__ = ["tie_unpersist"]


def _release(cached: list[DataFrame]) -> None:
    for df in cached:
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass


def tie_unpersist(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist each frame in ``cached`` once ``result`` is dropped.

    Returns ``result`` unchanged, so query bodies end with
    ``return tie_unpersist(out, scratch1, scratch2)``.
    """
    finalizer = weakref.finalize(result, _release, list(cached))
    finalizer.atexit = False
    return result
