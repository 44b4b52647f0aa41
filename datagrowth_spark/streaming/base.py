"""Shared foreachBatch drain harness for the streaming operators.

One implementation of the start/trigger/await pattern
(:class:`~datagrowth_spark.streaming.seeding.StreamingSeeder` and
:class:`~datagrowth_spark.streaming.dedup.StreamingNearDupIndex` both
delegate here), so drain semantics — in particular the loud-timeout
contract below — can't drift between operators.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame


class DrainTimeout(RuntimeError):
    """An ``availableNow`` drain did not finish within ``timeout_s``."""


def start_foreach_batch(
    stream_df: DataFrame,
    process_batch: Callable[[DataFrame, int], None],
    available_now: bool = True,
    timeout_s: int = 300,
    **trigger_kwargs: Any,
):
    """Attach ``process_batch`` to ``stream_df`` and (by default) drain
    the current backlog micro-batch by micro-batch.

    ``availableNow`` drains must COMPLETE: ``awaitTermination`` timing
    out returns False rather than raising, and the prevailing caller
    pattern ``.start(...).stop()`` would then kill the query mid-drain
    and hand back silently truncated state. Instead the query is
    stopped and :class:`DrainTimeout` raised so a too-slow backlog is
    an error, never a partial answer. Pass ``available_now=False``
    (with e.g. ``processingTime='10 seconds'``) for a continuous run —
    the caller then owns the query lifecycle.
    """
    writer = stream_df.writeStream.foreachBatch(process_batch)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    query = writer.start()
    if available_now:
        finished = query.awaitTermination(timeout_s)
        if not finished:
            query.stop()
            raise DrainTimeout(
                f"availableNow drain still running after {timeout_s}s — "
                "state is incomplete; raise timeout_s or shrink the backlog")
    return query
