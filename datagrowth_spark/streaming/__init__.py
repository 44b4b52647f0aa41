"""Structured Streaming surface.

The reference's closest streaming analogue is continuation-paged
incremental seeding with tombstone deltas
(``datagrowth/processors/input/seeding.py:168-213``; delta behavior
tested in ``tests/django_project/processors/tests/seeding/simple.py:71-110``).
Here that becomes real Structured Streaming: micro-batch seeding with
keyed upsert + tombstones (``seeding``), and event-time analytics with
watermarks, session windows, and custom Pandas state (``events``).
"""

from datagrowth_spark.streaming.dedup import StreamingNearDupIndex
from datagrowth_spark.streaming.events import (
    read_events_stream,
    sessionize_stream,
    stateful_user_stats,
    windowed_counts,
)
from datagrowth_spark.streaming.seeding import StreamingSeeder

__all__ = [
    "read_events_stream",
    "windowed_counts",
    "sessionize_stream",
    "stateful_user_stats",
    "StreamingSeeder",
    "StreamingNearDupIndex",
]
