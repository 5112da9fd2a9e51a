"""Streaming deduplication: first-arrival key dedup with bounded state.

The training-pipeline counterpart of ``pipeline.dedup.exact_dedup`` for
a live ingest: emit each key the first time it is seen and drop
re-arrivals while the key's state is inside the watermark horizon.

Scale design: ``dropDuplicatesWithinWatermark`` keeps one state-store
row per in-horizon key and EXPIRES it once the event-time watermark
passes (Spark's documented at-least-bounded-state dedup). That bound is
the whole point at 100 TB/day — an unbounded ``dropDuplicates`` grows
state forever; here state is O(distinct keys per horizon). The horizon
is the operator's correctness/memory dial: duplicates farther apart
than ``delay`` can re-emit, exactly like the reference's bounded
real-time dedup windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    sdf: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "90 days",
) -> DataFrame:
    """First-arrival dedup of a stream on ``keys``.

    Returns the deduplicated stream (append-mode compatible, no
    aggregation — rows emit as they pass). Project the key columns in
    the caller if survivor-row identity must stay deterministic across
    replays: *which* duplicate arrives first depends on micro-batch
    order, the key set does not.
    """
    return sdf.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
