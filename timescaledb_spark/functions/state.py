"""State and liveness aggregates (toolkit ``state_agg``/``duration_in``
and ``heartbeat_agg`` families).

Window + aggregate compositions, one shuffle on the ``by`` keys, fully
codegen — the same execution shape as counter_agg/time_weight.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, Window, functions as F

from .time import parse_interval, to_unix_microseconds


def state_durations(
    df: DataFrame,
    ts_col: str = "ts",
    state_col: str = "state",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``state_agg(ts, state)`` → ``duration_in(state)`` for every state:
    each sample's state holds until the next sample (LOCF), the final
    sample holds for zero time (like ``time_weight``). Returns one row
    per (``by``…, state) with ``duration_us`` and ``n`` entries."""
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    us = to_unix_microseconds(ts_col)
    nxt = F.lead(us).over(w)
    held = df.select(
        *by,
        F.col(state_col).alias("state"),
        (F.coalesce(nxt, us) - us).alias("_dur"),
    )
    return held.groupBy(*by, "state").agg(
        F.sum("_dur").alias("duration_us"),
        F.count(F.lit(1)).alias("n"),
    )


def heartbeat_agg(
    df: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    liveness: Union[str, int] = "5 minutes",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``heartbeat_agg(ts, …)``: every heartbeat asserts liveness for
    ``liveness`` after it; the covered time is the union of those
    intervals. Returns per group: ``live_us`` (union length),
    ``num_live_ranges`` (disjoint islands), ``first_us``/``last_us``
    and ``n`` heartbeats. ``dead_us`` within the observed span is
    ``last_us + L - first_us - live_us``.

    ``liveness``: interval string for human units; an INT is raw
    internal MICROSECONDS (the same convention as ``chunk_interval`` —
    note this differs from ``parse_interval``'s bare-number-as-seconds
    rule, so pass a string unless you mean µs)."""
    if isinstance(liveness, int):
        live_us = liveness
    else:
        iv = parse_interval(liveness)
        if iv.months:
            raise ValueError("liveness must be a fixed-width interval")
        live_us = iv.us
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    us = to_unix_microseconds(ts_col)
    nxt = F.lead(us).over(w)
    gap = nxt - us
    stepped = df.select(
        *by,
        us.alias("_us"),
        # contribution of this heartbeat to the union: up to the next
        # beat, capped at L; the last beat contributes its full L
        F.when(gap.isNull(), F.lit(live_us))
        .otherwise(F.least(gap, F.lit(live_us)))
        .alias("_live"),
        (gap > live_us).cast("int").alias("_break"),
    )
    return stepped.groupBy(*by).agg(
        F.sum("_live").alias("live_us"),
        (F.lit(1) + F.coalesce(F.sum("_break"), F.lit(0))).alias(
            "num_live_ranges"
        ),
        F.min("_us").alias("first_us"),
        F.max("_us").alias("last_us"),
        F.count(F.lit(1)).alias("n"),
    )
