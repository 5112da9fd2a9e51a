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


def state_timeline(
    df: DataFrame,
    ts_col: str = "ts",
    state_col: str = "state",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``state_agg(ts, state)`` → ``state_timeline()``: consecutive
    samples in the same state compress to one period row
    (``by``…, ``state``, ``start_us``, ``end_us``, ``n``). A period
    ends where the next one starts (LOCF holding, like
    :func:`state_durations`); the final period ends at its last
    observed sample, so its tail holds for zero time — the two
    accessors agree: ``sum(end_us - start_us) == duration_us``.

    Scale shape: one exchange on the ``by`` keys feeds both window
    functions (run-change marker + next-sample lead over the same
    spec), then a map-combined groupBy on (by, island) whose output is
    bounded by the number of state CHANGES, not samples. NULL states
    merge into NULL runs (IS DISTINCT FROM semantics, both engines).
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(F.col(ts_col), *[F.col(c) for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrow = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    us = to_unix_microseconds(ts_col)
    keep = list(by) + [ts_col]
    for c in tiebreak:
        if c not in keep:
            keep.append(c)
    marked = df.select(
        *keep,
        F.col(state_col).alias("state"),
        us.alias("_us"),
        F.lead(us).over(wrow).alias("_nxt"),
        F.when(
            F.lag(F.col(state_col)).over(wrow).eqNullSafe(F.col(state_col)),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("_chg"),
    )
    rows = marked.select(
        *by,
        "state",
        "_us",
        "_nxt",
        F.sum("_chg").over(w).alias("_isl"),
    )
    # within an island _nxt is strictly increasing, so max(_nxt) is the
    # next island's first sample; the final island's max(_nxt) is its
    # own last sample (or NULL for a 1-row island) — coalesce closes it
    # at the last observation, matching duration_in's zero-width tail
    return (
        rows.groupBy(*by, "_isl")
        .agg(
            F.min("state").alias("state"),
            F.min("_us").alias("start_us"),
            F.coalesce(F.max("_nxt"), F.max("_us")).alias("end_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .drop("_isl")
    )


def state_periods(
    df: DataFrame,
    state,
    ts_col: str = "ts",
    state_col: str = "state",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``state_periods(agg, state)``: the timeline restricted to one
    state value — every (start_us, end_us) interval spent in it."""
    tl = state_timeline(df, ts_col, state_col, by, tiebreak)
    return tl.filter(F.col("state").eqNullSafe(F.lit(state))).drop("state")


def state_at(
    df: DataFrame,
    at,
    ts_col: str = "ts",
    state_col: str = "state",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``state_at(agg, ts)``: the state in effect at ``at`` — the state
    of the last sample at-or-before it (LOCF), per group. Groups whose
    first sample is after ``at`` produce no row (the toolkit returns
    NULL there; absent-row is the relational spelling). One filter +
    map-combined ``max_by`` — no window, no sort."""
    key = F.struct(
        to_unix_microseconds(ts_col).alias("u"),
        *[F.col(c).alias(f"t{i}") for i, c in enumerate(tiebreak)],
    )
    return (
        df.filter(F.col(ts_col) <= F.lit(at).cast("timestamp"))
        .groupBy(*by)
        .agg(F.max_by(F.col(state_col), key).alias("state"))
    )


def interpolated_duration_in(
    df: DataFrame,
    state,
    bucket_width,
    ts_col: str = "ts",
    state_col: str = "state",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
    origin: "int | str | None" = None,
) -> DataFrame:
    """Bucketed ``duration_in`` with cross-bucket LOCF interpolation —
    the toolkit two-step ``interpolated_duration_in(state_agg, start,
    width, prev, next)``: a state sample holds until the NEXT sample,
    across bucket edges, so a bucket with no samples still accrues the
    carried state's time (what per-bucket ``duration_in`` gets wrong).
    The final sample holds zero time (no ``next`` argument — matching
    :func:`state_durations`).

    Plan: one ``lead`` window per group, then each LOCF segment for the
    target state explodes over the buckets it overlaps (bounded by
    segment span / width) and a map-combined groupBy sums exact int64-µs
    overlaps.

    ``origin`` anchors the bucket grid like ``time_bucket``'s origin
    argument and defaults to the reference's Mon 2000-01-03 convention
    (``src/time_bucket.c:98-105``) — so the raw-scan analog and the
    cagg serve :meth:`ContinuousAggregate.
    interpolated_duration_in_at_grain` label buckets identically for
    EVERY width (weeks are Monday-anchored, pre-epoch timestamps
    floor correctly). For widths that divide one day and t ≥ 0 this
    grid coincides with the epoch-``DIV`` grid the DuckDB oracles use.
    Pass an int (internal µs), a timestamp string, or ``origin=0`` for
    the bare epoch grid.

    Returns ``(by…, bucket, duration_us)`` — one row per bucket the
    state's segments overlap."""
    from .counters import _explode_buckets, _order_cols
    from .time import (
        DEFAULT_ORIGIN_US,
        parse_interval,
        to_timestamp_micros,
    )

    iv = parse_interval(bucket_width)
    if iv.months:
        raise ValueError(
            "interpolated_duration_in needs a fixed-width bucket"
        )
    width = iv.us
    if origin is None:
        origin_us = DEFAULT_ORIGIN_US
    elif isinstance(origin, int):
        origin_us = origin
    else:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(str(origin))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        origin_us = int(dt.timestamp() * 1_000_000)
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        *_order_cols(ts_col, tiebreak)
    )
    us = to_unix_microseconds(ts_col)
    seg = (
        df.select(
            *by,
            us.alias("_t1"),
            F.col(state_col).alias("_s"),
            F.lead(us).over(w).alias("_t2"),
        )
        .filter(
            F.col("_s").eqNullSafe(F.lit(state))
            & (F.col("_t2") > F.col("_t1"))
        )
    )
    wl = F.lit(width).cast("long")
    ex = _explode_buckets(seg, by, width, [], origin=origin_us)
    overlap = F.least(F.col("_t2"), F.col("_b") + wl) - F.greatest(
        F.col("_t1"), F.col("_b")
    )
    return (
        ex.groupBy(*by, F.col("_b"))
        .agg(F.sum(overlap).alias("duration_us"))
        .select(
            *by,
            to_timestamp_micros(F.col("_b")).alias("bucket"),
            "duration_us",
        )
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
