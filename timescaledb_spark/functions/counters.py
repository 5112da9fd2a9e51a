"""Counter and time-weighted aggregates (the toolkit hyperfunction
families ``counter_agg``/``rate``/``delta``/``irate`` and
``time_weight``/``average`` — timescaledb-toolkit extension surface,
prometheus-style semantics).

All are compositions of built-in window + aggregate expressions: one
shuffle on the ``by`` keys, whole-stage-codegen bodies, no Python in
the path.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from .time import to_unix_microseconds


def _order_cols(ts_col: str, tiebreak: Sequence[str]) -> list:
    return [F.col(ts_col), *[F.col(c) for c in tiebreak]]


def counter_agg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Monotonic-counter summary per ``by`` group with prometheus reset
    semantics: a drop in the raw counter is a reset, and the counter's
    post-reset value counts as its increment.

    Returns per group: ``n`` samples, ``delta`` (reset-adjusted total
    increase), ``rate`` (delta / observed seconds), ``irate``
    (reset-adjusted increase of the LAST step / its seconds),
    ``num_resets``, ``num_changes`` (adjacent samples with a different
    value), ``first_ts``/``last_ts``.
    """
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        *_order_cols(ts_col, tiebreak)
    )
    us = to_unix_microseconds(ts_col)
    prev_v = F.lag(value_col).over(w)
    prev_us = F.lag(us).over(w)
    step = F.col(value_col) - prev_v
    inc = F.when(prev_v.isNull(), F.lit(0.0)).when(
        step < 0, F.col(value_col)
    ).otherwise(step)
    # last-row key matches the WINDOW's declared ordering (ts, then the
    # tiebreak columns) — keying on (_inc, _prev_us) instead would pick
    # an arbitrary row among duplicate timestamps
    last_key = F.struct(us, *[F.col(c) for c in tiebreak])
    stepped = df.select(
        *by,
        us.alias("_us"),
        F.col(value_col).alias("_v"),
        inc.alias("_inc"),
        (step < 0).cast("int").alias("_reset"),
        F.when(
            prev_v.isNotNull(), (F.col(value_col) != prev_v).cast("int")
        ).alias("_change"),
        prev_us.alias("_prev_us"),
        last_key.alias("_k"),
    )
    span_s = (F.max("_us") - F.min("_us")).cast("double") / 1e6
    last_prev = F.max_by(F.col("_prev_us"), F.col("_k"))
    elapsed_s = (F.max("_us") - last_prev).cast("double") / 1e6
    return stepped.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_inc").alias("delta"),
        F.when(span_s > 0, F.sum("_inc") / span_s).alias("rate"),
        # zero-elapsed guard: duplicate trailing timestamps would
        # divide by zero (ANSI mode fails the whole job)
        F.when(
            last_prev.isNotNull() & (elapsed_s > 0),
            F.max_by(F.col("_inc"), F.col("_k")) / elapsed_s,
        ).alias("irate"),
        F.coalesce(F.sum("_reset"), F.lit(0)).alias("num_resets"),
        F.coalesce(F.sum("_change"), F.lit(0)).alias("num_changes"),
        F.min("_us").alias("first_us"),
        F.max("_us").alias("last_us"),
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Time-weighted average per group, LOCF weighting (toolkit
    ``time_weight('LOCF', ts, value)`` → ``average``): each sample's
    value holds until the next sample; the final sample carries no
    weight. Groups with a single sample return that value.
    """
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        *_order_cols(ts_col, tiebreak)
    )
    us = to_unix_microseconds(ts_col)
    nxt = F.lead(us).over(w)
    weighted = df.select(
        *by,
        us.alias("_us"),
        F.col(value_col).alias("_v"),
        (F.coalesce(nxt, us) - us).cast("double").alias("_w_us"),
    )
    span = (F.max("_us") - F.min("_us")).cast("double")
    return weighted.groupBy(*by).agg(
        F.when(span > 0, F.sum(F.col("_v") * F.col("_w_us")) / span)
        .otherwise(F.first("_v"))
        .alias("tw_avg"),
        F.count(F.lit(1)).alias("n"),
    )


def gauge_agg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gauge summary per ``by`` group (toolkit ``gauge_agg`` family):
    like :func:`counter_agg` but the metric may legitimately decrease,
    so there are no resets — ``delta`` is simply last − first and
    ``rate`` its slope over the observed span. ``idelta``/``irate`` are
    the last step's change and instantaneous rate.

    Same execution shape as counter_agg: one window + one aggregate,
    single shuffle on the keys, fully codegen.
    """
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        *_order_cols(ts_col, tiebreak)
    )
    us = to_unix_microseconds(ts_col)
    prev_v = F.lag(value_col).over(w)
    prev_us = F.lag(us).over(w)
    key = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak])
    stepped = df.select(
        *by,
        us.alias("_us"),
        F.col(value_col).alias("_v"),
        (F.col(value_col) - prev_v).alias("_step"),
        prev_us.alias("_prev_us"),
        F.when(
            prev_v.isNotNull(), (F.col(value_col) != prev_v).cast("int")
        ).alias("_change"),
        key.alias("_k"),
    )
    span_s = (F.max("_us") - F.min("_us")).cast("double") / 1e6
    last_step = F.max_by(F.col("_step"), F.col("_k"))
    last_prev = F.max_by(F.col("_prev_us"), F.col("_k"))
    elapsed_s = (F.max("_us") - last_prev).cast("double") / 1e6
    delta = F.max_by(F.col("_v"), F.col("_k")) - F.min_by(F.col("_v"), F.col("_k"))
    return stepped.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        delta.alias("delta"),
        F.when(span_s > 0, delta / span_s).alias("rate"),
        last_step.alias("idelta"),
        F.when(
            last_prev.isNotNull() & (elapsed_s > 0), last_step / elapsed_s
        ).alias("irate"),
        F.coalesce(F.sum("_change"), F.lit(0)).alias("num_changes"),
        F.min("_us").alias("first_us"),
        F.max("_us").alias("last_us"),
    )



def _explode_buckets(
    seg: DataFrame,
    by: Sequence[str],
    width: int,
    extra: Sequence[str],
    origin: "int | None" = None,
) -> DataFrame:
    """Explode each ``[_t1, _t2)`` segment over the fixed-width buckets
    it overlaps (``_b`` = bucket start, µs). With ``origin=None`` the
    grid is epoch-``DIV``-aligned for positive timestamps only (Spark's
    ``DIV`` truncates toward zero while DuckDB's ``//`` floors — they
    agree for t ≥ 0, which the epoch-grid oracles rely on). With an
    ``origin`` the grid is origin-anchored via ``pmod`` floor — valid
    for ANY sign, matching ``time_bucket``'s fixed-width formula."""
    if origin is not None:
        o = int(origin)
        b0 = F.expr(f"_t1 - pmod(_t1 - {o}, {width})")
        b1 = F.expr(f"(_t2 - 1) - pmod((_t2 - 1) - {o}, {width})")
        return seg.select(
            *by,
            "_t1",
            "_t2",
            *extra,
            F.explode(
                F.sequence(b0, b1, F.lit(width).cast("long"))
            ).alias("_b"),
        )
    b0 = F.expr(f"(_t1 DIV {width}) * {width}")
    b1 = F.expr(f"((_t2 - 1) DIV {width}) * {width}")
    return seg.select(
        *by,
        "_t1",
        "_t2",
        *extra,
        F.explode(F.sequence(b0, b1, F.lit(width).cast("long"))).alias("_b"),
    )


def interpolated_average(
    df: DataFrame,
    bucket_width,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Bucketed time-weighted average with cross-bucket LOCF
    interpolation — the toolkit two-step ``time_bucket + time_weight``
    rolled up through ``interpolated_average(tws, start, width, prev,
    next)`` (timescaledb-toolkit docs; the reference core has no analog,
    the toolkit extension provides it).

    Semantics: the samples of each ``by`` group define one global LOCF
    step function; each bucket's average is the integral of that step
    function over the bucket divided by the covered duration (a bucket
    fully inside the sample span divides by the full width; the first
    and last buckets divide by their partial coverage — exactly the
    toolkit's ``prev``/``next``-aware behavior). A value carried across
    a bucket boundary therefore contributes to BOTH buckets, which the
    naive per-bucket time_weight gets wrong.

    Plan: one window (``lead``) per group, then each LOCF segment
    explodes over the buckets it overlaps (bounded by segment span /
    width) and a single map-combined groupBy sums ``value × overlap``.
    All overlap arithmetic is exact int64 microseconds — only the final
    division is floating point, so the DuckDB oracle matches bit-exactly.
    Positive timestamps only for the bucket index (integer DIV truncates
    toward zero in Spark but floors in DuckDB; they agree for us ≥ 0).

    Returns (by…, bucket, tw_avg, n_segments).
    """
    from .time import parse_interval, to_timestamp_micros

    iv = parse_interval(bucket_width)
    if iv.months:
        raise ValueError("interpolated_average needs a fixed-width bucket")
    width = iv.us
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        *_order_cols(ts_col, tiebreak)
    )
    us = to_unix_microseconds(ts_col)
    seg = df.select(
        *by,
        us.alias("_t1"),
        F.col(value_col).alias("_v"),
        F.lead(us).over(w).alias("_t2"),
    ).filter(F.col("_t2") > F.col("_t1"))
    wl = F.lit(width).cast("long")
    ex = _explode_buckets(seg, by, width, ["_v"])
    overlap = F.least(F.col("_t2"), F.col("_b") + wl) - F.greatest(
        F.col("_t1"), F.col("_b")
    )
    return (
        ex.groupBy(*by, F.col("_b"))
        .agg(
            (
                F.sum(F.col("_v") * overlap.cast("double"))
                / F.sum(overlap.cast("double"))
            ).alias("tw_avg"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .select(
            *by,
            to_timestamp_micros(F.col("_b")).alias("bucket"),
            "tw_avg",
            "n_segments",
        )
    )


def interpolated_delta(
    df: DataFrame,
    bucket_width,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Bucketed counter delta/rate with linear interpolation at bucket
    edges (toolkit ``counter_agg → interpolated_delta`` /
    ``interpolated_rate``; the reference core has no analog, the toolkit
    extension provides it).

    Semantics: samples are first reset-adjusted (a drop to a smaller
    value adds the previous value to a running compensation — prometheus
    counter semantics, matching :func:`counter_agg`), which makes the
    adjusted series monotone. Adjacent samples then define linear
    segments; each bucket's delta is the telescoped sum of the segment
    portions inside it, i.e. the interpolated counter value at the
    bucket's edges — a segment crossing a boundary splits its increase
    between the two buckets instead of crediting it all to the sample's
    bucket. ``rate`` divides by the covered duration (partial for the
    first/last buckets — the toolkit's ``prev``/``next``-aware shape).

    Plan: two windows per group (reset prefix-sum + lead), one bounded
    segment-explode, one map-combined groupBy. Increases between
    equal-timestamp samples (zero-duration segments) are not
    attributable to any interval and are dropped — the toolkit rejects
    duplicate timestamps outright. Edge interpolation uses
    exact int64 µs offsets; only the value interpolation is float, with
    identical operand order in the DuckDB oracle.

    Returns (by…, bucket, delta, rate, n_segments).
    """
    from .time import parse_interval, to_timestamp_micros

    iv = parse_interval(bucket_width)
    if iv.months:
        raise ValueError("interpolated_delta needs a fixed-width bucket")
    width = iv.us
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        *_order_cols(ts_col, tiebreak)
    )
    us = to_unix_microseconds(ts_col)
    # two-step reset adjustment (a window fn can't nest inside a
    # windowed aggregate): lag first, then the compensation prefix-sum.
    # The tiebreak must survive into every window: with duplicate
    # timestamps the lag/lead chains pair different samples otherwise.
    lagged = df.select(
        *by,
        us.alias("_us"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreak)],
        F.col(value_col).alias("_v"),
        F.lag(value_col).over(w).alias("_pv"),
    )
    w2 = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col("_us"), *[F.col(f"_tb_{i}") for i in range(len(tiebreak))]
    )
    comp = F.sum(
        F.when(F.col("_v") < F.col("_pv"), F.col("_pv")).otherwise(F.lit(0.0))
    ).over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    adj = lagged.select(
        *by,
        "_us",
        *[f"_tb_{i}" for i in range(len(tiebreak))],
        (F.col("_v") + comp).alias("_va"),
    )
    seg = adj.select(
        *by,
        F.col("_us").alias("_t1"),
        F.col("_va").alias("_v1"),
        F.lead("_us").over(w2).alias("_t2"),
        F.lead("_va").over(w2).alias("_v2"),
    ).filter(F.col("_t2") > F.col("_t1"))
    wl = F.lit(width).cast("long")
    ex = _explode_buckets(seg, by, width, ["_v1", "_v2"])
    lo = F.greatest(F.col("_t1"), F.col("_b"))
    hi = F.least(F.col("_t2"), F.col("_b") + wl)
    span = (F.col("_t2") - F.col("_t1")).cast("double")
    dv = F.col("_v2") - F.col("_v1")
    v_lo = F.col("_v1") + dv * (lo - F.col("_t1")).cast("double") / span
    v_hi = F.col("_v1") + dv * (hi - F.col("_t1")).cast("double") / span
    return (
        ex.groupBy(*by, F.col("_b"))
        .agg(
            F.sum(v_hi - v_lo).alias("delta"),
            (
                F.sum(v_hi - v_lo)
                / (F.sum((hi - lo).cast("double")) / F.lit(1e6))
            ).alias("rate"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .select(
            *by,
            to_timestamp_micros(F.col("_b")).alias("bucket"),
            "delta",
            "rate",
            "n_segments",
        )
    )
