"""``time_bucket_gapfill`` + ``locf`` + ``interpolate``.

Reference: the GapFill custom plan node
(``tsl/src/nodes/gapfill/gapfill_exec.c:1695``) with the semantics:

- Buckets are generated per aggregation group from
  ``time_bucket(width, start)`` (``align_with_time_bucket``,
  gapfill_exec.c:345-390) stepping ``width`` while ``< finish``
  (gapfill_exec.c:1053). Actual rows outside [start, finish) pass
  through un-gapfilled (gapfill_exec.c:1061).
- ``locf(col)`` (locf.c): gap rows carry the value of the last *actual*
  row — including NULL (an actual NULL row resets the carried value to
  NULL). ``treat_null_as_missing=True`` skips NULL values both when
  carrying and on actual rows (gapfill_exec.c:1326). The optional
  ``prev`` expression seeds leading gaps that have no prior actual row
  (locf.c:77-80: evaluated at ``gapfill_start``).
- ``interpolate(col)`` (interpolate.c): gap rows get linear interpolation
  ``y = (y0*(x1-x) + y1*(x-x0)) / (x1-x0)`` between the LAST actual row
  (NULL value → NULL result, interpolate.c:76-88) and the NEXT actual row.
  Integer columns round (numeric-based math, interpolate.c:165-230);
  floats use double math. Optional ``prev`` / ``next`` (time, value)
  records serve rows before the first / after the last actual row.

Spark-first implementation: one aggregation, a ``sequence()``-exploded
bucket spine per group, a full-outer join, and window functions — all
JVM-side; no Python UDFs. The spine explode is per-group and parallel;
nothing collects to the driver, so a 100 TB hypertable gapfills at the
cardinality of (groups × buckets), which is the output size.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window as W, functions as F
from pyspark.sql import types as T

from ..functions.time import (
    DEFAULT_ORIGIN_MONTHS,
    DEFAULT_ORIGIN_US,
    parse_interval,
)
from ..hypertable import _to_internal

_BUS = "_ts_bucket_us"


@dataclass(frozen=True)
class locf:  # noqa: N801 — mirrors the SQL function name
    """Fill spec: last observation carried forward (sql/gapfill.sql:27)."""

    prev: Union[Column, float, int, None] = None
    treat_null_as_missing: bool = False


@dataclass(frozen=True)
class interpolate:  # noqa: N801
    """Fill spec: linear interpolation (sql/gapfill.sql:31-43).

    ``prev`` / ``next``: optional (time_us | timestamp, value) tuples used
    when there is no actual row before/after — the reference's RECORD
    lookup expressions.
    """

    prev: Optional[tuple] = None
    next: Optional[tuple] = None


FillSpec = Union[locf, interpolate, None]


def _null_ts_guard(ts_col: Column, bucket: Column) -> Column:
    """Reference parity: a NULL row time errors
    (``gapfill_exec.c:1417`` "ts cannot be NULL") instead of producing a
    NULL bucket."""
    return F.when(
        ts_col.isNull(),
        F.raise_error(
            F.lit(
                "invalid time_bucket_gapfill argument: ts cannot be NULL "
                "(gapfill_exec.c:1417)"
            )
        ),
    ).otherwise(bucket)


def _pbucket(value_us: int, width_us: int, origin_us: int) -> int:
    """Python-side time_bucket (same floor-mod formula)."""
    return value_us - ((value_us - origin_us) % width_us + width_us) % width_us


def _local_us(instant_us: int, tz: str) -> int:
    """UTC instant µs -> local wall-clock µs in ``tz`` (IANA tzdb — the
    same database Spark's from_utc_timestamp consults)."""
    from datetime import timezone as _tz
    from zoneinfo import ZoneInfo

    dt = datetime.fromtimestamp(instant_us // 1_000_000, tz=_tz.utc).astimezone(
        ZoneInfo(tz)
    )
    return instant_us + int(dt.utcoffset().total_seconds()) * 1_000_000


def _nullsafe_spine_join(
    spine: DataFrame,
    bucketed: DataFrame,
    group_by: list,
    value_cols: list,
) -> DataFrame:
    """Full-outer join of the bucket spine against the aggregated rows —
    used only for the ungrouped path (a literal one-row spine source;
    grouped gapfill uses :func:`_expand_gaps`, which needs no join).
    Plain ``on=[cols]`` equi-join never matches NULL group keys, so a
    group whose key is NULL would emit BOTH an all-gap spine row and an
    unjoined actual row per bucket; the join is null-safe on the group
    columns (the reference treats NULL as an ordinary group value)."""
    if not group_by:
        return spine.join(bucketed, on=[_BUS], how="full_outer")
    # the spine derives FROM bucketed (groups = bucketed.select(...)),
    # so unqualified column refs are an ambiguous self-join — alias both
    # sides and qualify every reference
    s, b = spine.alias("_gf_s"), bucketed.alias("_gf_b")
    cond = F.col(f"_gf_s.{_BUS}") == F.col(f"_gf_b.{_BUS}")
    for g in group_by:
        cond = cond & F.col(f"_gf_s.{g}").eqNullSafe(F.col(f"_gf_b.{g}"))
    j = s.join(b, on=cond, how="full_outer")
    sel = [
        F.coalesce(F.col(f"_gf_s.{g}"), F.col(f"_gf_b.{g}")).alias(g)
        for g in group_by
    ]
    sel.append(
        F.coalesce(F.col(f"_gf_s.{_BUS}"), F.col(f"_gf_b.{_BUS}")).alias(_BUS)
    )
    sel += [F.col(f"_gf_b.{c}").alias(c) for c in value_cols]
    sel.append(F.col("_gf_b._present").alias("_present"))
    return j.select(*sel)


def _expand_gaps(
    bucketed: DataFrame,
    group_by: list,
    value_cols: list,
    b0: int,
    b_last: int,
    w: int,
) -> DataFrame:
    """Grouped gap generation WITHOUT a spine join: per group (window
    ``partitionBy(group) orderBy(bucket)``), each actual bucket row
    explodes itself plus the gap buckets up to the next actual bucket,
    clamped to ``[b0, b_last]``; the first row per group also emits the
    leading gaps ``[b0, first_bucket)``. Output row-set is identical to
    the spine full-outer join (all spine buckets + actual buckets outside
    the range pass through, gapfill_exec.c:1061) but costs one window
    sort instead of a distinct + a null-safe full-outer join — and the
    fill windows in :func:`_apply_fills` use the same partitioning, so
    the whole fill phase is a single exchange. NULL group keys need no
    special-casing: they are ordinary window partition keys.

    All ``_BUS`` values and ``b0`` are aligned to the same ``origin mod
    w`` grid, so ``greatest``/``least`` clamps stay on the grid. Per-row
    sequence arrays are bounded by the spine length — the same bound the
    join formulation's per-group ``sequence()`` spine had."""
    lb0, lb_last, lw = F.lit(b0), F.lit(b_last), F.lit(w)
    win = W.partitionBy(*group_by).orderBy(_BUS)
    bus = F.col(_BUS).cast(T.LongType())
    # window exprs must be projected before they can feed a generator
    staged = bucketed.select(
        *group_by,
        bus.alias("_gf_self"),
        F.lead(bus).over(win).alias("_gf_next"),
        (F.row_number().over(win) == 1).alias("_gf_first"),
        *value_cols,
    )
    self_c, nxt = F.col("_gf_self"), F.col("_gf_next")
    # leading gaps (first row only): [b0, min(bus - w, b_last)]
    lead_hi = F.least(self_c - lw, lb_last)
    # trailing gaps: [max(bus + w, b0), min(next - w (or b_last), b_last)]
    gap_lo = F.greatest(self_c + lw, lb0)
    gap_hi = F.least(F.coalesce(nxt - lw, lb_last), lb_last)
    empty = F.array().cast(T.ArrayType(T.LongType()))
    buses = F.concat(
        F.when(
            F.col("_gf_first") & (lb0 <= lead_hi), F.sequence(lb0, lead_hi, lw)
        ).otherwise(empty),
        F.array(self_c),
        F.when(gap_lo <= gap_hi, F.sequence(gap_lo, gap_hi, lw)).otherwise(empty),
    )
    exploded = staged.select(
        *group_by,
        "_gf_self",
        F.explode(buses).alias("_gf_bus"),
        *value_cols,
    )
    present = F.col("_gf_bus") == F.col("_gf_self")
    sel = [*group_by, F.col("_gf_bus").alias(_BUS)]
    sel += [F.when(present, F.col(c)).alias(c) for c in value_cols]
    sel.append(present.alias("_present"))
    return exploded.select(*sel)


def time_bucket_gapfill(
    df: DataFrame,
    width: Union[str, int],
    time_col: str,
    start: Union[int, str, datetime, date],
    finish: Union[int, str, datetime, date],
    group_by: Sequence[str] = (),
    aggs: Optional[dict[str, Column]] = None,
    fill: Optional[dict[str, FillSpec]] = None,
    bucket_alias: str = "bucket",
    timezone: Optional[str] = None,
) -> DataFrame:
    """Aggregate ``df`` by time bucket (+ ``group_by``), generating rows for
    missing buckets in ``[start, finish)`` and applying per-column fills.

    ``aggs``: output column name -> aggregate expression.
    ``fill``: output column name -> locf(...) / interpolate(...) / None.
    ``timezone``: bucket in local wall-clock time of an IANA zone — the
    reference's ``ts_gapfill_timestamptz_timezone_bucket`` overload
    (sql/gapfill.sql:23). The spine steps uniformly in LOCAL time, so
    bucket instants are non-uniform in UTC across a DST transition
    (23 h/25 h days) — exactly the reference semantics; locf/interpolate
    window math runs on the local-time axis.
    """
    if aggs is None:
        raise ValueError("aggs is required")
    fill = fill or {}
    group_by = list(group_by)
    dtypes = dict(df.dtypes)
    tdt = dtypes.get(time_col)
    if tdt is None:
        raise ValueError(f"no column {time_col!r}")
    is_ts = tdt.startswith("timestamp") or tdt == "date"
    if timezone is not None and not is_ts:
        raise ValueError("timezone gapfill needs a timestamp column")

    # --- bucket grid (all int64 internal units: µs or verbatim ints) ------
    if is_ts:
        iv = parse_interval(width)
        if iv.months:
            return _gapfill_month(
                df, iv.months, time_col, start, finish, group_by, aggs, fill,
                bucket_alias, timezone,
            )
        width_i = iv.us
        origin = DEFAULT_ORIGIN_US
        ts_col = F.col(time_col).cast(T.TimestampType())
        if timezone is not None:
            # _BUS is the LOCAL-wall-clock bucket start in µs; the output
            # converts each local bucket back to its UTC instant.
            internal = F.unix_micros(F.from_utc_timestamp(ts_col, timezone))
        else:
            internal = F.unix_micros(ts_col)
    else:
        if not isinstance(width, int):
            width_i = parse_interval(width).us
        else:
            width_i = width
        origin = 0
        internal = F.col(time_col).cast(T.LongType())

    start_i, finish_i = _to_internal(start), _to_internal(finish)
    if start_i is None or finish_i is None:
        raise ValueError("start and finish are required (gapfill_exec.c:390)")
    if is_ts and timezone is not None:
        start_i, finish_i = _local_us(start_i, timezone), _local_us(finish_i, timezone)
    b0 = _pbucket(start_i, width_i, origin)
    if finish_i <= b0:
        raise ValueError("finish must be after time_bucket(width, start)")
    b_last = b0 + ((finish_i - 1 - b0) // width_i) * width_i

    if not group_by and (b_last - b0) // width_i >= 5_000_000:
        import warnings

        warnings.warn(
            "gapfill without group_by runs its fill windows in a single "
            "task; a spine this large (>5M buckets) will serialize — add a "
            "group_by dimension or split the window",
            stacklevel=2,
        )

    bucket_us = internal - F.pmod(internal - F.lit(origin), F.lit(width_i))
    # reference parity (gapfill_exec.c:1417): a NULL row time is an
    # error, not a pass-through — and the window gap expansion below
    # relies on every bucket being non-NULL (a NULL bucket would sort
    # first and re-emit the whole spine as leading gaps)
    bucket_us = _null_ts_guard(internal, bucket_us)
    bucketed = (
        df.groupBy(*group_by, bucket_us.alias(_BUS))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("_present", F.lit(True))
    )

    if group_by:
        joined = _expand_gaps(bucketed, group_by, list(aggs), b0, b_last, width_i)
    else:
        groups = bucketed.sparkSession.range(1).select(F.lit(1).alias("_g")).drop("_g")
        spine = groups.select(
            F.explode(
                F.sequence(F.lit(b0), F.lit(b_last), F.lit(width_i))
            ).alias(_BUS),
        )
        joined = _nullsafe_spine_join(spine, bucketed, group_by, list(aggs))
    if is_ts and timezone is not None:
        axis_of = lambda v: _local_us(_to_internal(v), timezone)  # noqa: E731
    else:
        axis_of = _to_internal
    out = _apply_fills(joined, group_by, list(aggs), fill, axis_of=axis_of)

    if is_ts and timezone is not None:
        # DST spring-forward: a nonexistent local hour maps to the same
        # UTC instant as the following hour — drop the phantom spine row
        # (its local time does not survive a local->UTC->local round
        # trip), or downstream consumers see duplicate bucket keys
        exists = (
            F.unix_micros(
                F.from_utc_timestamp(
                    F.to_utc_timestamp(F.timestamp_micros(F.col(_BUS)), timezone),
                    timezone,
                )
            )
            == F.col(_BUS)
        )
        out = out.filter(exists)
        bucket_out = F.to_utc_timestamp(
            F.timestamp_micros(F.col(_BUS)), timezone
        ).alias(bucket_alias)
    elif is_ts:
        bucket_out = F.timestamp_micros(F.col(_BUS)).alias(bucket_alias)
    else:
        bucket_out = F.col(_BUS).alias(bucket_alias)
    return out.select(*group_by, bucket_out, *aggs.keys())


def _gapfill_month(
    df, width_months, time_col, start, finish, group_by, aggs, fill,
    bucket_alias, timezone=None,
):
    """Month-width gapfill: bucket the month index (bucket_month,
    src/time_bucket.c:157); the spine is a month-index sequence. With
    ``timezone``, the month index is taken in local wall-clock time and
    bucket instants are the local month starts converted back to UTC."""
    def py_midx(v) -> int:
        if isinstance(v, int):
            # internal µs (the int time-dimension form never reaches the
            # month path; ints here are µs since epoch)
            from datetime import timezone as _tzmod

            v = datetime.fromtimestamp(v / 1_000_000, tz=_tzmod.utc).replace(
                tzinfo=None
            )
        if isinstance(v, str):
            v = datetime.fromisoformat(v)
        if isinstance(v, date) and not isinstance(v, datetime):
            v = datetime(v.year, v.month, v.day)
        if timezone is not None:
            from datetime import timezone as _tzmod
            from zoneinfo import ZoneInfo

            if v.tzinfo is None:
                v = v.replace(tzinfo=_tzmod.utc)
            v = v.astimezone(ZoneInfo(timezone))
        return v.year * 12 + v.month - 1

    def month_start_us(midx: int) -> int:
        """UTC instant of the bucket start for month index ``midx`` —
        the LOCAL month start when a timezone is set."""
        y, mo = divmod(midx, 12)
        naive = datetime(y, mo + 1, 1)
        if timezone is None:
            return _to_internal(naive)
        from zoneinfo import ZoneInfo

        from datetime import timezone as _tzmod

        localized = naive.replace(tzinfo=ZoneInfo(timezone))
        return int(localized.astimezone(_tzmod.utc).timestamp() * 1_000_000)

    m0_raw = py_midx(start)
    w = width_months
    om = DEFAULT_ORIGIN_MONTHS
    b0 = m0_raw - ((m0_raw - om) % w + w) % w
    finish_i = _to_internal(finish)
    if finish_i is None:
        raise ValueError("start and finish are required (gapfill_exec.c:390)")
    if finish_i <= month_start_us(b0):
        # same contract as the fixed-width path
        raise ValueError("finish must be after time_bucket(width, start)")
    # last bucket = largest month-index bucket whose start instant < finish
    m = b0
    while True:
        nxt = m + w
        if month_start_us(nxt) >= finish_i:
            break
        m = nxt
    b_last = m

    tcol = F.col(time_col)
    if timezone is not None:
        tcol = F.from_utc_timestamp(tcol.cast(T.TimestampType()), timezone)
    midx = F.year(tcol) * F.lit(12) + F.month(tcol) - F.lit(1)
    bmidx = midx - F.pmod(midx - F.lit(om), F.lit(w))
    bmidx = _null_ts_guard(tcol, bmidx)
    bucketed = (
        df.groupBy(*group_by, bmidx.alias(_BUS))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .withColumn("_present", F.lit(True))
    )
    if group_by:
        joined = _expand_gaps(bucketed, group_by, list(aggs), b0, b_last, w)
    else:
        groups = bucketed.sparkSession.range(1).select(F.lit(1).alias("_g")).drop("_g")
        spine = groups.select(
            F.explode(F.sequence(F.lit(b0), F.lit(b_last), F.lit(w))).alias(_BUS)
        )
        joined = _nullsafe_spine_join(spine, bucketed, group_by, list(aggs))
    # interpolate prev/next tuples carry TIMES: the fill axis here is the
    # MONTH INDEX, so convert them onto it (a raw µs x0 against a ~e2
    # month-index x degenerates the linear weights)
    out = _apply_fills(joined, group_by, list(aggs), fill, axis_of=py_midx)
    b = F.col(_BUS)
    bucket_ts = F.make_date(
        F.floor(b / F.lit(12)).cast(T.IntegerType()),
        (F.pmod(b, F.lit(12)) + F.lit(1)).cast(T.IntegerType()),
        F.lit(1),
    ).cast(T.TimestampType())
    if timezone is not None:
        bucket_ts = F.to_utc_timestamp(bucket_ts, timezone)
    return out.select(*group_by, bucket_ts.alias(bucket_alias), *aggs.keys())


def _apply_fills(
    joined: DataFrame,
    group_by: list[str],
    value_cols: list[str],
    fill: dict[str, FillSpec],
    axis_of=None,
) -> DataFrame:
    """``axis_of``: converts a user-facing prev/next TIME onto the spine
    axis — internal µs for the plain path, local-wall-clock µs under a
    timezone, the month index for month widths. Defaults to internal
    µs."""
    if axis_of is None:
        axis_of = _to_internal
    present = F.col("_present").isNotNull() & F.col("_present")
    w = W.partitionBy(*group_by).orderBy(_BUS) if group_by else W.orderBy(_BUS)
    w_upto = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # "next actual row" = first non-null over (1 FOLLOWING, UNBOUNDED
    # FOLLOWING) — but Spark evaluates an UnboundedFollowing frame by
    # RECOMPUTING the aggregate for every row (O(n²) per partition:
    # WindowExec's UnboundedFollowingWindowFunctionFrame). The mirrored
    # growing frame — last non-null over (UNBOUNDED PRECEDING,
    # 1 PRECEDING) under DESCENDING spine order — selects exactly the
    # same row (the spine axis is unique within a partition, so the
    # mirror is unambiguous) and runs incrementally in O(n). Costs one
    # extra in-partition sort, no exchange. Measured at sf0.1:
    # q_gapfill_interpolate's fill job 2.4s -> see plans/r16.
    w_desc = (
        W.partitionBy(*group_by).orderBy(F.col(_BUS).desc())
        if group_by
        else W.orderBy(F.col(_BUS).desc())
    )
    w_after_desc = w_desc.rowsBetween(W.unboundedPreceding, -1)

    out = joined
    for name, spec in fill.items():
        if spec is None:
            continue
        col = F.col(name)
        if isinstance(spec, locf):
            prev_expr = _lit_or_col(spec.prev)
            if spec.treat_null_as_missing:
                carried = F.last(
                    F.when(present & col.isNotNull(), col), ignorenulls=True
                ).over(w_upto)
                filled = carried if prev_expr is None else F.coalesce(carried, prev_expr)
                value = F.when(present & col.isNotNull(), col).otherwise(filled)
            else:
                # carry the last ACTUAL row's value, NULL included; the
                # prev expression only serves rows with no prior actual row
                last_actual = F.last(
                    F.when(present, F.struct(col.alias("v"))), ignorenulls=True
                ).over(w_upto)
                gap_val = last_actual["v"]
                if prev_expr is not None:
                    gap_val = F.when(last_actual.isNull(), prev_expr).otherwise(
                        last_actual["v"]
                    )
                value = F.when(present, col).otherwise(gap_val)
            out = out.withColumn(name, value)
        elif isinstance(spec, interpolate):
            dtype = dict(joined.dtypes)[name]
            # prev = last actual row; NULL value there → NULL result
            # (interpolate.c:76-88 tuple_returned resets on NULL)
            last_actual = F.last(
                F.when(present, F.struct(F.col(_BUS).alias("t"), col.alias("v"))),
                ignorenulls=True,
            ).over(w_upto)
            next_actual = F.last(
                F.when(present, F.struct(F.col(_BUS).alias("t"), col.alias("v"))),
                ignorenulls=True,
            ).over(w_after_desc)
            prev_t, prev_v = last_actual["t"], last_actual["v"]
            next_t, next_v = next_actual["t"], next_actual["v"]
            if spec.prev is not None:
                pt = F.lit(axis_of(spec.prev[0]))
                pv = F.lit(spec.prev[1])
                no_before = last_actual.isNull()
                prev_t = F.when(no_before, pt).otherwise(prev_t)
                prev_v = F.when(no_before, pv).otherwise(prev_v)
            if spec.next is not None:
                nt = F.lit(axis_of(spec.next[0]))
                nv = F.lit(spec.next[1])
                no_after = next_actual.isNull()
                next_t = F.when(no_after, nt).otherwise(next_t)
                next_v = F.when(no_after, nv).otherwise(next_v)
            x = F.col(_BUS).cast(T.DoubleType())
            x0, x1 = prev_t.cast(T.DoubleType()), next_t.cast(T.DoubleType())
            y0, y1 = prev_v.cast(T.DoubleType()), next_v.cast(T.DoubleType())
            interp = (y0 * (x1 - x) + y1 * (x - x0)) / (x1 - x0)
            if dtype in ("smallint", "int", "bigint", "long", "integer", "short"):
                interp = F.round(interp).cast(dtype)
            else:
                interp = interp.cast(dtype)
            value = F.when(present, col).otherwise(
                F.when(prev_v.isNull() | next_v.isNull(), F.lit(None)).otherwise(
                    interp
                )
            )
            out = out.withColumn(name, value)
        else:
            raise TypeError(f"unknown fill spec {spec!r} for {name!r}")
    return out.drop("_present")


def _lit_or_col(v) -> Optional[Column]:
    if v is None:
        return None
    if isinstance(v, Column):
        return v
    return F.lit(v)
