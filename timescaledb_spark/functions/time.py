"""Time-series column functions with TimescaleDB-exact semantics.

Reference parity:
- ``time_bucket`` reimplements the formula of ``ts_timestamp_bucket`` /
  ``ts_int64_bucket`` (reference ``src/time_bucket.c:60-130``,
  ``TIME_BUCKET_TS`` macro): ``result = ts - mod(ts - origin, width)``
  with floor semantics, default origin Monday 2000-01-03
  (``src/time_bucket.c:98-105`` JAN_3_2000 / DEFAULT_ORIGIN).
- Month-width buckets mirror ``bucket_month`` (``src/time_bucket.c:157-181``):
  bucket on the month index ``year*12 + month - 1``, day component ignored,
  default origin Jan 2000, result is the first day of the bucket month.
- Timezone variant mirrors ``ts_timestamptz_timezone_bucket``
  (``src/time_bucket.c:335``): convert to local wall-clock, bucket, convert
  back.
- Integer bucketing mirrors ``ts_int16/32/64_bucket`` with optional offset
  (``src/time_bucket.c:60-96``).
- Internal time conversions mirror ``sql/util_time.sql:9-52``
  (``to_unix_microseconds``, ``to_timestamp`` …): int64 microseconds is the
  internal time unit.

Everything here is a pure Column expression — JVM-side, codegen-friendly,
no Python UDFs — so Catalyst can constant-fold, push down and prune with it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime, timezone as _tz
from typing import Optional, Union

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

# Unix epoch microseconds of the reference's default origin (Mon 2000-01-03 UTC).
DEFAULT_ORIGIN_US = 946_857_600_000_000
# Month index (year*12 + month-1) of Jan 2000, the default origin for month buckets.
DEFAULT_ORIGIN_MONTHS = 2000 * 12
USECS_PER_SECOND = 1_000_000
USECS_PER_MINUTE = 60 * USECS_PER_SECOND
USECS_PER_HOUR = 60 * USECS_PER_MINUTE
USECS_PER_DAY = 24 * USECS_PER_HOUR
USECS_PER_WEEK = 7 * USECS_PER_DAY

_INTERVAL_UNIT_US = {
    "microsecond": 1,
    "microseconds": 1,
    "us": 1,
    "millisecond": 1_000,
    "milliseconds": 1_000,
    "ms": 1_000,
    "second": USECS_PER_SECOND,
    "seconds": USECS_PER_SECOND,
    "sec": USECS_PER_SECOND,
    "secs": USECS_PER_SECOND,
    "s": USECS_PER_SECOND,
    "minute": USECS_PER_MINUTE,
    "minutes": USECS_PER_MINUTE,
    "min": USECS_PER_MINUTE,
    "mins": USECS_PER_MINUTE,
    "m": USECS_PER_MINUTE,
    "hour": USECS_PER_HOUR,
    "hours": USECS_PER_HOUR,
    "h": USECS_PER_HOUR,
    "hr": USECS_PER_HOUR,
    "hrs": USECS_PER_HOUR,
    "day": USECS_PER_DAY,
    "days": USECS_PER_DAY,
    "d": USECS_PER_DAY,
    "week": USECS_PER_WEEK,
    "weeks": USECS_PER_WEEK,
    "w": USECS_PER_WEEK,
}

_INTERVAL_UNIT_MONTHS = {
    "month": 1,
    "months": 1,
    "mon": 1,
    "mons": 1,
    "year": 12,
    "years": 12,
    "y": 12,
    "yr": 12,
    "yrs": 12,
    "decade": 120,
    "decades": 120,
    "century": 1200,
    "centuries": 1200,
}

_INTERVAL_RE = re.compile(r"([+-]?\d+(?:\.\d+)?)\s*([a-zA-Z]+)")


@dataclass(frozen=True)
class Interval:
    """A parsed interval: month component + microsecond component.

    Mirrors PostgreSQL's Interval struct shape (months / days+time folded
    into ``us`` since we don't need day-vs-time distinction for bucketing;
    the reference folds them too via
    ``get_interval_period_timestamp_units``, src/time_bucket.c:185-196).
    """

    months: int = 0
    us: int = 0

    def __post_init__(self) -> None:
        if self.months and self.us:
            raise ValueError(
                "month intervals cannot have day or time component "
                "(reference src/time_bucket.c:140-155)"
            )


def parse_interval(width: Union[str, int, float, Interval]) -> Interval:
    """Parse '1 hour', '30 minutes', '1 month', '2 weeks', 3600 (seconds)…"""
    if isinstance(width, Interval):
        return width
    if isinstance(width, (int, float)):
        return Interval(us=int(width * USECS_PER_SECOND))
    s = width.strip().lower()
    if not s:
        raise ValueError("empty interval")
    months = 0
    us = 0
    matched = False
    for m in _INTERVAL_RE.finditer(s):
        matched = True
        qty_s, unit = m.group(1), m.group(2)
        qty = float(qty_s)
        if unit in _INTERVAL_UNIT_US:
            us += int(round(qty * _INTERVAL_UNIT_US[unit]))
        elif unit in _INTERVAL_UNIT_MONTHS:
            if qty != int(qty):
                raise ValueError(f"fractional month interval not supported: {width!r}")
            months += int(qty) * _INTERVAL_UNIT_MONTHS[unit]
        else:
            raise ValueError(f"unknown interval unit {unit!r} in {width!r}")
    if not matched:
        raise ValueError(f"cannot parse interval {width!r}")
    return Interval(months=months, us=us)


def _to_col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _ts_to_us(ts: Column) -> Column:
    """Timestamp column -> int64 unix microseconds (internal time unit)."""
    return F.unix_micros(ts.cast(T.TimestampType()))


def _us_to_ts(us: Column) -> Column:
    return F.timestamp_micros(us)


def to_unix_microseconds(ts: Union[str, Column]) -> Column:
    """``_timescaledb_functions.to_unix_microseconds`` (sql/util_time.sql:9)."""
    return _ts_to_us(_to_col(ts))


def to_timestamp_micros(us: Union[str, Column]) -> Column:
    """``_timescaledb_functions.to_timestamp`` (sql/util_time.sql:17)."""
    return _us_to_ts(_to_col(us))


def _origin_to_us(origin: Union[str, datetime, date, int, None]) -> int:
    if origin is None:
        return DEFAULT_ORIGIN_US
    if isinstance(origin, int):
        return origin
    if isinstance(origin, str):
        origin = datetime.fromisoformat(origin)
    if isinstance(origin, datetime):
        if origin.tzinfo is None:
            origin = origin.replace(tzinfo=_tz.utc)
        return int(origin.timestamp() * USECS_PER_SECOND)
    if isinstance(origin, date):
        return int(
            datetime(origin.year, origin.month, origin.day, tzinfo=_tz.utc).timestamp()
            * USECS_PER_SECOND
        )
    raise TypeError(f"unsupported origin {origin!r}")


def _bucket_us_expr(ts_us: Column, width_us: int, origin_us: int) -> Column:
    if width_us <= 0:
        raise ValueError("period must be greater than 0")
    w = F.lit(width_us)
    return ts_us - F.pmod(ts_us - F.lit(origin_us), w)


def _month_index(ts: Column) -> Column:
    return F.year(ts) * F.lit(12) + F.month(ts) - F.lit(1)


def _bucket_month_expr(
    ts: Column, width_months: int, origin_months: int, as_date: bool = False
) -> Column:
    """bucket_month (src/time_bucket.c:157-181): bucket the month index."""
    if width_months <= 0:
        raise ValueError("period must be greater than 0")
    midx = _month_index(ts)
    b = midx - F.pmod(midx - F.lit(origin_months), F.lit(width_months))
    year = F.floor(b / F.lit(12)).cast(T.IntegerType())
    month = (F.pmod(b, F.lit(12)) + F.lit(1)).cast(T.IntegerType())
    d = F.make_date(year, month, F.lit(1))
    return d if as_date else d.cast(T.TimestampType())


def time_bucket(
    width: Union[str, int, float, Interval],
    ts: Union[str, Column],
    origin: Union[str, datetime, date, int, None] = None,
    offset: Union[str, int, None] = None,
    timezone: Optional[str] = None,
) -> Column:
    """TimescaleDB ``time_bucket`` for timestamp/date columns.

    Exact formula parity with ``src/time_bucket.c`` (see module docstring).

    - ``width``: interval string ('5 minutes', '1 day', '1 month', …).
    - ``origin``: bucket alignment origin (default Mon 2000-01-03).
    - ``offset``: interval subtracted before and re-added after bucketing
      (``ts_timestamp_offset_bucket``, src/time_bucket.c:245-265).
    - ``timezone``: bucket in local wall-clock time of this zone
      (``ts_timestamptz_timezone_bucket``, src/time_bucket.c:335).
    """
    col = _to_col(ts).cast(T.TimestampType())
    iv = parse_interval(width)

    if offset is not None:
        off = parse_interval(offset)
        if off.months:
            raise ValueError("month-granular offsets not supported")
        if timezone is not None:
            # reference order (ts_timestamptz_timezone_bucket): the
            # offset applies to the NAIVE LOCAL timestamp, not the UTC
            # instant — shifting in instant-space first can hop a DST
            # transition and land one bucket off
            local = F.from_utc_timestamp(col, timezone)
            shifted_local = _us_to_ts(_ts_to_us(local) - F.lit(off.us))
            inner_local = time_bucket(width, shifted_local, origin=origin)
            return F.to_utc_timestamp(
                _us_to_ts(_ts_to_us(inner_local) + F.lit(off.us)), timezone
            )
        shifted = _us_to_ts(_ts_to_us(col) - F.lit(off.us))
        inner = time_bucket(width, shifted, origin=origin)
        return _us_to_ts(_ts_to_us(inner) + F.lit(off.us))

    if timezone is not None:
        # Convert to local wall-clock, bucket as naive timestamp, convert back.
        local = F.from_utc_timestamp(col, timezone)
        if iv.months:
            origin_months = (
                DEFAULT_ORIGIN_MONTHS
                if origin is None
                else _origin_months_of(origin)
            )
            local_bucket = _bucket_month_expr(local, iv.months, origin_months)
        else:
            origin_us = _origin_to_us(origin)
            local_bucket = _us_to_ts(
                _bucket_us_expr(_ts_to_us(local), iv.us, origin_us)
            )
        return F.to_utc_timestamp(local_bucket, timezone)

    if iv.months:
        origin_months = (
            DEFAULT_ORIGIN_MONTHS if origin is None else _origin_months_of(origin)
        )
        return _bucket_month_expr(col, iv.months, origin_months)

    origin_us = _origin_to_us(origin)
    return _us_to_ts(_bucket_us_expr(_ts_to_us(col), iv.us, origin_us))


def _origin_months_of(origin: Union[str, datetime, date, int]) -> int:
    if isinstance(origin, str):
        origin = datetime.fromisoformat(origin)
    if isinstance(origin, (datetime, date)):
        return origin.year * 12 + origin.month - 1
    raise TypeError(f"unsupported month-bucket origin {origin!r}")


def time_bucket_date(
    width: Union[str, Interval],
    d: Union[str, Column],
    origin: Union[str, date, None] = None,
) -> Column:
    """``time_bucket`` over DATE columns (sql/time_bucket.sql date overloads).

    Returns DateType. Day/week widths bucket the day index; month widths
    bucket the month index.
    """
    col = _to_col(d)
    iv = parse_interval(width)
    if iv.months:
        origin_months = (
            DEFAULT_ORIGIN_MONTHS if origin is None else _origin_months_of(origin)
        )
        return _bucket_month_expr(col, iv.months, origin_months, as_date=True)
    if iv.us % USECS_PER_DAY != 0:
        raise ValueError("date buckets must be a whole number of days")
    width_days = iv.us // USECS_PER_DAY
    if origin is None:
        origin_days = DEFAULT_ORIGIN_US // USECS_PER_DAY
    else:
        origin_days = _origin_to_us(origin) // USECS_PER_DAY
    days = F.datediff(col, F.lit("1970-01-01").cast(T.DateType()))
    b = days - F.pmod(days - F.lit(origin_days), F.lit(width_days))
    return F.date_add(F.lit("1970-01-01").cast(T.DateType()), b.cast(T.IntegerType()))


def time_bucket_sql(
    width: Union[str, Interval],
    ts_sql: str,
    origin: Union[str, datetime, date, int, None] = None,
    offset: Union[str, int, None] = None,
    timezone: Optional[str] = None,
) -> str:
    """Spark-SQL text form of :func:`time_bucket` — same formulas, same
    constants, emitted as a SQL expression string for the ``TSSession.sql``
    macro expander. Parity is property-tested against the Column version
    (``tests/test_sqlapi.py``)."""
    iv = parse_interval(width)

    if offset is not None:
        off = parse_interval(offset)
        if off.months:
            raise ValueError("month-granular offsets not supported")
        if timezone is not None:
            # same local-axis offset order as the Column form
            tz = timezone.replace("'", "''")
            local = f"from_utc_timestamp(cast(({ts_sql}) as timestamp), '{tz}')"
            shifted = f"timestamp_micros(unix_micros({local}) - {off.us})"
            inner = time_bucket_sql(width, shifted, origin=origin)
            return (
                f"to_utc_timestamp(timestamp_micros(unix_micros({inner}) "
                f"+ {off.us}), '{tz}')"
            )
        shifted = f"timestamp_micros(unix_micros(cast(({ts_sql}) as timestamp)) - {off.us})"
        inner = time_bucket_sql(width, shifted, origin=origin)
        return f"timestamp_micros(unix_micros({inner}) + {off.us})"

    if timezone is not None:
        tz = timezone.replace("'", "''")
        local = f"from_utc_timestamp(cast(({ts_sql}) as timestamp), '{tz}')"
        if iv.months:
            om = DEFAULT_ORIGIN_MONTHS if origin is None else _origin_months_of(origin)
            local_bucket = _bucket_month_sql(local, iv.months, om)
        else:
            local_bucket = _bucket_us_sql(local, iv.us, _origin_to_us(origin))
        return f"to_utc_timestamp({local_bucket}, '{tz}')"

    if iv.months:
        om = DEFAULT_ORIGIN_MONTHS if origin is None else _origin_months_of(origin)
        return _bucket_month_sql(f"cast(({ts_sql}) as timestamp)", iv.months, om)
    return _bucket_us_sql(f"cast(({ts_sql}) as timestamp)", iv.us, _origin_to_us(origin))


def _bucket_us_sql(ts_sql: str, width_us: int, origin_us: int) -> str:
    if width_us <= 0:
        raise ValueError("period must be greater than 0")
    us = f"unix_micros({ts_sql})"
    return f"timestamp_micros({us} - pmod({us} - {origin_us}, {width_us}))"


def _bucket_month_sql(ts_sql: str, width_months: int, origin_months: int) -> str:
    if width_months <= 0:
        raise ValueError("period must be greater than 0")
    midx = f"(year({ts_sql}) * 12 + month({ts_sql}) - 1)"
    b = f"({midx} - pmod({midx} - {origin_months}, {width_months}))"
    return (
        f"cast(make_date(cast(floor({b} / 12) as int), "
        f"cast(pmod({b}, 12) + 1 as int), 1) as timestamp)"
    )


def time_bucket_int_sql(width: int, x_sql: str, offset: int = 0) -> str:
    """SQL text form of :func:`time_bucket_int` (same TIME_BUCKET macro)."""
    if width <= 0:
        raise ValueError("period must be greater than 0")
    x = f"({x_sql})"
    return f"({x} - pmod({x} - {offset}, {width}))"


def time_bucket_int(
    width: int,
    x: Union[str, Column],
    offset: int = 0,
) -> Column:
    """Integer ``time_bucket`` (ts_int16/32/64_bucket, src/time_bucket.c:60-96).

    ``result = (x - shift) - pmod(x - shift, width) + shift`` — floor
    semantics for negative values, identical to the C TIME_BUCKET macro.
    """
    if width <= 0:
        raise ValueError("period must be greater than 0")
    col = _to_col(x)
    res = col - F.pmod(col - F.lit(offset), F.lit(width))
    return res
