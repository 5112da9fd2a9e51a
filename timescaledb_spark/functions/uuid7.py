"""UUIDv7 helpers (time-ordered UUIDs).

Reference: ``sql/uuidv7.sql:5-40`` + ``src/uuid.c`` —
``generate_uuidv7()``, ``to_uuidv7(ts)``, ``to_uuidv7_boundary(ts)``,
``uuid_timestamp(uuid)``, ``uuid_timestamp_micros(uuid)``, ``uuid_version``.

UUIDv7 layout (RFC 9562): 48-bit unix milliseconds | version nibble (7) |
12 bits sub-ms (we use the µs remainder * 4096 / 1000, matching the
reference's sub-millisecond precision encoding) | variant bits | random.

All pure column expressions over hex strings (StringType canonical form).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T


def _c(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _hex_n(col: Column, n: int) -> Column:
    """Zero-padded lowercase hex of an integral column, width n."""
    return F.lpad(F.lower(F.hex(col)), n, "0")


def _ms_guarded(us: Column) -> Column:
    """Unix milliseconds for the 48-bit UUIDv7 time field. A negative
    (pre-1970) or >= 2^48 value would be silently TRUNCATED by the
    fixed-width hex pad — producing a corrupt UUID that violates the
    ordering/extraction contracts — so both raise instead."""
    ms = F.floor(us / F.lit(1000)).cast(T.LongType())
    return F.when(
        (ms < 0) | (ms >= F.lit(1 << 48)),
        F.raise_error(
            F.lit(
                "to_uuidv7: timestamp outside the 48-bit unsigned "
                "millisecond range of RFC 9562 (1970-01-01 .. ~10889 AD)"
            )
        ),
    ).otherwise(ms)


def to_uuidv7_boundary(ts: Union[str, Column]) -> Column:
    """Smallest UUIDv7 for a timestamp — zero random bits.

    Mirrors ``to_uuidv7_boundary(timestamptz)`` (sql/uuidv7.sql:25): useful
    as a range-query boundary on UUIDv7 key columns.
    """
    us = F.unix_micros(_c(ts).cast(T.TimestampType()))
    ms = _ms_guarded(us)
    sub_us = (us - ms * F.lit(1000)).cast(T.LongType())  # 0..999
    # 12-bit sub-ms field: scaled microsecond remainder (x4096/1000).
    frac = F.floor(sub_us * F.lit(4096) / F.lit(1000)).cast(T.LongType())
    time_hex = _hex_n(ms, 12)  # 48 bits
    ver_frac_hex = _hex_n(F.lit(0x7000) + frac, 4)  # version 7 + 12 bits
    return F.concat_ws(
        "-",
        F.substring(time_hex, 1, 8),
        F.substring(time_hex, 9, 4),
        ver_frac_hex,
        F.lit("8000"),  # variant 10, zero rand
        F.lit("000000000000"),
    )


def to_uuidv7(ts: Union[str, Column], seed: Union[str, Column, None] = None) -> Column:
    """Deterministic UUIDv7 from a timestamp (+ optional seed column for
    the pseudo-random tail, so generation is reproducible/testable).

    Mirrors ``to_uuidv7(timestamptz)`` (sql/uuidv7.sql:17); the reference
    fills the tail with random bits — we derive them from xxhash64 of the
    timestamp (and seed) for determinism, which preserves the ordering and
    extraction contracts.
    """
    us = F.unix_micros(_c(ts).cast(T.TimestampType()))
    ms = _ms_guarded(us)
    sub_us = (us - ms * F.lit(1000)).cast(T.LongType())
    frac = F.floor(sub_us * F.lit(4096) / F.lit(1000)).cast(T.LongType())
    h = F.xxhash64(us) if seed is None else F.xxhash64(us, _c(seed))
    rand62 = F.abs(h)  # 62 usable bits
    rand_a = F.pmod(rand62, F.lit(0x4000))  # 14 bits -> variant field
    rand_b = F.pmod(F.floor(rand62 / F.lit(0x4000)).cast(T.LongType()),
                    F.lit(0x1000000000000))  # 48 bits
    time_hex = _hex_n(ms, 12)
    ver_frac_hex = _hex_n(F.lit(0x7000) + frac, 4)
    var_hex = _hex_n(F.lit(0x8000) + rand_a, 4)  # variant '10' + 14 rand bits
    tail_hex = _hex_n(rand_b, 12)
    return F.concat_ws(
        "-",
        F.substring(time_hex, 1, 8),
        F.substring(time_hex, 9, 4),
        ver_frac_hex,
        var_hex,
        tail_hex,
    )


def generate_uuidv7() -> Column:
    """Non-deterministic UUIDv7 at current timestamp (sql/uuidv7.sql:5)."""
    return to_uuidv7(F.current_timestamp(), seed=F.rand())


def uuid_version(u: Union[str, Column]) -> Column:
    """Version nibble of a canonical-form UUID string (sql/uuidv7.sql:35)."""
    return F.conv(F.substring(_c(u), 15, 1), 16, 10).cast(T.IntegerType())


def uuid_timestamp_micros(u: Union[str, Column]) -> Column:
    """Extract unix microseconds from a UUIDv7 (sql/uuidv7.sql:33)."""
    col = _c(u)
    ms = F.conv(
        F.concat(F.substring(col, 1, 8), F.substring(col, 10, 4)), 16, 10
    ).cast(T.LongType())
    frac = F.conv(F.substring(col, 16, 3), 16, 10).cast(T.LongType())
    sub_us = F.floor(frac * F.lit(1000) / F.lit(4096)).cast(T.LongType())
    return ms * F.lit(1000) + sub_us


def uuid_timestamp(u: Union[str, Column]) -> Column:
    """Extract timestamp from a UUIDv7 (sql/uuidv7.sql:29)."""
    return F.timestamp_micros(uuid_timestamp_micros(u))


def time_bucket_uuid(
    width,
    u: Union[str, Column],
    origin=None,
    offset=None,
    timezone=None,
) -> Column:
    """``time_bucket`` over UUIDv7 key columns — the reference's
    ``ts_uuid_bucket`` / ``ts_uuid_offset_bucket`` /
    ``ts_uuid_timezone_bucket`` overloads (sql/time_bucket.sql:18-45):
    extract the embedded timestamp, then bucket it like a timestamptz.
    Returns a timestamp (the reference returns TIMESTAMPTZ)."""
    from .time import time_bucket

    return time_bucket(
        width, uuid_timestamp(u), origin=origin, offset=offset, timezone=timezone
    )
