"""Time-series SQL surface (reference ``sql/*.sql``) as Column expressions."""

from .bookend import first, last
from .histogram import histogram, width_bucket
from .tdigest import tdigest, tdigest_quantiles, tdigest_rollup
from .time import (
    DEFAULT_ORIGIN_US,
    Interval,
    parse_interval,
    time_bucket,
    time_bucket_date,
    time_bucket_int,
    to_timestamp_micros,
    to_unix_microseconds,
)
from .uuid7 import (
    generate_uuidv7,
    time_bucket_uuid,
    to_uuidv7,
    to_uuidv7_boundary,
    uuid_timestamp,
    uuid_timestamp_micros,
    uuid_version,
)

__all__ = [
    "DEFAULT_ORIGIN_US",
    "Interval",
    "parse_interval",
    "time_bucket",
    "time_bucket_date",
    "time_bucket_int",
    "to_timestamp_micros",
    "to_unix_microseconds",
    "first",
    "last",
    "histogram",
    "width_bucket",
    "tdigest",
    "tdigest_quantiles",
    "tdigest_rollup",
    "generate_uuidv7",
    "time_bucket_uuid",
    "to_uuidv7",
    "to_uuidv7_boundary",
    "uuid_timestamp",
    "uuid_timestamp_micros",
    "uuid_version",
]
