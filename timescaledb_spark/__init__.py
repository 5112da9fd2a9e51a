"""timescaledb_spark — a PySpark-native time-series analytics engine with
the query and data-processing capabilities of timescale/timescaledb.

Built Spark-first: hypertables are chunk-partitioned parquet directories
with a driver-side catalog; continuous aggregates are incrementally
refreshed materialized tables with the reference's invalidation protocol;
time-series functions are pure Column expressions Catalyst can optimize.

See SURVEY.md for the reference mapping (file:line citations throughout).
"""

from . import views  # noqa: F401
from .functions import (  # noqa: F401
    first,
    histogram,
    last,
    time_bucket,
    time_bucket_date,
    time_bucket_int,
)
from .session import TSSession, build_spark  # noqa: F401

__version__ = "0.1.0"
