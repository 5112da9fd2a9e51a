"""``first(value, time)`` / ``last(value, time)`` bookend aggregates.

Reference: ``sql/bookend.sql:50,63`` + ``src/agg_bookend.c:29-35`` — return
the value at the minimum / maximum of the second argument. Rows whose
``time`` argument is NULL are ignored (PG strict transition behavior).

Spark's built-in ``min_by`` / ``max_by`` are exact matches and run fully
JVM-side with partial aggregation (the reference's combine/serialize
functions, ``src/agg_bookend.c:453-604``, exist for the same reason —
parallel-safe partial aggregation).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, functions as F


def _c(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def first(value: Union[str, Column], time: Union[str, Column]) -> Column:
    """Value at the smallest ``time`` (sql/bookend.sql:50)."""
    return F.min_by(_c(value), _c(time))


def last(value: Union[str, Column], time: Union[str, Column]) -> Column:
    """Value at the largest ``time`` (sql/bookend.sql:63)."""
    return F.max_by(_c(value), _c(time))
