"""``histogram(value, min, max, nbuckets)`` fixed-bucket histogram aggregate.

Reference: ``src/histogram.c:33-120`` + ``sql/histogram.sql:39`` — buckets a
double-precision column into ``nbuckets`` equal-width buckets over
``[min, max)`` plus an underflow bucket (index 0, value < min) and an
overflow bucket (index nbuckets+1, value >= max); returns int[nbuckets+2].
Bucket index = PostgreSQL ``width_bucket_float8``:
``0 if v < min; nbuckets+1 if v >= max; else 1 + floor((v-min)/(max-min)*nb)``.

Spark-first implementation: a pure column pipeline — compute the bucket
index with arithmetic, then count per bucket as ``nbuckets + 2``
independent conditional ``sum`` aggregates assembled into one array.
The aggregation buffer is O(nbuckets) per group (one long per slot),
map-side partially aggregated inside a single whole-stage-codegen
HashAggregate — never O(rows-per-group), so a hot group at 100 TB
cannot blow up executor memory. No Python UDFs. NULL values are ignored.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T


def _c(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def width_bucket(
    v: Union[str, Column], vmin: float, vmax: float, nbuckets: int
) -> Column:
    """PostgreSQL ``width_bucket_float8`` as a column expression."""
    if vmin >= vmax:
        # PG parity: 'lower bound cannot equal upper bound' — equality
        # would make the bucket width zero and misbucket silently
        raise ValueError("lower bound must be below upper bound")
    col = _c(v).cast(T.DoubleType())
    lo, hi, nb = F.lit(float(vmin)), F.lit(float(vmax)), F.lit(nbuckets)
    return (
        F.when(col.isNull(), F.lit(None).cast(T.IntegerType()))
        .when(
            F.isnan(col),
            # PG raises 'operand ... cannot be NaN'; NaN fails both range
            # comparisons and would otherwise land silently in bucket 1
            F.raise_error(F.lit("width_bucket operand cannot be NaN")).cast(
                T.IntegerType()
            ),
        )
        .when(col < lo, F.lit(0))
        .when(col >= hi, F.lit(nbuckets + 1))
        .otherwise(
            (F.floor((col - lo) / (hi - lo) * nb) + F.lit(1)).cast(T.IntegerType())
        )
    )


def histogram(
    v: Union[str, Column], vmin: float, vmax: float, nbuckets: int
) -> Column:
    """Aggregate: dense int array of length ``nbuckets + 2``.

    Equivalent to the reference's ``histogram()`` aggregate
    (src/histogram.c:49 ``ts_hist_sfunc``). Usable inside
    ``df.groupBy(...).agg(histogram("v", 0, 100, 10).alias("hist"))``.

    Implementation: one conditional ``sum`` per bucket slot (a one-hot
    encoding summed component-wise), packed into an array. State per
    group is exactly ``nbuckets + 2`` longs regardless of group size,
    and Spark partial-aggregates it map-side.
    """
    idx = width_bucket(v, vmin, vmax, nbuckets)
    n = nbuckets + 2
    # idx == i is NULL for NULL input -> otherwise(0): NULLs count nowhere.
    return F.array(
        *[
            F.sum(F.when(idx == i, F.lit(1)).otherwise(F.lit(0)))
            .cast(T.IntegerType())
            for i in range(n)
        ]
    )
