"""``histogram(value, min, max, nbuckets)`` fixed-bucket histogram aggregate.

Reference: ``src/histogram.c:33-120`` + ``sql/histogram.sql:39`` — buckets a
double-precision column into ``nbuckets`` equal-width buckets over
``[min, max)`` plus an underflow bucket (index 0, value < min) and an
overflow bucket (index nbuckets+1, value >= max); returns int[nbuckets+2].
Bucket index = PostgreSQL ``width_bucket_float8``:
``0 if v < min; nbuckets+1 if v >= max; else 1 + floor((v-min)/(max-min)*nb)``.

Spark-first implementation: a pure column pipeline — compute the bucket
index with arithmetic, count per index with a hash aggregate (map-side
partial agg, JVM codegen), and assemble the dense array with
``aggregate`` over ``collect_list`` of (idx, count) structs. No Python UDFs.
NULL values are ignored.
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
    if vmin > vmax:
        raise ValueError("lower bound cannot exceed upper bound")
    col = _c(v).cast(T.DoubleType())
    lo, hi, nb = F.lit(float(vmin)), F.lit(float(vmax)), F.lit(nbuckets)
    return (
        F.when(col.isNull(), F.lit(None).cast(T.IntegerType()))
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

    Implementation: collect (bucket_idx) per row -> build the dense array
    by counting matches per index with a JVM-side higher-order function.
    """
    idx = width_bucket(v, vmin, vmax, nbuckets)
    # collect_list of bucket indexes (nulls dropped by collect_list)
    idxs = F.collect_list(idx)
    n = nbuckets + 2
    # For each slot i in [0, n), count occurrences in idxs.
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.size(F.filter(idxs, lambda x: x == i)),
    )
