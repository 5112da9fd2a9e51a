"""Skew-mitigation utilities: salted aggregation and salted joins.

WHICH TOOL FOR WHICH SKEW (measured, scripts/scale_probe.py on a
50%-hot-key distribution):

- **Joins: prefer AQE.** AQE's skew-join splitting (on by default in
  ``build_spark``) matched or beat :func:`salted_join` in every probe
  round (r6: AQE 2.56s vs salted 3.08s; r7: 2.09 vs 1.95 — noise-level)
  without paying the small-side ×``salt_n`` replication or the manual
  tuning. Reach for :func:`salted_join` only when AQE is unavailable
  (stateful streaming joins disable AQE) or the skew is in a
  broadcast-ineligible non-equi join AQE can't split.
- **Aggregations: salt when partial aggregation can't compress.** For
  algebraic aggregates (sum/count/min/max/avg) Spark's map-side partial
  aggregation already collapses a hot key to one row per task — probe
  r7 shows plain ≈ salted (0.91s vs 1.00s) for those. :func:`salted_agg`
  wins when the partial state itself is large or the reduce-side work
  dominates — count-distinct-style state, collect_list, high-cardinality
  compound keys under memory pressure (probe r6 measured 3.5×:
  5.06s → 1.46s under executor-memory pressure). AQE cannot help here
  at all: one reduce KEY is indivisible for a hash aggregate.

Both forms are pure DataFrame rewrites — no RDDs, no UDFs — so they
compose with pushdown and codegen.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: aggregate merge rules for the two-phase salted aggregation
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``keys`` with a salt shard:
    ``groupBy(keys + salt)`` partial → ``groupBy(keys)`` merge.

    ``aggs``: output name -> (function, column) with function in
    sum/count/min/max (the algebraic set that merges losslessly).
    A key receiving 50% of all rows is spread over ``salt_n`` reducers in
    phase one; phase two merges ``salt_n`` tiny rows per key.
    """
    bad = [f for f, _ in aggs.values() if f not in _MERGE]
    if bad:
        raise ValueError(f"non-mergeable aggregate(s): {bad}; use sum/count/min/max")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    partial_exprs = []
    for name, (fn, col) in aggs.items():
        partial = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        partial_exprs.append(partial.alias(f"_p_{name}"))
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    merge_exprs = [
        _MERGE[fn](f"_p_{name}").alias(name) for name, (fn, _col) in aggs.items()
    ]
    return phase1.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed key frequencies and ``small`` is
    too large to broadcast: ``big`` rows get a random-but-deterministic
    salt in [0, salt_n); ``small`` is replicated ``salt_n`` times; the
    join key becomes (keys..., salt), spreading each hot key over
    ``salt_n`` shuffle partitions at the cost of replicating the small
    side ``salt_n``×.
    """
    keys = list(keys)
    bsalt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    b = big.withColumn("_salt", bsalt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    out = b.join(s, keys + ["_salt"], how)
    return out.drop("_salt")
