"""As-of join: match each left row to the nearest right row at-or-before
(backward) / at-or-after (forward) its timestamp within optional
equality keys and tolerance.

The reference expresses this with LATERAL (.. ORDER BY time DESC
LIMIT 1) subqueries over hypertables; engines like kdb/QuestDB have it
natively; pandas has ``merge_asof``. Spark has neither, and the naive
range-join (``l.ts >= r.ts`` + window to keep the max) explodes to
O(n·m) pairs before pruning.

Strategy here is the union-tag pattern — a composition of built-in ops
with ONE hash shuffle and no range join: tag and union both inputs,
sort each ``by``-partition by (time, side), and carry the latest right
row forward as a packed struct with ``last(_, ignorenulls)``. The right
row's columns ride in one struct so they always come from the SAME
matched row (per-column carries could mix rows when values are null).
Cost: shuffle of n+m rows on the ``by`` keys — the same price as a
plain equi-join of the two tables; the sort is per-partition,
codegen-friendly, and AQE-splittable. Without ``by`` keys the window is
a single partition (documented scale hazard, same as any global sort).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.time import parse_interval


def _tolerance_us(
    tolerance: Union[str, int, None], on_is_ts: bool = True
) -> Optional[int]:
    if tolerance is None:
        return None
    if isinstance(tolerance, int):
        return tolerance
    if not on_is_ts:
        # an interval string parses to MICROSECONDS, but an integer 'on'
        # column compares in its own native units — silently mixing the
        # two under-matches by orders of magnitude (same rule as
        # rangejoin._width_units)
        raise ValueError(
            "asof tolerance for an integer 'on' column must be a raw int "
            "in the column's units, not an interval string"
        )
    iv = parse_interval(tolerance)
    if iv.months:
        raise ValueError("asof tolerance must be a fixed-width interval")
    return iv.us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance: Union[str, int, None] = None,
    allow_exact_matches: bool = True,
    right_suffix: str = "",
) -> DataFrame:
    """pandas ``merge_asof`` semantics on Spark DataFrames.

    Every left row is returned once, joined to the columns of the
    nearest right row whose ``on`` value is <= (backward) or >= (forward)
    the left row's — strictly so when ``allow_exact_matches=False`` —
    restricted to equal ``by`` keys and, if given, to
    ``|left.on - right.on| <= tolerance`` (interval string or int in the
    column's native integer units). Unmatched rows keep NULLs.
    ``right_suffix`` renames colliding right columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    shared = [on, *by]
    r_value_cols = [c for c in right.columns if c not in shared]
    out_names = {}
    for c in r_value_cols:
        name = c + right_suffix
        if name in left.columns:
            raise ValueError(
                f"right column {name!r} collides with a left column; "
                f"pass right_suffix"
            )
        out_names[c] = name

    on_is_ts = dict(right.dtypes)[on].startswith("timestamp")
    packed = F.struct(
        F.col(on).alias("_match_on"),
        *[F.col(c).alias(c) for c in r_value_cols],
    )
    # side tag ordering decides whether an equal-timestamp right row is
    # visible to the left row's carry window
    l_tag, r_tag = (1, 0) if allow_exact_matches else (0, 1)
    lu = left.select(
        "*",
        F.lit(None).cast(
            right.select(packed).schema[0].dataType
        ).alias("_r"),
        F.lit(l_tag).alias("_side"),
    )
    # NULL 'on' values never match (merge_asof rejects null keys; here
    # they are unmatchable): a null-ts right row would otherwise sort
    # nulls-first and its non-null struct would be carried into every
    # early left row
    ru = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in shared],
        packed.alias("_r"),
        F.lit(r_tag).alias("_side"),
    )
    u = lu.unionByName(ru, allowMissingColumns=True)

    order = [F.col(on), F.col("_side")]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("_side")]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("_r"), ignorenulls=True).over(w)

    out = (
        # a null-ts LEFT row keeps its place in the output but matches
        # nothing (under 'forward' desc it would otherwise sort last and
        # pick up the minimum-timestamp right row)
        u.withColumn("_m", F.when(F.col(on).isNotNull(), carried))
        .filter(F.col("_side") == F.lit(l_tag))
        .drop("_r", "_side")
    )
    tol = _tolerance_us(tolerance, on_is_ts)
    if tol is not None:
        lo = F.col(on)
        ro = F.col("_m._match_on")
        if on_is_ts:
            gap = F.abs(F.unix_micros(lo.cast("timestamp")) - F.unix_micros(ro.cast("timestamp")))
        else:
            gap = F.abs(lo.cast("long") - ro.cast("long"))
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(tol), F.col("_m"))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in r_value_cols],
    )
