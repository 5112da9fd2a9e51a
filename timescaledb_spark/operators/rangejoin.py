"""Range join: match points to containing intervals without a
nested-loop plan.

PostgreSQL executes ``l.ts BETWEEN r.lo AND r.hi`` joins as merge/
nested-loop with btree support; Spark's only native strategy for a pure
inequality join is BroadcastNestedLoopJoin — O(n·m) compares and a
broadcast-sized right side. The scale path here is grid bucketization
(the same trick behind Databricks' range-join hints):

1. pick a bucket width W in the time column's native units;
2. explode each right interval [lo, hi) into the grid cells it covers —
   m·(avg width / W) rows;
3. equi-join points to cells on (cell [, by-keys]) — ONE hash shuffle;
4. re-check exact containment.

A point lies in exactly one cell, so each (point, interval) pair meets
in at most one cell — no duplicate elimination is ever needed. Cost
scales with n + m·(width/W) + matches, not n·m. W is the dial: too
small explodes the right side, too large packs unrelated rows into one
cell; a good default is the median interval width. Intervals are
half-open ``[lo, hi)`` like chunk ranges; ``closed='both'`` gives
BETWEEN semantics.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.time import parse_interval


def _width_units(width: Union[str, int], is_ts: bool) -> int:
    if isinstance(width, int):
        return width
    iv = parse_interval(width)
    if iv.months:
        raise ValueError("range_join bucket width must be fixed-width")
    if not is_ts:
        raise ValueError("integer range columns need an integer width")
    return iv.us


def _units(col: Column, is_ts: bool) -> Column:
    return F.unix_micros(col.cast("timestamp")) if is_ts else col.cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    width: Union[str, int],
    by: Sequence[str] = (),
    closed: str = "left",
    how: str = "inner",
) -> DataFrame:
    """Join each left row (point column ``point``) to every right
    interval ``[lo, hi)`` (``[lo, hi]`` with ``closed='both'``)
    containing it, optionally also matching equality ``by`` keys.
    ``width`` is the grid bucket width (interval string for timestamps,
    int for integer time). ``how``: ``inner``, or ``left`` to keep
    unmatched points once with NULL right columns.
    """
    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    by = list(by)
    is_ts = dict(left.dtypes)[point].startswith("timestamp")
    w = _width_units(width, is_ts)

    overlap = (set(left.columns) & set(right.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} exist on both sides; rename first"
        )
    r_cols = [c for c in right.columns if c not in by]

    # explicit aliases: both sides often derive from the SAME table
    # (e.g. events joined to event-derived intervals) and bare df[col]
    # references would hit Spark's self-join ambiguity heuristics
    p_units = _units(F.col(point), is_ts)
    lpts = left.select(
        "*", F.floor(p_units / w).cast("long").alias("_cell")
    ).alias("_rjl")
    lcol = lambda c: F.col(f"_rjl.{c}")  # noqa: E731

    lo_u = _units(F.col(lo), is_ts)
    hi_u = _units(F.col(hi), is_ts)
    last_cell = F.floor((hi_u - F.lit(0 if closed == "both" else 1)) / w)
    rint = right.select(
        "*",
        F.explode(
            F.sequence(F.floor(lo_u / w).cast("long"), last_cell.cast("long"))
        ).alias("_cell"),
    ).alias("_rjr")
    rcol = lambda c: F.col(f"_rjr.{c}")  # noqa: E731

    p_u = _units(lcol(point), is_ts)
    lo_r = _units(rcol(lo), is_ts)
    hi_r = _units(rcol(hi), is_ts)
    contain = (p_u >= lo_r) & ((p_u <= hi_r) if closed == "both" else (p_u < hi_r))

    cond = [lcol("_cell") == rcol("_cell")] + [
        lcol(c).eqNullSafe(rcol(c)) for c in by
    ]
    cond_all = cond[0]
    for c in cond[1:]:
        cond_all = cond_all & c
    if how == "inner":
        return (
            lpts.join(rint, cond_all, "inner")
            .filter(contain)
            .select(
                *[lcol(c) for c in left.columns],
                *[rcol(c) for c in r_cols],
            )
        )

    # left join: a point may have cell partners that all fail the exact
    # containment check — those rows must collapse to ONE null-extended
    # row. _rid identifies left rows. monotonically_increasing_id is
    # NONdeterministic across recomputation (a stage retry would hand
    # the same left row a different id on the probe side than the window
    # side, duplicating or dropping rows) — localCheckpoint materializes
    # the ids once so every downstream read sees the same assignment.
    lid = (
        lpts.withColumn("_rid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
        .alias("_rjl")
    )
    j = lid.join(rint, cond_all, "left")
    keep = contain & rcol("_cell").isNotNull()
    wspec = Window.partitionBy("_rid")
    tagged = j.select(
        *[lcol(c) for c in left.columns],
        F.col("_rid"),
        keep.cast("int").alias("_keep"),
        *[F.when(keep, rcol(c)).alias(c) for c in r_cols],
    )
    return (
        tagged.withColumn("_any", F.max("_keep").over(wspec))
        .withColumn(
            "_rn",
            F.row_number().over(wspec.orderBy(F.col("_keep").desc())),
        )
        .filter((F.col("_keep") == 1) | (F.col("_any") == 0) & (F.col("_rn") == 1))
        .select(*left.columns, *r_cols)
    )
