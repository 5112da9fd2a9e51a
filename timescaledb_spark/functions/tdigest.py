"""t-digest quantile sketches — the toolkit's SECOND percentile algebra
(``tdigest(size, value)`` + ``rollup`` + ``approx_percentile``;
timescaledb-toolkit tdigest, the latency-percentile workhorse the
Timescale docs steer users to next to ``percentile_agg``/uddsketch).
Published algorithm: Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests" (arXiv:1902.04023) — rank-ERROR bounded
(tight at the tails), vs DDSketch's relative-VALUE-error bound
(:mod:`.ddsketch`).

State (mergeable): ``struct(n: long, min: double, max: double,
means: array<double>, weights: array<long>)`` — at most ``delta``
centroids sorted by mean.

Spark-first construction — no UDFs anywhere:

- **build**: one rank window per group orders the values; each value's
  quantile midpoint ``q = (rank − ½)/n`` is binned by the k1 scale
  function ``k(q) = δ·(asin(2q−1)/π + ½)`` (arXiv:1902.04023 §2.2 —
  uniform in asin, so tail clusters are tiny and tail quantiles
  precise); one map-combined groupBy folds each bin to a weighted
  centroid, and a second groupBy collects ≤ ``delta`` centroids per
  group — the same bounded-collect discipline as the Misra–Gries
  frequency partials.
- **lossless regime**: while a group holds ≤ ``delta`` values every
  centroid is a SINGLETON (rank-indexed, no binning) — the digest is
  exact, and quantile extraction then returns type-7
  (SQL ``percentile_cont``) interpolation bit-for-bit, which is what
  makes the oracle gate hash-checkable.
- **merge** (``rollup``): concatenate centroid lists, re-sort by mean,
  re-bin by cumulative-weight midpoint quantiles, fold — an
  order-independent (commutative, deterministic) re-clustering, so
  cagg states regroup freely at any coarser grain. min/max/n merge
  exactly.
- **extract**: pure array expressions over the stored state — prefix
  sums via ``aggregate``, bracket search via ``filter(sequence(...))``,
  linear interpolation between centroid midpoints (the standard
  t-digest quantile rule), clamped to the first/last centroid mean.

Rank-error: a k1 bin spans at most ``sin(π/δ) ≈ π/δ`` in q around the
middle and far less at the tails, so an extracted quantile's rank error
is ≤ ~π/(2δ) mid-range (tested in ``tests/test_tdigest.py``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

#: default compression (max centroids), the toolkit example size
DEFAULT_DELTA = 200


def _qname(q: float) -> str:
    """0.5 -> p50, 0.95 -> p95, 0.999 -> p99_9 (ddsketch convention)."""
    return "p" + f"{q * 100:g}".replace(".", "_")


def _check_delta(delta: int) -> int:
    delta = int(delta)
    if delta < 2:
        raise ValueError("tdigest delta (compression) must be >= 2")
    return delta


def _cluster_col(rk: Column, n: Column, delta: int) -> Column:
    """k1 scale-function bin for a value at rank ``rk`` of ``n``:
    singleton (rank) while the group fits ``delta``, else
    ``floor(δ·(asin(2q−1)/π + ½))`` of the rank midpoint quantile."""
    q = (rk.cast("double") - 0.5) / n.cast("double")
    binned = F.least(
        F.floor(
            F.lit(float(delta))
            * (F.asin(2.0 * q - 1.0) / math.pi + 0.5)
        ),
        F.lit(delta - 1),
    )
    return F.when(n <= delta, rk.cast("long")).otherwise(
        binned.cast("long")
    )


def _state_struct(tn, tmn, tmx, ents) -> Column:
    return F.when(
        tn > 0,
        F.struct(
            tn.alias("n"),
            tmn.alias("min"),
            tmx.alias("max"),
            F.expr(f"transform({ents}, c -> c.mean)").alias("means"),
            F.expr(
                f"transform({ents}, c -> CAST(c.weight AS BIGINT))"
            ).alias("weights"),
        ),
    )


def build_states(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    delta: int,
    out: str,
) -> DataFrame:
    """Per-``keys`` t-digest states from raw rows. Strict NULL
    semantics: NULL values are skipped; a group whose values are all
    NULL still gets a row, with a NULL state."""
    delta = _check_delta(delta)
    base = df.select(*keys, value.cast("double").alias("_v"))
    w = Window.partitionBy(*keys).orderBy(F.col("_v").asc_nulls_last())
    # non-null count as a FULL frame of the same ordered spec (not a
    # separate partition-only window): both window functions share one
    # sort and one WindowExec (round 14 — same trick as merge_states)
    nn = F.count("_v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    d = base.select(
        *keys,
        "_v",
        nn.alias("_n"),
        F.row_number().over(w).alias("_rk"),
    )
    cl = F.when(F.col("_v").isNull(), F.lit(None).cast("long")).otherwise(
        _cluster_col(F.col("_rk"), F.col("_n"), delta)
    )
    per = d.groupBy(*keys, cl.alias("_cl")).agg(
        F.count("_v").alias("_w"),
        F.avg("_v").alias("_m"),
        F.min("_v").alias("_mn"),
        F.max("_v").alias("_mx"),
    )
    ent = F.when(
        F.col("_cl").isNotNull(),
        F.struct(F.col("_m").alias("mean"), F.col("_w").alias("weight")),
    )
    flat = per.groupBy(*keys).agg(
        F.sum(
            F.when(F.col("_cl").isNotNull(), F.col("_w"))
        ).alias("_tn"),
        F.min("_mn").alias("_tmn"),
        F.max("_mx").alias("_tmx"),
        F.array_sort(F.collect_list(ent)).alias("_te"),
    )
    return flat.select(
        *keys,
        _state_struct(
            F.col("_tn"), F.col("_tmn"), F.col("_tmx"), "_te"
        ).alias(out),
    )


def merge_states(
    d: DataFrame,
    keys: Sequence[str],
    state_col: str,
    delta: int,
    out: str,
) -> DataFrame:
    """Merge one state per ``keys`` group from many input states —
    ``rollup(tdigest)``. NULL input states are kept by contract (the
    group survives with a NULL state when ALL inputs are NULL).
    Order-independent: global re-sort by centroid mean, re-bin by
    cumulative-weight midpoint, fold; the collect is ≤ ``delta``
    entries per group (bins bound it when total weight > delta, total
    centroid count ≤ total weight ≤ delta bounds it otherwise)."""
    delta = _check_delta(delta)
    st = F.col(state_col)
    # ONE pipeline, ONE shuffle (round 14 — the r13 shape was the most
    # expensive serve in the system at x100: 3 window expressions over
    # 2 specs plus a separate totals aggregation joined back by sort-
    # merge). Shape-preserving rewrites:
    # - NULL states explode to one dummy (NULL, NULL) entry, so every
    #   input group keeps a row and the totals branch + left join
    #   disappear (all-NULL group ⇔ _tn stays NULL);
    # - group n / min / max ride the exploded rows (each state's
    #   scalars repeat on its centroids; n == Σweights for any valid
    #   digest) and fold in the same two aggregations as the bins;
    # - cumulative weight and total weight are two FRAMES of one
    #   window spec → a single sort, one WindowExec;
    # - the singleton-regime rank IS cumb+1 (total weight ≤ delta ⇒
    #   every input centroid is a parent singleton of weight 1), so
    #   row_number() goes away entirely.
    ents = F.when(
        st.isNotNull(),
        F.arrays_zip(st["means"].alias("_m"), st["weights"].alias("_w")),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(None).cast("double").alias("_m"),
                F.lit(None).cast("bigint").alias("_w"),
            )
        )
    )
    rows = d.select(
        *keys,
        st["min"].alias("_smn"),
        st["max"].alias("_smx"),
        F.explode(ents).alias("_c"),
    ).select(
        *keys,
        "_smn",
        "_smx",
        F.col("_c._m").alias("_m"),
        F.col("_c._w").alias("_w"),
    )
    worder = Window.partitionBy(*keys).orderBy(
        F.col("_m").asc_nulls_last(), F.col("_w").asc()
    )
    cumb = F.coalesce(
        F.sum("_w").over(
            worder.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    big_n = F.sum("_w").over(
        worder.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    rows = rows.select(
        *keys,
        "_smn",
        "_smx",
        "_m",
        "_w",
        cumb.alias("_cumb"),
        big_n.alias("_N"),
    )
    qmid = (
        F.col("_cumb").cast("double") + F.col("_w").cast("double") / 2.0
    ) / F.col("_N").cast("double")
    binned = F.least(
        F.floor(
            F.lit(float(delta)) * (F.asin(2.0 * qmid - 1.0) / math.pi + 0.5)
        ),
        F.lit(delta - 1),
    )
    cl = F.when(F.col("_m").isNull(), F.lit(None).cast("long")).when(
        F.col("_N") <= delta, F.col("_cumb") + 1
    ).otherwise(binned.cast("long"))
    per = rows.groupBy(*keys, cl.alias("_cl")).agg(
        F.sum("_w").alias("_w2"),
        (
            F.sum(F.col("_m") * F.col("_w").cast("double"))
            / F.sum("_w").cast("double")
        ).alias("_m2"),
        F.min("_smn").alias("_bmn"),
        F.max("_smx").alias("_bmx"),
    )
    ent2 = F.when(
        F.col("_cl").isNotNull(),
        F.struct(F.col("_m2").alias("mean"), F.col("_w2").alias("weight")),
    )
    cents = per.groupBy(*keys).agg(
        F.sum(F.when(F.col("_cl").isNotNull(), F.col("_w2"))).alias("_tn"),
        F.min("_bmn").alias("_tmn"),
        F.max("_bmx").alias("_tmx"),
        F.array_sort(F.collect_list(ent2)).alias("_te"),
    )
    return cents.select(
        *keys,
        F.when(
            F.col("_tn").isNotNull(),
            _state_struct(
                F.col("_tn"), F.col("_tmn"), F.col("_tmx"), "_te"
            ).cast(
                "struct<n:bigint,min:double,max:double,"
                "means:array<double>,weights:array<bigint>>"
            ),
        ).alias(out),
    )


def quantile_expr(state: str, q: float) -> Column:
    """Quantile of a stored t-digest state (SQL column reference
    ``state``): exact type-7 (``percentile_cont``) interpolation while
    the digest is lossless (every centroid a singleton — real t-digest
    implementations are likewise exact below the compression
    threshold), the standard centroid-midpoint interpolation rule
    otherwise, clamped to the first/last centroid mean."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile {q} outside [0, 1]")
    st = state
    qs = repr(float(q))
    # ---- lossless path: type-7 over the singleton means
    pos = f"({qs} * ({st}.n - 1))"
    lo_i = f"(CAST(floor({pos}) AS INT) + 1)"
    exact = (
        f"(element_at({st}.means, {lo_i}) + "
        f"(element_at({st}.means, least({lo_i} + 1, CAST({st}.n AS INT)))"
        f" - element_at({st}.means, {lo_i}))"
        f" * ({pos} - floor({pos})))"
    )
    # ---- compressed path: midpoint interpolation
    cum = (
        f"aggregate({st}.weights, array(CAST(0 AS DOUBLE)), "
        f"(acc, w) -> array_append(acc, element_at(acc, -1) + "
        f"CAST(w AS DOUBLE)))"
    )
    mid = (
        f"(element_at(_tdc, i) + "
        f"CAST(element_at({st}.weights, i) AS DOUBLE) / 2.0D)"
    )
    t = f"({qs} * CAST({st}.n AS DOUBLE))"
    idx = (
        f"size(filter(sequence(1, size({st}.means)), i -> {mid} <= {t}))"
    )
    lo_m = f"element_at({st}.means, _tdi)"
    hi_m = f"element_at({st}.means, _tdi + 1)"
    mlo = (
        f"(element_at(_tdc, _tdi) + "
        f"CAST(element_at({st}.weights, _tdi) AS DOUBLE) / 2.0D)"
    )
    mhi = (
        f"(element_at(_tdc, _tdi + 1) + "
        f"CAST(element_at({st}.weights, _tdi + 1) AS DOUBLE) / 2.0D)"
    )
    general = (
        # bind cum array and bracket index once via nested lambdas
        f"(SELECT 1)"  # placeholder, replaced below
    )
    # spell the general path with two lambda bindings (transform over a
    # 1-element array is the expression-level `let`)
    general = (
        f"element_at(transform(array({cum}), _tdc -> "
        f"element_at(transform(array({idx}), _tdi -> "
        f"CASE WHEN _tdi <= 0 THEN element_at({st}.means, 1) "
        f"WHEN _tdi >= size({st}.means) THEN "
        f"element_at({st}.means, size({st}.means)) "
        f"ELSE {lo_m} + ({hi_m} - {lo_m}) * ({t} - {mlo}) / ({mhi} - {mlo}) "
        f"END), 1)), 1)"
    )
    return F.expr(
        f"CASE WHEN {st} IS NULL THEN NULL "
        f"WHEN {st}.n = 1 THEN element_at({st}.means, 1) "
        f"WHEN {st}.n = size({st}.means) THEN {exact} "
        f"ELSE {general} END"
    )


def rank_expr(state: str, value: float) -> Column:
    """``approx_percentile_rank(value, tdigest)`` — the inverse (CDF)
    accessor: fraction of ingested values ≤ ``value``, answered from
    the stored state (same convention as :func:`.ddsketch.ddsketch_rank`).

    Exact while the digest is lossless (every centroid a singleton):
    ``count(means ≤ v) / n`` — which is what makes the oracle gate
    hash-checkable against a DuckDB ``count(*) FILTER (v <= x)``
    replay. Compressed digests use the standard t-digest CDF rule
    (Dunning & Ertl arXiv:1902.04023 §2.1): linear interpolation of
    cumulative weight between adjacent centroid MIDPOINTS, with the
    half-centroid tails interpolated against the exact stored
    min/max. Clamped to [0, 1]; NULL state → NULL."""
    st = state
    v = repr(float(value))
    nmeans = f"size({st}.means)"
    # ---- lossless path: exact count of singletons <= v
    exact = (
        f"(CAST(size(filter({st}.means, m -> m <= {v})) AS DOUBLE)"
        f" / CAST({st}.n AS DOUBLE))"
    )
    # ---- compressed path: midpoint interpolation of cumulative weight
    cum = (
        f"aggregate({st}.weights, array(CAST(0 AS DOUBLE)), "
        f"(acc, w) -> array_append(acc, element_at(acc, -1) + "
        f"CAST(w AS DOUBLE)))"
    )
    idx = f"size(filter({st}.means, m -> m <= {v}))"
    nn = f"CAST({st}.n AS DOUBLE)"
    mid = (
        "(element_at(_tdc, _tdi) + "
        f"CAST(element_at({st}.weights, _tdi) AS DOUBLE) / 2.0D)"
    )
    mid1 = (
        "(element_at(_tdc, _tdi + 1) + "
        f"CAST(element_at({st}.weights, _tdi + 1) AS DOUBLE) / 2.0D)"
    )
    lo_m = f"element_at({st}.means, _tdi)"
    hi_m = f"element_at({st}.means, _tdi + 1)"
    # below the first centroid mean: ramp 0 -> w1/2 over [min, mean1]
    head = (
        f"(CAST(element_at({st}.weights, 1) AS DOUBLE) / 2.0D"
        f" * ({v} - {st}.min)"
        f" / nullif(element_at({st}.means, 1) - {st}.min, 0.0D))"
    )
    # above the last centroid mean: ramp n - wk/2 -> n over [meank, max]
    tail = (
        f"({nn} - CAST(element_at({st}.weights, _tdi) AS DOUBLE) / 2.0D"
        f" + CAST(element_at({st}.weights, _tdi) AS DOUBLE) / 2.0D"
        f" * ({v} - {lo_m}) / nullif({st}.max - {lo_m}, 0.0D))"
    )
    general = (
        f"element_at(transform(array({cum}), _tdc -> "
        f"element_at(transform(array({idx}), _tdi -> "
        f"CASE WHEN _tdi <= 0 THEN coalesce({head}, 0.0D) "
        f"WHEN _tdi >= {nmeans} THEN coalesce({tail}, {nn}) "
        f"ELSE {mid} + ({mid1} - {mid}) * ({v} - {lo_m}) "
        f"/ nullif({hi_m} - {lo_m}, 0.0D) "
        f"END), 1)), 1) / {nn}"
    )
    return F.expr(
        f"CASE WHEN {st} IS NULL THEN NULL "
        f"WHEN {v} < {st}.min THEN 0.0D "
        f"WHEN {v} >= {st}.max THEN 1.0D "
        f"WHEN {st}.n = {nmeans} THEN {exact} "
        f"ELSE least(1.0D, greatest(0.0D, coalesce({general}, 0.0D))) "
        f"END"
    )


def tdigest(
    df: DataFrame,
    value_col: str = "value",
    by: Sequence[str] = (),
    delta: int = DEFAULT_DELTA,
    out: str = "tdigest",
) -> DataFrame:
    """``tdigest(delta, value)`` — one mergeable digest state per
    ``by`` group (toolkit two-step aggregate form)."""
    return build_states(df, list(by), F.col(value_col), delta, out)


def tdigest_rollup(
    df: DataFrame,
    by: Sequence[str] = (),
    state_col: str = "tdigest",
    delta: int = DEFAULT_DELTA,
    out: Optional[str] = None,
) -> DataFrame:
    """``rollup(tdigest)`` — merge many states to one per ``by``."""
    return merge_states(df, list(by), state_col, delta, out or state_col)


def mean_expr(state: str) -> Column:
    """``mean(tdigest)`` — EXACT regardless of compression: each
    centroid's mean is the average of the values it absorbed, so
    ``Σ mean_i·w_i`` recovers the true sum (toolkit tdigest ``mean``
    accessor)."""
    return F.expr(
        f"CASE WHEN {state} IS NULL THEN NULL ELSE "
        f"aggregate(zip_with({state}.means, {state}.weights, "
        f"(m, w) -> m * CAST(w AS DOUBLE)), CAST(0 AS DOUBLE), "
        f"(a, x) -> a + x) / CAST({state}.n AS DOUBLE) END"
    )


def tdigest_quantiles(
    df: DataFrame,
    qs: Sequence[float],
    by: Sequence[str] = (),
    state_col: str = "tdigest",
) -> DataFrame:
    """Extract ``approx_percentile`` columns (plus exact ``n`` /
    ``min_val`` / ``max_val`` / ``mean``) from stored states — one
    output row per input state row."""
    st = F.col(state_col)
    cols = [
        *by,
        st["n"].alias("n"),
        st["min"].alias("min_val"),
        st["max"].alias("max_val"),
        mean_expr(state_col).alias("mean"),
    ]
    for q in qs:
        cols.append(quantile_expr(state_col, q).alias(_qname(q)))
    return df.select(*cols)


def tdigest_rank(
    df: DataFrame,
    value: float,
    by: Sequence[str] = (),
    state_col: str = "tdigest",
    out: str = "rank",
) -> DataFrame:
    """``approx_percentile_rank(value, tdigest)`` over stored states —
    one output row per input state row, rounded to 6 decimals (the
    :func:`.ddsketch.ddsketch_rank` convention so both percentile
    algebras serve identically-shaped rank frames)."""
    return df.select(
        *by,
        F.round(rank_expr(state_col, value), 6).alias(out),
    )
