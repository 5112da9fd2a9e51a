"""Continuous aggregates: incrementally-refreshed materialized aggregates
with the reference's invalidation-log / threshold / watermark protocol.

Reference: ``tsl/src/continuous_aggs/`` — protocol per its README:

- creation seeds the materialization invalidation log with the entire
  range (``create.c``; README "initial state ... invalidates the entire
  range"), so never-materialized regions stay dirty until refreshed.
- DML appends one (lowest, greatest) modified range per batch to the
  hypertable invalidation log, suppressed above the invalidation
  threshold (``insert.c:208``, ``invalidation_threshold.c``) — implemented
  in ``Hypertable._capture_invalidation``.
- ``refresh(start, end)`` is two-phase (``refresh.c:735``):
  txn 1 moves the threshold to the window end; txn 2 moves hypertable-log
  entries into every cagg's materialization log
  (``invalidation_process_hypertable_log``), cuts the refreshed cagg's log
  against the bucket-aligned window (``invalidation.c`` range algebra),
  merges overlapping dirty ranges, and per range deletes + re-inserts the
  materialized rows (``materialize.c:442-489``), then advances the
  watermark.
- Since v2.7 the mat table stores FINALIZED aggregate values
  (``sql/updates/2.24.0--2.25.0.sql:193-201`` removed partials), so
  refresh is plain re-aggregation of dirty ranges — which maps exactly to
  Spark aggregation + chunk-wise rewrite.
- realtime reads are ``mat WHERE bucket < watermark UNION ALL
  agg(raw WHERE time >= watermark)`` (``common.c:1745 build_union_query``).

Scale: refresh cost is O(dirty range), not O(table) — the dirty ranges
prune the raw-side scan through chunk exclusion, and the mat-side rewrite
only touches overlapping mat chunks.
"""

from __future__ import annotations

import json
import math
import os
import time as _time
from datetime import datetime, timezone as _tz
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F

from .functions.time import DEFAULT_ORIGIN_US, parse_interval
from .hypertable import Hypertable, _to_internal

INT64_MIN = -(2**63)
INT64_MAX = 2**63 - 1


def _struct_has_field(df: DataFrame, col: str, field: str) -> bool:
    """True when ``df[col]`` is a struct carrying ``field``.

    Serves consult this so states materialized BEFORE a field was
    added (counter/gauge ``num_changes``, rounds 13/14) keep working:
    absent field → the accessor serves NULL instead of failing at
    analysis time (no forced drop-and-recreate on upgrade)."""
    from pyspark.sql.types import StructType

    try:
        dt = df.schema[col].dataType
    except Exception:
        return False
    return isinstance(dt, StructType) and field in dt.names


def _grain_floor(us, width: int, origin_us: int):
    """Origin-aligned bucket floor on an int64-µs column — the column
    analog of ``time_bucket``'s fixed-width formula
    (``functions/time.py:_bucket_us_expr``). Every at-grain accessor
    must bucket with the CAGG'S origin (2000-01-03 for timestamps, 0
    for integer time), never epoch ``DIV``: DIV mislabels widths whose
    grid is not epoch-anchored (weeks: Thursday- vs Monday-aligned)
    and truncates toward zero for pre-epoch timestamps, and — worse —
    puts target edges strictly inside parent bucket spans, breaking
    the partial accessors' exactness premise."""
    return us - F.pmod(
        us - F.lit(int(origin_us)).cast("long"),
        F.lit(int(width)).cast("long"),
    )


def _grain_floor_sql(us: str, width: int, origin_us: int) -> str:
    """SQL-string form of :func:`_grain_floor` (round 17, see _over)."""
    return (
        f"({us} - pmod({us} - CAST({int(origin_us)} AS BIGINT), "
        f"CAST({int(width)} AS BIGINT)))"
    )


def _validate_window_fns(window_fns: dict, bucket_alias: str) -> None:
    """Guarded window-function support, matching the reference's
    validation behind ``timescaledb.enable_cagg_window_functions``
    (``tsl/src/continuous_aggs/common.c:672``): a partition that spans
    buckets gives wrong results after a partial refresh, because each
    refresh recomputes windows only over its dirty bucket ranges.
    Spark window frames never cross partition boundaries, so requiring
    every OVER clause to PARTITION BY the bucket column is exactly the
    bucket-locality guarantee — ORDER BY and ROWS/RANGE frames are then
    free within the bucket."""
    import re

    def _blank_literals(expr: str) -> str:
        """Replace single-quoted SQL literals ('' escape included) with
        spaces of equal length, so neither the OVER finder nor the paren
        scan trips on quoted parens/keywords; offsets are preserved."""
        out, i, n = list(expr), 0, len(expr)
        while i < n:
            if expr[i] == "'":
                j = i + 1
                while j < n:
                    if expr[j] == "'":
                        if j + 1 < n and expr[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
                for k in range(i, min(j + 1, n)):
                    out[k] = " "
                i = j + 1
            else:
                i += 1
        return "".join(out)

    def _over_bodies(expr: str) -> list[str]:
        """Balanced-paren extraction of every OVER (...) body — a plain
        regex can neither span nested parens (ORDER BY coalesce(n, 0))
        nor avoid false-matching identifiers ending in 'over'; quoted
        literals are blanked first so "instr(s, '(')" can't unbalance
        the scan."""
        blanked = _blank_literals(expr)
        out = []
        for m in re.finditer(r"\bover\s*\(", blanked, re.I):
            depth, i = 1, m.end()
            while i < len(blanked) and depth:
                if blanked[i] == "(":
                    depth += 1
                elif blanked[i] == ")":
                    depth -= 1
                i += 1
            if depth == 0:
                # body taken from the BLANKED text: the check below only
                # reads bare identifiers, never literal contents
                out.append(blanked[m.end() : i - 1])
        return out

    for col, expr in window_fns.items():
        overs = _over_bodies(expr)
        if not overs:
            raise ValueError(
                f"window_fns[{col!r}] has no OVER clause: {expr!r}"
            )
        for ov in overs:
            pm = re.search(
                r"partition\s+by\s+(.+?)(?:\border\s+by\b|\brows\b|"
                r"\brange\b|\bgroups\b|$)",
                ov,
                re.I | re.S,
            )
            cols = (
                [
                    c.strip().strip('"').lower()
                    for c in pm.group(1).split(",")
                    if c.strip()
                ]
                if pm
                else []
            )
            if bucket_alias.lower() not in cols:
                raise ValueError(
                    f"window_fns[{col!r}]: the OVER clause must PARTITION "
                    f"BY the bucket column {bucket_alias!r} — a window "
                    f"spanning buckets is recomputed per dirty range on "
                    f"refresh and would give wrong results "
                    f"(tsl/src/continuous_aggs/common.c:672, GUC "
                    f"enable_cagg_window_functions)"
                )


def _pbucket(v: int, w: int, origin: int) -> int:
    # clamp to avoid int64 wraparound at the infinite sentinels
    if v <= INT64_MIN + w:
        return INT64_MIN
    if v >= INT64_MAX - w:
        return v
    return v - ((v - origin) % w + w) % w


def _q(name: str) -> str:
    """Backtick-quote a column name for SQL-string expressions."""
    return f"`{name}`"


def _over(partition: Sequence[str], order: Sequence[str]) -> str:
    """``PARTITION BY … ORDER BY …`` clause text for the SQL-string
    expression builders (round 17: the state/serve expressions are
    built as SQL strings — one py4j parse each — instead of thousands
    of Column round trips per cagg serve; the parsed trees are
    unchanged)."""
    p = (
        "PARTITION BY " + ", ".join(_q(c) for c in partition) + " "
        if partition
        else ""
    )
    return p + "ORDER BY " + ", ".join(order)


class ContinuousAggregate:
    def __init__(self, ts, row: dict):
        self.ts = ts
        self.row = row

    # ------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        ts,
        name: str,
        hypertable: Union[str, Hypertable],
        bucket_width: str,
        aggs: dict[str, str],
        group_by: Sequence[str] = (),
        time_column: Optional[str] = None,
        bucket_alias: str = "bucket",
        materialized_only: bool = False,
        where: Optional[str] = None,
        join: Optional[dict] = None,
        window_fns: Optional[dict[str, str]] = None,
        enable_window_functions: bool = False,
        sketches: Optional[dict[str, dict]] = None,
        counters: Optional[dict[str, dict]] = None,
        gauges: Optional[dict[str, dict]] = None,
        stats_aggs: Optional[dict[str, dict]] = None,
        time_weights: Optional[dict[str, dict]] = None,
        candlesticks: Optional[dict[str, dict]] = None,
        state_aggs: Optional[dict[str, dict]] = None,
        freq_aggs: Optional[dict[str, dict]] = None,
        maxn_aggs: Optional[dict[str, dict]] = None,
        heartbeat_aggs: Optional[dict[str, dict]] = None,
        tdigest_aggs: Optional[dict[str, dict]] = None,
        mat_chunk_interval: Union[str, int, None] = None,
    ) -> "ContinuousAggregate":
        """``CREATE MATERIALIZED VIEW .. WITH (timescaledb.continuous)``
        (``tsl/src/continuous_aggs/create.c:600``).

        ``aggs``: output column -> Spark SQL aggregate expression over the
        source hypertable's columns (the "partial view" query).
        ``where``: optional row filter in the defining query (the
        reference allows WHERE clauses in cagg definitions,
        ``cagg_validate_query``).
        ``join``: enrich the hypertable with a plain table registered via
        ``TSSession.create_table`` before bucketing —
        ``{"table": name, "on": col | [cols] | "a = b" expr,
        "how": "inner" | "left"}``. Only INNER and LEFT joins, like the
        reference (``tsl/src/continuous_aggs/common.c:886-892``); the time
        dimension always comes from the hypertable side (``common.c:1808``).
        The dim side is broadcast at refresh, so a join adds zero shuffles.
        Like the reference, changes to the joined table do NOT invalidate
        the cagg — dirty ranges track hypertable DML only.
        ``window_fns``: output column -> window expression evaluated over
        the *aggregated* rows (e.g. ``"rank() OVER (PARTITION BY bucket
        ORDER BY sum_v DESC)"``). Gated off by default like the
        reference's ``timescaledb.enable_cagg_window_functions``
        (``src/guc.c:1031``; validation ``common.c:665-695``): partitions
        that span buckets give unexpected results after partial refresh,
        because each refresh recomputes windows only over its dirty
        ranges. Keep every OVER clause partitioned by the bucket column.
        ``sketches``: output column -> ``{"value": <expr>, "alpha": a}``:
        the mat table stores a mergeable DDSketch STATE
        (``map<int,bigint>`` of log-bucket -> count) per (bucket, group)
        instead of a finished number — the toolkit
        ``percentile_agg``/``uddsketch``-inside-a-cagg idiom
        (timescaledb-toolkit rollup; partial-vs-finalized discussion in
        ``tsl/src/continuous_aggs/finalize.c``). Because bucket counts
        ADD losslessly (Masson VLDB'19 §2.3), :meth:`quantiles` can then
        serve p50/p95/p99 at ANY coarser grain — day/month/whole-table —
        by merging the stored hourly states, never rescanning raw data;
        the realtime view unions mat-side states below the watermark
        with raw-side states computed above it. Spark's binary HLL
        states need no special support: put ``hll_sketch_agg(col)`` in
        ``aggs`` and merge with ``hll_union_agg`` at read (see
        ``tests/test_cagg_sketch.py``).
        ``counters``: output column -> ``{"value": <expr>,
        "tiebreak": [cols…]}``: the mat table stores a mergeable
        COUNTER partial per (bucket, group) — ``struct(n, first_us,
        last_us, first_val, last_val, delta, num_resets)`` with
        prometheus reset semantics (the toolkit
        ``rollup(counter_agg(...))`` idiom). Because cagg buckets
        partition time disjointly, merging two adjacent partials needs
        only the one boundary step (reset-adjusted ``B.first_val −
        A.last_val``), so :meth:`counter_at_grain` serves exact
        delta/rate/resets at ANY coarser grain from the stored
        partials — identical to ``counter_agg`` over the raw rows of
        that grain, with zero raw rescans below the watermark.
        ``tiebreak`` columns break equal-timestamp ordering like
        ``counter_agg``'s.
        ``gauges``: like ``counters`` but for metrics that may
        legitimately decrease (toolkit ``gauge_agg``): the partial also
        records the last step and its elapsed time, so
        :meth:`gauge_at_grain` serves delta/rate AND idelta/irate at
        any grain, boundary steps included.
        ``stats_aggs``: output column -> ``{"value": <expr>}``: a
        moments partial ``struct(n, s, s2, mn, mx)`` (toolkit 1-D
        ``stats_agg``); :meth:`stats_at_grain` merges by fieldwise
        add/min/max and serves n/sum/avg/stddev/variance/min/max at
        any grain. With a ``"y"`` key — ``{"value": <x expr>, "y":
        <y expr>}`` — the TWO-variable form (toolkit
        ``stats_agg(y, x)``, PG ``regr_*``) stores comoments
        ``struct(n, sx, sy, sxx, syy, sxy)`` over the pairs where both
        are non-NULL, and :meth:`stats2d_at_grain` serves slope/
        intercept/corr/covariance at any grain.
        ``time_weights``: output column -> ``{"value": <expr>,
        "method": "locf" | "linear", "tiebreak": [cols…]}``: a
        mergeable TIME-WEIGHT partial per (bucket, group) —
        ``struct(n, first_us, first_val, last_us, last_val,
        integral)`` where ``integral`` is the within-bucket integral
        of the LOCF (or linear) interpolant in µs·value (the toolkit
        ``time_weight('LOCF', ts, value)`` decomposition). Merging
        two adjacent partials adds exactly one boundary segment
        (``A.last → B.first``), so :meth:`time_weighted_at_grain`
        serves the exact time-weighted average of ANY coarser grain
        from the stored partials — identical to ``time_weight →
        average`` over the raw rows of that grain, zero raw rescans
        below the watermark (the toolkit
        ``average(rollup(time_weight(...)))`` idiom).
        ``state_aggs``: output column -> ``{"state": <expr>,
        "tiebreak": [cols…]}``: a mergeable STATE-AGG partial per
        (bucket, group) — ``struct(n, first_us, last_us, first_state,
        last_state, durations: map<state, struct(d, n)>)`` with the
        toolkit ``state_agg(ts, state)`` LOCF semantics (a state holds
        until the next sample; the final sample holds zero time; NULL
        states are skipped — strict). Merging adjacent partials adds
        the boundary gap to the EARLIER partial's last state, so
        :meth:`state_durations_at_grain` serves exact per-state
        durations at any coarser grain — the toolkit
        ``duration_in(state, rollup(state_agg(...)))`` idiom.
        ``freq_aggs``: output column -> ``{"value": <expr>,
        "capacity": k}``: a Misra–Gries/SpaceSaving frequency partial
        per (bucket, group) — ``struct(n, counts: map<string,long>)``
        of at most ``capacity`` heavy hitters (toolkit
        ``freq_agg``/``topn_agg``). Lower bounds sum across merged
        states (Agarwal et al., PODS'12), so :meth:`topn_at_grain`
        serves "top values per hour, at any grain" — exactly whenever
        each bucket's distinct count fits the capacity.
        ``maxn_aggs``: output column -> ``{"value": <expr>, "n": k,
        "desc": True|False}``: the ``n`` largest (smallest) values per
        (bucket, group) — ``struct(n, vals: array<double>)`` (toolkit
        ``max_n``/``min_n``). Top-n candidate lists merge losslessly,
        so :meth:`max_n_at_grain` is exact at every grain.
        ``heartbeat_aggs``: output column -> ``{"liveness": <interval>,
        "tiebreak": [cols…]}``: a liveness partial per (bucket, group)
        — ``struct(n, first_us, last_us, live_us, ranges)`` where
        ``live_us`` is the union length of the per-heartbeat
        ``[t, t+liveness)`` intervals (toolkit ``heartbeat_agg``).
        Adjacent partials merge with one boundary correction each, so
        :meth:`heartbeat_at_grain` serves exact
        live_time/dead_time/num_live_ranges at any grain — the ops
        analog of the counter family.
        ``tdigest_aggs``: output column -> ``{"value": <expr>,
        "delta": d}``: a mergeable T-DIGEST percentile state per
        (bucket, group) — ``struct(n, min, max, means, weights)`` with
        ≤ ``delta`` k1-binned centroids (toolkit ``tdigest``, the
        rank-error sibling of ``sketches``' DDSketch; Dunning & Ertl
        arXiv:1902.04023). :meth:`tdigest_quantiles_at_grain` serves
        ``approx_percentile`` at any coarser grain with free
        regrouping; lossless (exact percentile_cont) while a served
        group holds ≤ delta values.
        ``candlesticks``: output column -> ``{"price": <expr>,
        "volume": <expr> | None, "tiebreak": [cols…]}``: a mergeable
        OHLC partial per (bucket, group) — ``struct(n, first_us,
        last_us, open, high, low, close, volume, pv)`` (toolkit
        ``candlestick_agg``; ``pv`` = Σ price×volume for vwap).
        open/close merge by the earliest/latest parent bucket
        (buckets partition time disjointly), high/low/volume/pv merge
        by max/min/sum, so :meth:`candlestick_at_grain` serves exact
        OHLC/volume/vwap at any grain — the toolkit
        ``rollup(candlestick_agg(...))`` idiom.
        """
        if isinstance(hypertable, str):
            hypertable = Hypertable.get(ts, hypertable)
        cat = ts.catalog
        if cat.continuous_agg.find_one(name=name):
            raise ValueError(f"cagg {name!r} already exists")
        if join is not None:
            how = join.get("how", "inner")
            if how not in ("inner", "left"):
                raise ValueError(
                    "only INNER or LEFT joins are supported in continuous "
                    "aggregates (tsl/src/continuous_aggs/common.c:892)"
                )
            if not cat.plain_table.find_one(name=join["table"]):
                raise KeyError(
                    f"join table {join['table']!r} not registered "
                    "(TSSession.create_table)"
                )
        if window_fns and not enable_window_functions:
            raise ValueError(
                "window functions in continuous aggregates are experimental; "
                "pass enable_window_functions=True "
                "(timescaledb.enable_cagg_window_functions, src/guc.c:1031)"
            )
        if window_fns:
            _validate_window_fns(window_fns, bucket_alias)
        if isinstance(bucket_width, int):
            # integer time dimension: width in raw internal units
            from .functions.time import Interval

            iv = Interval(us=bucket_width)
        else:
            iv = parse_interval(bucket_width)

        def _check_nesting(col: str, prow: dict) -> None:
            """Hierarchical caggs must NEST: the child bucket width an
            integer multiple of the parent's, else each parent partial
            is silently misattributed to the child bucket containing
            the parent's bucket START (a 90-minute child over an hourly
            parent splits nothing — it just mislabels). The reference
            rejects this at create time ('should be multiple of the
            parent', tsl/src/continuous_aggs/common.c:1380-1409), as
            does it reject fixed-width children over variable
            (month-width) parents (common.c:1341-1354). Month child
            over fixed parent additionally requires the parent width to
            divide one day — month boundaries are midnights, and the
            shared midnight-anchored origin then makes every month edge
            a parent edge (stricter than the reference's estimated-
            width check, which is what our exactness claim needs)."""
            p_us = int(prow.get("bucket_width_us") or 0)
            p_months = int(prow.get("bucket_width_months") or 0)
            pname = prow.get("name", "?")
            if iv.months:
                if p_months:
                    if iv.months % p_months or iv.months < p_months:
                        raise ValueError(
                            f"rollup_of={col!r}: child bucket width "
                            f"({iv.months} months) must be an integer "
                            f"multiple of parent cagg {pname!r}'s "
                            f"({p_months} months)"
                        )
                elif p_us <= 0 or (86_400_000_000 % p_us):
                    raise ValueError(
                        f"rollup_of={col!r}: a month-width child over "
                        f"fixed-width parent cagg {pname!r} needs the "
                        f"parent width to divide 1 day so month "
                        f"boundaries land on parent bucket edges"
                    )
            elif p_months:
                raise ValueError(
                    f"rollup_of={col!r}: cannot create a fixed-width "
                    f"child over month-width parent cagg {pname!r} "
                    f"(tsl/src/continuous_aggs/common.c:1341)"
                )
            elif p_us <= 0 or iv.us % p_us or iv.us < p_us:
                raise ValueError(
                    f"rollup_of={col!r}: child bucket width ({iv.us} "
                    f"us) must be an integer multiple (>= 1x) of "
                    f"parent cagg {pname!r}'s ({p_us} us) — "
                    f"non-nesting hierarchical caggs misattribute "
                    f"parent partials "
                    f"(tsl/src/continuous_aggs/common.c:1384)"
                )

        if sketches:
            from .functions.ddsketch import _gamma

            taken = set(aggs) | set(group_by) | {bucket_alias}
            norm: dict[str, dict] = {}
            for col, spec in sketches.items():
                if col in taken:
                    raise ValueError(
                        f"sketch column {col!r} collides with an agg/"
                        f"group/bucket column"
                    )
                spec = dict(spec)
                if "rollup_of" in spec:
                    # hierarchical sketch cagg (cagg_on_cagg.sql over
                    # toolkit rollup): the child's state is a lossless
                    # merge of the PARENT's stored states — inherit the
                    # parent sketch's alpha so quantile extraction uses
                    # the same gamma
                    prow = ts.catalog.continuous_agg.find_one(
                        mat_table=hypertable.name
                    )
                    if prow is not None:
                        _check_nesting(col, prow)
                    if "alpha" not in spec:
                        psk = ((prow or {}).get("sketches") or {}).get(
                            spec["rollup_of"]
                        )
                        if psk is not None:
                            spec["alpha"] = psk.get("alpha", 0.01)
                elif "value" not in spec:
                    raise ValueError(
                        f"sketches[{col!r}] needs a 'value' expression "
                        f"(or 'rollup_of' for a hierarchical rollup)"
                    )
                _gamma(float(spec.get("alpha", 0.01)))  # validates range
                norm[col] = spec
            sketches = norm
        taken = set(aggs) | set(group_by) | {bucket_alias} | set(
            sketches or {}
        )
        def _check_rollup(kind_key: str, col: str, spec: dict) -> dict:
            # hierarchical child over a parent's stored partials
            # (cagg_on_cagg.sql × the toolkit rollup idiom): the child
            # bucket's state is the ordered/commutative merge of the
            # parent's states — inherits the parent spec's method so
            # serving uses the same interpolation
            prow = cat.continuous_agg.find_one(mat_table=hypertable.name)
            pspec = ((prow or {}).get(kind_key) or {}).get(
                spec["rollup_of"]
            )
            if pspec is None:
                raise ValueError(
                    f"rollup_of={spec['rollup_of']!r}: the source "
                    f"hypertable is not a cagg mat table with a "
                    f"{kind_key} column of that name"
                )
            _check_nesting(col, prow)
            out = dict(spec)
            if kind_key == "time_weights" and "method" not in out:
                out["method"] = pspec.get("method", "locf")
            if kind_key == "stats_aggs":
                # 2-D-ness is a property of the stored STATE SHAPE —
                # the child merges whatever the parent stores, so it
                # inherits the parent's dimensionality; a child spec
                # declaring "y" over a 1-D parent would dispatch the
                # comoment merge against (n, s, s2, mn, mx) and die at
                # refresh with an opaque FIELD_NOT_FOUND
                if "y" in pspec:
                    out["y"] = pspec["y"]
                elif "y" in out:
                    raise ValueError(
                        f"rollup_of={col!r}: parent stats column "
                        f"{spec['rollup_of']!r} is 1-D — a 2-D child "
                        f"cannot be built from 1-D moments (recreate "
                        f"the parent with stats_aggs={{..., 'y': ...}})"
                    )
            if kind_key == "freq_aggs":
                if "capacity" not in out:
                    out["capacity"] = pspec.get("capacity", 256)
                # a topn_agg parent records its declared n so the SQL
                # route's bare topn(rollup(col)) serves it — a
                # hierarchical child must inherit it too, or the child
                # route silently falls back to the default 10
                if "n" in pspec:
                    out.setdefault("n", pspec["n"])
            if kind_key == "heartbeat_aggs":
                # stored live times depend on the liveness interval —
                # a child cannot reinterpret the parent's states.
                # Compare normalized MICROSECONDS, not spec text:
                # '5 minutes' == '300 seconds' == 300000000
                p_liv = pspec.get("liveness")

                def _liv_us(v):
                    return (
                        int(v)
                        if isinstance(v, int)
                        else parse_interval(v).us
                    )

                if "liveness" in out and _liv_us(out["liveness"]) != _liv_us(
                    p_liv
                ):
                    raise ValueError(
                        f"rollup_of={col!r}: child liveness must match "
                        f"the parent's ({p_liv!r})"
                    )
                out["liveness"] = p_liv
            if kind_key == "tdigest_aggs":
                # the compression is a state property: a child merging
                # parent centroids re-bins to its own delta, so it
                # inherits the parent's unless explicitly (re)set; a
                # larger child delta cannot invent resolution the
                # parent states no longer hold, so reject it loudly
                out.setdefault("delta", pspec.get("delta", 200))
                if int(out["delta"]) > int(pspec.get("delta", 200)):
                    raise ValueError(
                        f"rollup_of={col!r}: child delta "
                        f"({out['delta']}) cannot exceed the parent's "
                        f"({pspec.get('delta', 200)}) — the parent "
                        f"states only keep that many centroids"
                    )
            if kind_key == "maxn_aggs":
                # the candidate-list length and direction are state
                # properties — a child cannot keep MORE than the parent
                out.setdefault("n", pspec.get("n", 5))
                out.setdefault("desc", pspec.get("desc", True))
                if pspec.get("by") is not None:
                    # payload presence travels: the child merges the
                    # parent's (value, data) entries
                    out.setdefault("by", pspec["by"])
                if int(out["n"]) > int(pspec.get("n", 5)):
                    raise ValueError(
                        f"rollup_of={col!r}: child n ({out['n']}) cannot "
                        f"exceed the parent's ({pspec.get('n', 5)}) — "
                        f"the parent states only keep that many values"
                    )
                if bool(out["desc"]) != bool(pspec.get("desc", True)):
                    raise ValueError(
                        f"rollup_of={col!r}: child direction must match "
                        f"the parent's (desc={pspec.get('desc', True)})"
                    )
            return out

        kind_keys = {
            "counter": "counters",
            "gauge": "gauges",
            "stats": "stats_aggs",
            "time_weight": "time_weights",
            "freq": "freq_aggs",
            "maxn": "maxn_aggs",
            "tdigest": "tdigest_aggs",
        }
        norm_families: dict[str, dict] = {}
        for kind, d in (
            ("counter", counters),
            ("gauge", gauges),
            ("stats", stats_aggs),
            ("time_weight", time_weights),
            ("freq", freq_aggs),
            ("maxn", maxn_aggs),
            ("tdigest", tdigest_aggs),
        ):
            normd: dict[str, dict] = {}
            for col, spec in (d or {}).items():
                if col in taken:
                    raise ValueError(
                        f"{kind} column {col!r} collides with another "
                        f"output column"
                    )
                taken.add(col)
                if "rollup_of" in spec:
                    spec = _check_rollup(kind_keys[kind], col, spec)
                elif "value" not in spec:
                    raise ValueError(
                        f"{kind} partial {col!r} needs a 'value' "
                        f"expression (or 'rollup_of' for a hierarchical "
                        f"rollup)"
                    )
                if kind == "time_weight":
                    method = str(spec.get("method", "locf")).lower()
                    if method not in ("locf", "linear"):
                        raise ValueError(
                            f"time_weight {col!r}: method must be 'locf' "
                            f"or 'linear', got {spec.get('method')!r}"
                        )
                if kind == "freq" and int(spec.get("capacity", 256)) <= 0:
                    raise ValueError(
                        f"freq_agg {col!r}: capacity must be positive"
                    )
                if kind == "maxn" and int(spec.get("n", 5)) <= 0:
                    raise ValueError(
                        f"max_n {col!r}: n must be positive"
                    )
                if kind == "tdigest" and int(spec.get("delta", 200)) < 2:
                    raise ValueError(
                        f"tdigest {col!r}: delta (compression) must "
                        f"be >= 2"
                    )
                normd[col] = spec
            norm_families[kind_keys[kind]] = normd or None
        counters = norm_families["counters"]
        gauges = norm_families["gauges"]
        stats_aggs = norm_families["stats_aggs"]
        time_weights = norm_families["time_weights"]
        freq_aggs = norm_families["freq_aggs"]
        maxn_aggs = norm_families["maxn_aggs"]
        tdigest_aggs = norm_families["tdigest_aggs"]
        norm_c: dict[str, dict] = {}
        for col, spec in (candlesticks or {}).items():
            if col in taken:
                raise ValueError(
                    f"candlestick column {col!r} collides with another "
                    f"output column"
                )
            taken.add(col)
            if "rollup_of" in spec:
                spec = _check_rollup("candlesticks", col, spec)
            elif "price" not in spec:
                raise ValueError(
                    f"candlestick partial {col!r} needs a 'price' "
                    f"expression (or 'rollup_of')"
                )
            norm_c[col] = spec
        candlesticks = norm_c or None
        norm_hb: dict[str, dict] = {}
        for col, spec in (heartbeat_aggs or {}).items():
            if col in taken:
                raise ValueError(
                    f"heartbeat column {col!r} collides with another "
                    f"output column"
                )
            taken.add(col)
            if "rollup_of" in spec:
                spec = _check_rollup("heartbeat_aggs", col, spec)
            elif "liveness" not in spec:
                raise ValueError(
                    f"heartbeat partial {col!r} needs a 'liveness' "
                    f"interval (or 'rollup_of')"
                )
            liv = spec["liveness"]
            liv_us = (
                int(liv)
                if isinstance(liv, int)
                else parse_interval(liv).us
            )
            if liv_us <= 0 or (
                not isinstance(liv, int) and parse_interval(liv).months
            ):
                raise ValueError(
                    f"heartbeat {col!r}: liveness must be a positive "
                    f"fixed-width interval"
                )
            spec = {**spec, "liveness_us": liv_us}
            norm_hb[col] = spec
        heartbeat_aggs = norm_hb or None
        norm_sa: dict[str, dict] = {}
        for col, spec in (state_aggs or {}).items():
            if col in taken:
                raise ValueError(
                    f"state_agg column {col!r} collides with another "
                    f"output column"
                )
            taken.add(col)
            if "rollup_of" in spec:
                spec = _check_rollup("state_aggs", col, spec)
            elif "state" not in spec:
                raise ValueError(
                    f"state_agg partial {col!r} needs a 'state' "
                    f"expression (or 'rollup_of')"
                )
            norm_sa[col] = spec
        state_aggs = norm_sa or None
        tcol = time_column or hypertable.time_column
        is_uuid = hypertable.row.get("time_type") == "uuid"
        # UUIDv7 dimensions bucket by their embedded timestamp, so the
        # cagg's buckets ARE timestamps (time_bucket_uuid returns one)
        is_ts = is_uuid or (hypertable.row.get("time_type") or "timestamp") in (
            "timestamp",
            "timestamp_ntz",
            "date",
        )
        if iv.months and not is_ts:
            raise ValueError("month-width buckets need a timestamp dimension")
        row = {
            "id": cat.next_id("cagg"),
            "name": name,
            "hypertable_id": hypertable.id,
            "hypertable_name": hypertable.name,
            "time_column": tcol,
            "bucket_width_us": iv.us,
            "bucket_width_months": iv.months,  # variable-width bucket_function
            "bucket_origin_us": DEFAULT_ORIGIN_US if is_ts else 0,
            "time_is_timestamp": is_ts,
            "time_is_uuid": is_uuid,
            "bucket_alias": bucket_alias,
            "group_by": list(group_by),
            "aggs": aggs,
            "materialized_only": materialized_only,
            "where": where,
            "join": join,
            "window_fns": window_fns,
            "sketches": sketches,
            "counters": counters,
            "gauges": gauges,
            "stats_aggs": stats_aggs,
            "time_weights": time_weights,
            "candlesticks": candlesticks,
            "state_aggs": state_aggs,
            "freq_aggs": freq_aggs,
            "maxn_aggs": maxn_aggs,
            "heartbeat_aggs": heartbeat_aggs,
            "tdigest_aggs": tdigest_aggs,
            "mat_table": f"_mat_{name}",
            "created_at": _time.time(),
        }
        # materialization hypertable FIRST (create.c:267): if its name
        # collides, nothing has been written yet — appending the cagg
        # row before this left a broken half-created cagg behind on
        # failure. Bucket column is the open dimension; chunk interval
        # follows the reference: the SOURCE's interval × 10 for
        # non-hierarchical caggs (create.c:104 MATPARTCOL_INTERVAL_FACTOR,
        # create.c:626-631 — hierarchical children inherit the parent
        # mat interval unchanged), floored at 10 buckets so a coarse
        # cagg over a finely-chunked raw table still gets multi-row
        # chunks. The old 10-buckets-only default produced ~50-row mat
        # chunks at the x100 probe tier (1,460 dirs for 72k rows) whose
        # listing dominated every at-grain serve; callers can override
        # with mat_chunk_interval (the WITH (timescaledb.
        # chunk_time_interval=...) analog, create.c:619-623).
        nominal_us = iv.us if not iv.months else iv.months * 31 * 86_400_000_000
        src_interval = int(hypertable.row.get("chunk_interval") or 0)
        is_hier = (
            cat.continuous_agg.find_one(mat_table=hypertable.name)
            is not None
        )
        if mat_chunk_interval is not None:
            mat_interval = (
                int(mat_chunk_interval)
                if isinstance(mat_chunk_interval, int)
                else parse_interval(mat_chunk_interval).us
            )
            if mat_interval <= 0:
                raise ValueError("mat_chunk_interval must be positive")
        else:
            mat_interval = max(
                src_interval * (1 if is_hier else 10), nominal_us * 10
            )
        Hypertable.create(ts, row["mat_table"], bucket_alias, chunk_interval=mat_interval)
        cat.continuous_agg.append([row])
        # seed: entire range invalid (README "initial state")
        cat.materialization_invalidation_log.append(
            [
                {
                    "cagg_id": row["id"],
                    "lowest_modified_value": INT64_MIN,
                    "greatest_modified_value": INT64_MAX,
                }
            ]
        )
        cat.cagg_watermark.append([{"cagg_id": row["id"], "watermark": None}])
        return cls(ts, row)

    @classmethod
    def get(cls, ts, name: str) -> "ContinuousAggregate":
        row = ts.catalog.continuous_agg.find_one(name=name)
        if not row:
            raise KeyError(f"no cagg {name!r}")
        return cls(ts, row)

    # ----------------------------------------------------------- plumbing
    @property
    def id(self) -> int:
        return self.row["id"]

    @property
    def name(self) -> str:
        return self.row["name"]

    @property
    def width(self) -> int:
        return int(self.row["bucket_width_us"])

    @property
    def origin(self) -> int:
        return int(self.row["bucket_origin_us"])

    def _source(self) -> Hypertable:
        return Hypertable.get(self.ts, self.row["hypertable_name"])

    def _mat(self) -> Hypertable:
        return Hypertable.get(self.ts, self.row["mat_table"])

    def _bucket_expr(self, df: DataFrame):
        from .functions.time import time_bucket, time_bucket_int

        if self.row.get("time_is_uuid"):
            from .functions.time import Interval
            from .functions.uuid7 import time_bucket_uuid

            months = int(self.row.get("bucket_width_months") or 0)
            iv = Interval(months=months) if months else Interval(us=self.width)
            return time_bucket_uuid(iv, self.row["time_column"]).alias(
                self.row["bucket_alias"]
            )
        if self.row["time_is_timestamp"]:
            from .functions.time import Interval

            months = int(self.row.get("bucket_width_months") or 0)
            iv = Interval(months=months) if months else Interval(us=self.width)
            return time_bucket(iv, self.row["time_column"]).alias(
                self.row["bucket_alias"]
            )
        return time_bucket_int(self.width, self.row["time_column"]).alias(
            self.row["bucket_alias"]
        )

    # -- variable-width bucket algebra (continuous_aggs_bucket_function) ---
    def _floor_us(self, v: int) -> int:
        """Bucket start containing internal time ``v``. Fixed widths use
        the closed-form formula; month widths floor the month index
        (driver-side calendar math — the analog of the reference's
        ``ts_compute_inscribed_bucketed_refresh_window`` for variable
        buckets)."""
        months = int(self.row.get("bucket_width_months") or 0)
        if not months:
            return _pbucket(v, self.width, self.origin)
        guard = 32 * 86_400_000_000 * (months + 1)
        if v <= INT64_MIN + guard:
            return INT64_MIN
        if v >= INT64_MAX - guard:
            return v
        dt = datetime.fromtimestamp(v // 1_000_000, tz=_tz.utc)
        midx = dt.year * 12 + dt.month - 1
        origin_midx = 2000 * 12  # DEFAULT_ORIGIN_MONTHS (Jan 2000)
        b = midx - ((midx - origin_midx) % months + months) % months
        y, mo = divmod(b, 12)
        return int(datetime(y, mo + 1, 1, tzinfo=_tz.utc).timestamp() * 1_000_000)

    def _next_us(self, bucket_start: int) -> int:
        """Start of the bucket after the one starting at ``bucket_start``."""
        months = int(self.row.get("bucket_width_months") or 0)
        if not months:
            return bucket_start + self.width
        if bucket_start in (INT64_MIN, INT64_MAX):
            return bucket_start
        dt = datetime.fromtimestamp(bucket_start // 1_000_000, tz=_tz.utc)
        midx = dt.year * 12 + dt.month - 1 + months
        y, mo = divmod(midx, 12)
        return int(datetime(y, mo + 1, 1, tzinfo=_tz.utc).timestamp() * 1_000_000)

    def _aggregate(
        self, raw: DataFrame, only_cols: Optional[Sequence[str]] = None
    ) -> DataFrame:
        """The 'partial view' query:
        [join dim] + [where] + bucket + group_by + aggs + [sketch
        states] + [window_fns]. ``only_cols`` restricts the build to
        the named output columns — the single-family realtime serve
        path (:meth:`read`): untouched families' partial builds (and
        their 1:1 joins) are never planned at all."""
        j = self.row.get("join")
        if j:
            dim = self.ts.read_table(j["table"])
            on = j.get("on")
            if isinstance(on, str) and not on.replace("_", "").isalnum():
                on = F.expr(on)  # "a = b" join condition
            raw = raw.join(F.broadcast(dim), on=on, how=j.get("how", "inner"))
        if self.row.get("where"):
            raw = raw.filter(F.expr(self.row["where"]))
        exprs = [
            F.expr(e).alias(n)
            for n, e in self.row["aggs"].items()
            if only_cols is None or n in only_cols
        ]
        keys = [self.row["bucket_alias"], *self.row["group_by"]]
        partials = [
            (col, spec, self._sketch_state)
            for col, spec in (self.row.get("sketches") or {}).items()
        ] + [
            (col, spec, self._counter_state)
            for col, spec in (self.row.get("counters") or {}).items()
        ] + [
            (col, spec, self._gauge_state)
            for col, spec in (self.row.get("gauges") or {}).items()
        ] + [
            (col, spec, self._stats_state)
            for col, spec in (self.row.get("stats_aggs") or {}).items()
        ] + [
            (col, spec, self._timeweight_state)
            for col, spec in (self.row.get("time_weights") or {}).items()
        ] + [
            (col, spec, self._candlestick_state)
            for col, spec in (self.row.get("candlesticks") or {}).items()
        ] + [
            (col, spec, self._stateagg_state)
            for col, spec in (self.row.get("state_aggs") or {}).items()
        ] + [
            (col, spec, self._freq_state)
            for col, spec in (self.row.get("freq_aggs") or {}).items()
        ] + [
            (col, spec, self._maxn_state)
            for col, spec in (self.row.get("maxn_aggs") or {}).items()
        ] + [
            (col, spec, self._heartbeat_state)
            for col, spec in (self.row.get("heartbeat_aggs") or {}).items()
        ] + [
            (col, spec, self._tdigest_state)
            for col, spec in (self.row.get("tdigest_aggs") or {}).items()
        ]
        if only_cols is not None:
            partials = [p for p in partials if p[0] in only_cols]
        agg = None
        if exprs or not partials:
            agg = raw.groupBy(
                self._bucket_expr(raw), *self.row["group_by"]
            ).agg(*exprs)
        for col, spec, builder in partials:
            # every builder is null-aware internally: it emits a row
            # for EVERY (bucket, group) of the raw rows, with a NULL
            # state when the partial's inputs are all NULL (strict PG
            # aggregate semantics) — so this join chain is always 1:1
            # and inner, the r10-proven plan shape
            sk = builder(raw, col, spec)
            if agg is None:
                agg = sk
                continue
            # null-safe equi-join: group keys can hold NULLs, and both
            # sides aggregate the same rows over the same keys, so the
            # join is 1:1; AQE sees two pre-aggregated (small) sides.
            # Dataset aliases (SubqueryAlias) disambiguate the shared
            # raw lineage — agg[k]/sk[k] can resolve to the SAME
            # attribute past two partials, making drop(sk[k]) a no-op
            # (duplicate key columns), while a rename Project on top of
            # the partial's struct aggregate trips Spark 4.1.2's
            # RemoveRedundantAliases (d42cb25)
            l, r = agg.alias("_pl"), sk.alias("_pr")
            cond = None
            for k in keys:
                c = F.col(f"_pl.{k}").eqNullSafe(F.col(f"_pr.{k}"))
                cond = c if cond is None else cond & c
            agg = l.join(r, cond).select("_pl.*", F.col(f"_pr.{col}"))
        if only_cols is None:
            for col, expr in (self.row.get("window_fns") or {}).items():
                agg = agg.withColumn(col, F.expr(expr))
        return agg

    def _sketch_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """DDSketch STATE per (bucket, group): ``map<int,bigint>`` of
        log-bucket -> count. Two map-combined groupBys: the first
        collapses rows to (keys, log-bucket) counts BEFORE the exchange
        (shuffle = keys x ~2k sketch buckets regardless of row count,
        functions/ddsketch.py contract), the second packs each group's
        buckets into one deterministic sorted map entry. No raw row
        survives past the first partial aggregation."""
        from .functions.ddsketch import ZERO_BUCKET, _gamma

        src = spec.get("rollup_of")
        if src:
            # hierarchical rollup: merge the parent's stored states —
            # explode (keys, map) -> (keys, log-bucket, cnt), sum. Bucket
            # counts ADD losslessly (Masson VLDB'19 §2.3), so the child
            # state is bit-identical to one built from the raw rows.
            # explode_outer: a NULL parent state (strict-NULL group)
            # yields a NULL _sb row, so the group row survives into the
            # child with a NULL state instead of vanishing
            per_bucket = (
                raw.select(
                    self._bucket_expr(raw),
                    *self.row["group_by"],
                    F.explode_outer(F.col(src)).alias("_sb", "_c"),
                )
                .groupBy(
                    self.row["bucket_alias"], *self.row["group_by"], "_sb"
                )
                .agg(F.sum("_c").alias("_cnt"))
            )
            ent = F.when(
                F.col("_sb").isNotNull(), F.struct("_sb", "_cnt")
            )
            return per_bucket.groupBy(
                self.row["bucket_alias"], *self.row["group_by"]
            ).agg(
                F.when(
                    F.count("_sb") > 0,
                    F.map_from_entries(
                        F.array_sort(F.collect_list(ent))
                    ),
                ).alias(col)
            )
        g = _gamma(float(spec.get("alpha", 0.01)))
        v = F.expr(spec["value"]).cast("double")
        # strict-aggregate NULL semantics (percentile_agg skips NULLs):
        # NULL values get a NULL log-bucket, which is dropped before the
        # map pack (a NULL key would crash map_from_entries) — but the
        # (bucket, group) row itself survives, with a NULL state when
        # ALL its inputs are NULL
        sb = (
            F.when(v.isNull(), F.lit(None).cast("int"))
            .when(
                v < 0,
                F.raise_error(
                    F.lit(
                        f"cagg sketch {col!r}: negative values are not "
                        f"supported (DDSketch positive store + zero "
                        f"bucket, like uddsketch)"
                    )
                ).cast("int"),
            )
            .when(v == 0, F.lit(ZERO_BUCKET))
            .otherwise(
                F.ceil(F.log(v) / F.lit(math.log(g))).cast("int")
            )
        )
        per_bucket = (
            raw.select(
                self._bucket_expr(raw),
                *self.row["group_by"],
                sb.alias("_sb"),
            )
            .groupBy(self.row["bucket_alias"], *self.row["group_by"], "_sb")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        # collect_list skips NULL elements, so the NULL-bucket row
        # (NULL-input samples) never reaches the map; nullif turns an
        # all-NULL group's empty map into a NULL state
        ent = F.when(
            F.col("_sb").isNotNull(), F.struct("_sb", "_cnt")
        )
        return per_bucket.groupBy(
            self.row["bucket_alias"], *self.row["group_by"]
        ).agg(
            F.when(
                F.count("_sb") > 0,
                F.map_from_entries(F.array_sort(F.collect_list(ent))),
            ).alias(col)
        )

    def _counter_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """Mergeable COUNTER partial per (bucket, group):
        ``struct(n, first_us, last_us, first_val, last_val, delta,
        num_resets)`` with prometheus reset semantics inside the bucket
        (functions/counters.py:counter_agg decomposition). One window
        over (bucket, group) ordered by (time, tiebreak…) computes the
        within-bucket reset-adjusted increments; the grouped pack is a
        single exchange. Boundary steps between buckets are NOT counted
        here — merging adjacent partials adds exactly one boundary step
        (``counter_at_grain``), which is what makes any-grain serving
        equal to ``counter_agg`` over the raw rows of that grain."""
        if spec.get("rollup_of"):
            return self._merge_counter_states(raw, col, spec["rollup_of"])
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        tb = list(spec.get("tiebreak") or ())
        us = self._raw_time_us(raw)
        stepped = raw.select(
            self._bucket_expr(raw),
            *gb,
            *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
            us.alias("_us"),
            F.expr(spec["value"]).cast("double").alias("_v"),
        )
        # SQL-string expression build from here down (round 17, see
        # _over): one py4j parse per expression instead of ~2,000 round
        # trips; the parsed trees are identical to the Column form.
        bq, gbq = _q(balias), [_q(g) for g in gb]
        tbs = [f"_tb{i}" for i in range(len(tb))]
        wo = _over(
            [balias, *gb], ["_us ASC", *[f"{t} ASC" for t in tbs]]
        )
        # strict-aggregate NULL semantics (counter_agg skips NULLs): the
        # previous sample is the last NON-NULL value before this row —
        # lag() would let one NULL sample break two increments — and
        # NULL samples themselves contribute no increment/reset/count
        prev = (
            f"last(_v, true) OVER ({wo} ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND 1 PRECEDING)"
        )
        step = f"(_v - {prev})"
        inc = (
            f"CASE WHEN _v IS NULL THEN CAST(NULL AS DOUBLE) "
            f"WHEN {prev} IS NULL THEN 0.0D "
            f"WHEN {step} < 0 THEN _v ELSE {step} END"
        )
        # bookend key is NULL for NULL samples so min_by/max_by skip them
        key = (
            "CASE WHEN _v IS NOT NULL THEN named_struct('_us', _us"
            + "".join(f", '{t}', {t}" for t in tbs)
            + ") END"
        )
        stepped = stepped.selectExpr(
            bq,
            *gbq,
            "_us",
            "_v",
            f"{inc} AS _inc",
            f"CASE WHEN _v IS NOT NULL THEN CAST(({step} < 0) AS INT) "
            f"END AS _reset",
            f"CASE WHEN _v IS NOT NULL AND {prev} IS NOT NULL THEN "
            f"CAST((_v != {prev}) AS INT) END AS _change",
            f"{key} AS _k",
        )
        # aggregate FLAT fields, then assemble the struct in a plain
        # projection: an aliased-field struct inside the aggregate trips
        # Spark 4.1.2's RemoveRedundantAliases into an unresolved plan
        # under a dual-partial join + projection (round-10 regression,
        # d42cb25)
        flat = stepped.groupBy(balias, *gb).agg(
            F.expr("count(_v)").alias("_f_n"),
            F.expr(
                "min(CASE WHEN _v IS NOT NULL THEN _us END)"
            ).alias("_f_first_us"),
            F.expr(
                "max(CASE WHEN _v IS NOT NULL THEN _us END)"
            ).alias("_f_last_us"),
            F.expr("min_by(_v, _k)").alias("_f_first_val"),
            F.expr("max_by(_v, _k)").alias("_f_last_val"),
            F.expr("sum(_inc)").alias("_f_delta"),
            F.expr("coalesce(sum(_reset), 0)").alias("_f_resets"),
            F.expr("coalesce(sum(_change), 0)").alias("_f_changes"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct("
            "'n', _f_n, 'first_us', _f_first_us, 'last_us', _f_last_us, "
            "'first_val', _f_first_val, 'last_val', _f_last_val, "
            "'delta', _f_delta, 'num_resets', _f_resets, "
            f"'num_changes', _f_changes) END AS {_q(col)}",
        )

    def _raw_time_us(self, raw: DataFrame):
        """int64 internal units of the cagg's time column on ``raw``."""
        tcol = self.row["time_column"]
        if self.row.get("time_is_uuid"):
            from .functions.uuid7 import uuid_timestamp_micros

            return uuid_timestamp_micros(F.col(tcol))
        if self.row["time_is_timestamp"]:
            dt = dict(raw.dtypes).get(tcol, "timestamp")
            if dt == "date":
                return (
                    F.datediff(
                        F.col(tcol), F.lit("1970-01-01").cast("date")
                    ).cast("long")
                    * F.lit(86_400_000_000)
                )
            return F.unix_micros(F.col(tcol).cast("timestamp"))
        return F.col(tcol).cast("long")

    def counter_at_grain(
        self,
        counter_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve reset-adjusted counter results at any coarser grain
        from the stored partials — the toolkit
        ``delta(rollup(counter_agg(...)))`` idiom. Merging consecutive
        bucket partials within each target bucket adds each boundary
        step once (reset-adjusted), so the result equals
        ``counter_agg`` over the raw rows of the target grain exactly;
        no raw rescan below the watermark. ``start``/``end`` filter
        whole parent buckets (bucket-aligned ``[start, end)``).

        Output: ``(bucket?, group…, n, delta, rate, num_resets,
        first_us, last_us)``; ``grain=None`` keeps the cagg's own grain,
        ``"all"`` collapses to one row per group."""
        from .functions.time import time_bucket

        counters = self.row.get("counters") or {}
        if not counters:
            raise ValueError(
                f"cagg {self.name!r} has no counter columns (pass "
                f"counters= to create_cagg)"
            )
        if counter_col is None:
            if len(counters) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several counters "
                    f"{sorted(counters)}; pass counter_col"
                )
            counter_col = next(iter(counters))
        if counter_col not in counters:
            raise KeyError(f"no counter column {counter_col!r}")
        self._require_full_group_by(group_by, "counter")
        bucket = self.row["bucket_alias"]
        gb = list(self.row["group_by"] if group_by is None else group_by)

        df = self.read(realtime=realtime, only_cols=[counter_col])
        if start is not None or end is not None:
            bc = F.col(bucket)
            if self.row["time_is_timestamp"]:
                conv = lambda x: F.lit(x).cast("timestamp")  # noqa: E731
            else:
                conv = lambda x: F.lit(int(x))  # noqa: E731
            if start is not None:
                df = df.filter(bc >= conv(start))
            if end is not None:
                df = df.filter(bc < conv(end))
        src_bucket = F.col(bucket)
        grain_all = grain == "all"
        tcols = [] if grain_all else ["_tgt"]
        if grain == "all":
            tgt = None
            keys: list = list(gb)
        elif grain is not None:
            if not self.row["time_is_timestamp"]:
                from .functions.time import time_bucket_int

                tgt = time_bucket_int(int(grain), bucket)
            else:
                tgt = time_bucket(grain, bucket)
            keys = [bucket, *gb]
        else:
            tgt = src_bucket
            keys = [bucket, *gb]
        # strict rollup: skip NULL states (all-NULL-input groups); the
        # filter sits after the rename select, not on the mat read —
        # see _partial_frame_for_col
        d = df.select(
            *([] if tgt is None else [tgt.alias("_tgt")]),
            src_bucket.alias("_src"),
            *gb,
            F.col(counter_col).alias("_st"),
        ).filter(F.col("_st").isNotNull())
        # one boundary step per adjacent pair of parent buckets inside a
        # target bucket: reset-adjusted first-vs-previous-last.
        # SQL-string expression build (round 17, see _over).
        gbq = [_q(g) for g in gb]
        wo = _over([*tcols, *gb], ["_src ASC"])
        prev_last = f"lag(_st.last_val) OVER ({wo})"
        bstep = f"(_st.first_val - {prev_last})"
        binc = (
            f"CASE WHEN {prev_last} IS NULL THEN 0.0D "
            f"WHEN {bstep} < 0 THEN _st.first_val ELSE {bstep} END"
        )
        d = d.selectExpr(
            *tcols,
            *gbq,
            "_src",
            "_st",
            f"{binc} AS _binc",
            f"CAST(({bstep} < 0) AS INT) AS _breset",
            f"CASE WHEN {prev_last} IS NOT NULL THEN "
            f"CAST((_st.first_val != {prev_last}) AS INT) END AS _bchange",
        )
        span_s = (
            "(CAST((max(_st.last_us) - min(_st.first_us)) AS DOUBLE) "
            "/ 1000000.0D)"
        )
        out = d.groupBy(*tcols, *gb).agg(
            F.expr("sum(_st.n)").alias("n"),
            F.expr("sum(_st.delta) + sum(_binc)").alias("delta"),
            F.expr(
                f"CASE WHEN {span_s} > 0 THEN "
                f"(sum(_st.delta) + sum(_binc)) / {span_s} END"
            ).alias("rate"),
            F.expr(
                "sum(_st.num_resets) + coalesce(sum(_breset), 0)"
            ).alias("num_resets"),
            (
                F.expr(
                    "sum(_st.num_changes) + coalesce(sum(_bchange), 0)"
                )
                if _struct_has_field(d, "_st", "num_changes")
                else F.lit(None).cast("long")
            ).alias("num_changes"),
            F.expr("min(_st.first_us)").alias("first_us"),
            F.expr("max(_st.last_us)").alias("last_us"),
            # toolkit first_val/last_val accessors: bookends from the
            # earliest/latest parent partial (_src is unique per parent
            # within a series)
            F.expr("min_by(_st.first_val, _src)").alias("first_val"),
            F.expr("max_by(_st.last_val, _src)").alias("last_val"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def _gauge_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """Mergeable GAUGE partial per (bucket, group): like the counter
        partial but without resets, plus ``last_step``/``last_prev_us``
        (the final within-bucket step and the time of the sample before
        the last) so idelta/irate survive the rollup — a single-sample
        bucket's step comes from the previous bucket's last value at
        merge time."""
        if spec.get("rollup_of"):
            return self._merge_gauge_states(raw, col, spec["rollup_of"])
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        tb = list(spec.get("tiebreak") or ())
        us = self._raw_time_us(raw)
        stepped = raw.select(
            self._bucket_expr(raw),
            *gb,
            *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
            us.alias("_us"),
            F.expr(spec["value"]).cast("double").alias("_v"),
        )
        # SQL-string expression build (round 17, see _over)
        bq, gbq = _q(balias), [_q(g) for g in gb]
        tbs = [f"_tb{i}" for i in range(len(tb))]
        wo = _over(
            [balias, *gb], ["_us ASC", *[f"{t} ASC" for t in tbs]]
        )
        frame = f"{wo} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        # strict NULL semantics (gauge_agg skips NULLs): the previous
        # sample is the last NON-NULL one, its time the matching masked
        # time — same reasoning as _counter_state
        prev_v = f"last(_v, true) OVER ({frame})"
        prev_us = (
            f"last(CASE WHEN _v IS NOT NULL THEN _us END, true) "
            f"OVER ({frame})"
        )
        key = (
            "CASE WHEN _v IS NOT NULL THEN named_struct('_us', _us"
            + "".join(f", '{t}', {t}" for t in tbs)
            + ") END"
        )
        stepped = stepped.selectExpr(
            bq,
            *gbq,
            "_us",
            "_v",
            f"(_v - {prev_v}) AS _step",
            f"{prev_us} AS _prev_us",
            f"CASE WHEN _v IS NOT NULL AND {prev_v} IS NOT NULL THEN "
            f"CAST((_v != {prev_v}) AS INT) END AS _change",
            f"{key} AS _k",
        )
        # flat aggregate + struct-in-projection (see _counter_state)
        flat = stepped.groupBy(balias, *gb).agg(
            F.expr("count(_v)").alias("_f_n"),
            F.expr(
                "min(CASE WHEN _v IS NOT NULL THEN _us END)"
            ).alias("_f_first_us"),
            F.expr(
                "max(CASE WHEN _v IS NOT NULL THEN _us END)"
            ).alias("_f_last_us"),
            F.expr("min_by(_v, _k)").alias("_f_first_val"),
            F.expr("max_by(_v, _k)").alias("_f_last_val"),
            F.expr("max_by(_step, _k)").alias("_f_last_step"),
            F.expr("max_by(_prev_us, _k)").alias("_f_last_prev"),
            F.expr("coalesce(sum(_change), 0)").alias("_f_changes"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct("
            "'n', _f_n, 'first_us', _f_first_us, 'last_us', _f_last_us, "
            "'first_val', _f_first_val, 'last_val', _f_last_val, "
            "'last_step', _f_last_step, 'last_prev_us', _f_last_prev, "
            f"'num_changes', _f_changes) END AS {_q(col)}",
        )

    def gauge_at_grain(
        self,
        gauge_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve gauge results at any coarser grain from the stored
        partials (toolkit ``delta(rollup(gauge_agg(...)))``):
        delta = last − first value of the target bucket, idelta/irate =
        the final step (falling back to the bucket-boundary step when
        the last parent bucket holds a single sample) — identical to
        ``gauge_agg`` over the raw rows of the target grain.

        Output: ``(bucket?, group…, n, delta, rate, idelta, irate,
        first_us, last_us)``."""
        from pyspark.sql import Window

        self._require_full_group_by(group_by, "gauge")
        d, keys_gb, bucket, grain_all = self._partial_frame(
            "gauges", gauge_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        st = F.col("_st")
        w = Window.partitionBy(*tcols, *keys_gb).orderBy(F.col("_src").asc())
        prev_last_val = F.lag(st["last_val"]).over(w)
        prev_last_us = F.lag(st["last_us"]).over(w)
        cand_idelta = F.coalesce(
            st["last_step"], st["first_val"] - prev_last_val
        )
        cand_prev_us = F.coalesce(st["last_prev_us"], prev_last_us)
        has_changes = _struct_has_field(d, "_st", "num_changes")
        d = d.select(
            *tcols,
            *keys_gb,
            "_src",
            st.alias("_st"),
            cand_idelta.alias("_cid"),
            cand_prev_us.alias("_cpu"),
            # one boundary change per adjacent parent pair (the counter
            # serve's _bchange; gauge num_changes counts value changes)
            F.when(
                prev_last_val.isNotNull(),
                (st["first_val"] != prev_last_val).cast("int"),
            ).alias("_bchange"),
        )
        # per-component min_by/max_by keyed on the parent bucket (_src,
        # unique within the target group → all components come from one
        # row). NO struct bundling here: an aliased-field struct inside
        # an aggregate over the dual-partial join trips Spark's
        # RemoveRedundantAliases into an unresolved plan (observed on
        # 4.1.2 with a projection on top).
        first_v = F.min_by(st["first_val"], F.col("_src"))
        last_v = F.max_by(st["last_val"], F.col("_src"))
        last_cid = F.max_by(F.col("_cid"), F.col("_src"))
        last_cpu = F.max_by(F.col("_cpu"), F.col("_src"))
        span_s = (
            F.max(st["last_us"]) - F.min(st["first_us"])
        ).cast("double") / 1e6
        out = d.groupBy(*tcols, *keys_gb).agg(
            F.sum(st["n"]).alias("n"),
            (last_v - first_v).alias("delta"),
            F.when(
                span_s > 0,
                (last_v - first_v) / span_s,
            ).alias("rate"),
            last_cid.alias("idelta"),
            F.when(
                last_cpu.isNotNull()
                & ((F.max(st["last_us"]) - last_cpu) > 0),
                last_cid
                / (
                    (F.max(st["last_us"]) - last_cpu).cast("double")
                    / 1e6
                ),
            ).alias("irate"),
            F.min(st["first_us"]).alias("first_us"),
            F.max(st["last_us"]).alias("last_us"),
            first_v.alias("first_val"),
            last_v.alias("last_val"),
            (
                (
                    F.sum(st["num_changes"])
                    + F.coalesce(F.sum("_bchange"), F.lit(0))
                )
                if has_changes
                else F.lit(None).cast("long")
            ).alias("num_changes"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def _stats_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """Mergeable 1-D STATS partial per (bucket, group):
        ``struct(n, s, s2, mn, mx)`` — raw moments, the classical
        parallel-aggregation decomposition (also how Spark's own
        partial aggregates merge). A spec with a ``"y"`` key builds the
        TWO-variable form instead (:meth:`_stats2d_state`)."""
        if spec.get("rollup_of"):
            return self._merge_stats_states(
                raw, col, spec["rollup_of"], two_d="y" in spec
            )
        if "y" in spec:
            return self._stats2d_state(raw, col, spec)
        v = F.expr(spec["value"]).cast("double")
        # strict NULL semantics: the moments already skip NULLs (count/
        # sum/min/max are null-skipping); an all-NULL group's state is
        # NULL instead of struct(0, NULL, …), consistent with the other
        # partial families — and the group's row always survives.
        # SQL-string expression build (round 17, see _over).
        flat = (
            raw.select(
                self._bucket_expr(raw), *self.row["group_by"], v.alias("_v")
            )
            .groupBy(self.row["bucket_alias"], *self.row["group_by"])
            .agg(
                F.expr("count(_v)").alias("_f_n"),
                F.expr("sum(_v)").alias("_f_s"),
                F.expr("sum(_v * _v)").alias("_f_s2"),
                F.expr("min(_v)").alias("_f_mn"),
                F.expr("max(_v)").alias("_f_mx"),
            )
        )
        return flat.selectExpr(
            _q(self.row["bucket_alias"]),
            *[_q(g) for g in self.row["group_by"]],
            "CASE WHEN _f_n > 0 THEN named_struct('n', _f_n, 's', _f_s, "
            f"'s2', _f_s2, 'mn', _f_mn, 'mx', _f_mx) END AS {_q(col)}",
        )

    def _stats2d_state(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Mergeable 2-D STATS partial per (bucket, group):
        ``struct(n, sx, sy, sxx, syy, sxy)`` — raw (co)moments of the
        sample pairs where BOTH values are non-NULL (PostgreSQL
        ``regr_*`` pair semantics; the toolkit two-variable
        ``stats_agg(y, x)``). Fieldwise sums merge commutatively, so
        :meth:`stats2d_at_grain` serves slope/intercept/corr/
        covariance at any coarser grain by the standard parallel-merge
        comoment corrections — identical to the same formulas over the
        raw rows of that grain. ``spec['value']`` is the INDEPENDENT
        variable (x), ``spec['y']`` the dependent one."""
        x = F.expr(spec["value"]).cast("double")
        y = F.expr(spec["y"]).cast("double")
        both = x.isNotNull() & y.isNotNull()
        base = raw.select(
            self._bucket_expr(raw),
            *self.row["group_by"],
            F.when(both, x).alias("_x"),
            F.when(both, y).alias("_y"),
        )
        # SQL-string expression build (round 17, see _over)
        flat = base.groupBy(
            self.row["bucket_alias"], *self.row["group_by"]
        ).agg(
            F.expr("count(_x)").alias("_f_n"),
            F.expr("sum(_x)").alias("_f_sx"),
            F.expr("sum(_y)").alias("_f_sy"),
            F.expr("sum(_x * _x)").alias("_f_sxx"),
            F.expr("sum(_y * _y)").alias("_f_syy"),
            F.expr("sum(_x * _y)").alias("_f_sxy"),
        )
        return flat.selectExpr(
            _q(self.row["bucket_alias"]),
            *[_q(g) for g in self.row["group_by"]],
            "CASE WHEN _f_n > 0 THEN named_struct('n', _f_n, "
            "'sx', _f_sx, 'sy', _f_sy, 'sxx', _f_sxx, 'syy', _f_syy, "
            f"'sxy', _f_sxy) END AS {_q(col)}",
        )

    def _is_stats2d(self, col: str) -> bool:
        spec = (self.row.get("stats_aggs") or {}).get(col)
        return bool(spec) and "y" in spec

    def stats_at_grain(
        self,
        stats_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve 1-D statistics at any coarser grain from the stored
        moments partials (toolkit ``rollup(stats_agg(...))``
        accessors): fieldwise add/min/max merge, then
        n/sum/avg/stddev/variance (sample)/min/max extraction."""
        if stats_col is None:
            # resolve BEFORE the 2-D guard, or a cagg whose only stats
            # column is 2-D slips into the 1-D serve and dies with an
            # opaque FIELD_NOT_FOUND on the comoment struct
            specs = self.row.get("stats_aggs") or {}
            if len(specs) == 1:
                stats_col = next(iter(specs))
        if stats_col is not None and self._is_stats2d(stats_col):
            raise ValueError(
                f"{stats_col!r} is a 2-D stats partial — use "
                f"stats2d_at_grain for slope/intercept/corr/covariance"
            )
        d, keys_gb, bucket, grain_all = self._partial_frame(
            "stats_aggs", stats_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        st = F.col("_st")
        n = F.sum(st["n"])
        s = F.sum(st["s"])
        s2 = F.sum(st["s2"])
        # sample variance; clamp tiny negative float residue, keep NULL
        # (not 0) for n <= 1 like stddev_samp
        var = F.when(
            n > 1, F.greatest((s2 - s * s / n) / (n - F.lit(1)), F.lit(0.0))
        )
        out = d.groupBy(*tcols, *keys_gb).agg(
            n.alias("n"),
            s.alias("sum"),
            F.when(n > 0, s / n).alias("avg"),
            F.sqrt(var).alias("stddev"),
            var.alias("variance"),
            F.min(st["mn"]).alias("min"),
            F.max(st["mx"]).alias("max"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def stats2d_at_grain(
        self,
        stats_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve 2-D linear-regression statistics at any coarser grain
        from the stored comoment partials — the toolkit
        ``stats_agg(y, x) → rollup → slope()/intercept()/corr()``
        idiom (the regression-over-time dashboard query; PG's
        ``regr_*`` family). Fieldwise sums merge, then the standard
        comoment corrections: ``Cxy = Σxy − ΣxΣy/n`` etc. With
        integer-quantized inputs every sum is exact, so the final
        divisions are IEEE-deterministic and a SQL replay of the same
        formulas matches bit-for-bit (the q_cagg_stats discipline).
        Subset ``group_by`` regrouping is allowed — comoments are
        commutative states.

        Output: ``(bucket?, group…, n, average_x, average_y, sum_x,
        sum_y, slope, intercept, covariance, corr,
        determination_coefficient)`` — slope/corr NULL for a
        degenerate x (all equal), covariance NULL for n ≤ 1, like
        ``regr_slope``/``covar_samp``."""
        if stats_col is None:
            two_d = [
                c
                for c, sp in (self.row.get("stats_aggs") or {}).items()
                if "y" in sp
            ]
            if len(two_d) != 1:
                raise ValueError(
                    f"cagg {self.name!r} has {len(two_d)} 2-D stats "
                    f"columns; pass stats_col"
                )
            stats_col = two_d[0]
        if not self._is_stats2d(stats_col):
            raise ValueError(
                f"{stats_col!r} is not a 2-D stats partial (create "
                f"with stats_aggs={{col: {{'value': x, 'y': y}}}})"
            )
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            stats_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        st = F.col("_st")
        n = F.sum(st["n"])
        sx = F.sum(st["sx"])
        sy = F.sum(st["sy"])
        sxx = F.sum(st["sxx"])
        syy = F.sum(st["syy"])
        sxy = F.sum(st["sxy"])
        # comoment corrections; clamp float residue like stats_at_grain.
        # nullif denominators, not when-guards: ANSI divide-by-zero
        # fires even inside an unreached CaseWhen branch under codegen
        # subexpression elimination, while x / NULL is cleanly NULL —
        # the same semantics (degenerate x → NULL slope/corr, n ≤ 1 →
        # NULL covariance, regr_slope/covar_samp behavior)
        cxx = F.greatest(sxx - sx * sx / n, F.lit(0.0))
        cyy = F.greatest(syy - sy * sy / n, F.lit(0.0))
        cxy = sxy - sx * sy / n
        slope = cxy / F.nullif(cxx, F.lit(0.0))
        out = d.groupBy(*tcols, *keys_gb).agg(
            n.alias("n"),
            (sx / n).alias("average_x"),
            (sy / n).alias("average_y"),
            sx.alias("sum_x"),
            sy.alias("sum_y"),
            slope.alias("slope"),
            ((sy - slope * sx) / n).alias("intercept"),
            (
                cxy / F.nullif((n - F.lit(1)).cast("double"), F.lit(0.0))
            ).alias("covariance"),
            (cxy / F.nullif(F.sqrt(cxx * cyy), F.lit(0.0))).alias("corr"),
            F.coalesce(
                cxy * cxy / F.nullif(cxx * cyy, F.lit(0.0)),
                F.when((cxx > 0) & (cyy == F.lit(0.0)), F.lit(1.0)),
            ).alias("determination_coefficient"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def _timeweight_state(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Mergeable TIME-WEIGHT partial per (bucket, group):
        ``struct(n, first_us, last_us, first_val, last_val, integral)``
        — ``integral`` is the within-bucket integral of the LOCF (or
        linear) interpolant in µs·value, i.e. Σ over consecutive
        non-null sample pairs of ``v1·Δt`` (LOCF) or ``(v1+v2)/2·Δt``
        (linear). Cagg buckets partition time disjointly, so merging
        adjacent partials adds exactly one boundary segment each (the
        :meth:`counter_at_grain` merge shape) — which makes
        :meth:`time_weighted_at_grain` equal to the toolkit
        ``average(rollup(time_weight(...)))`` over the raw rows of the
        target grain. Strict NULL semantics like the other families
        (functions/counters.py:time_weighted_avg is the raw-scan
        analog)."""
        if spec.get("rollup_of"):
            return self._merge_timeweight_states(
                raw,
                col,
                spec["rollup_of"],
                str(spec.get("method", "locf")).lower(),
            )
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        tb = list(spec.get("tiebreak") or ())
        method = str(spec.get("method", "locf")).lower()
        us = self._raw_time_us(raw)
        stepped = raw.select(
            self._bucket_expr(raw),
            *gb,
            *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
            us.alias("_us"),
            F.expr(spec["value"]).cast("double").alias("_v"),
        )
        # SQL-string expression build (round 17, see _over)
        bq, gbq = _q(balias), [_q(g) for g in gb]
        tbs = [f"_tb{i}" for i in range(len(tb))]
        wo = _over(
            [balias, *gb], ["_us ASC", *[f"{t} ASC" for t in tbs]]
        )
        frame = f"{wo} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        prev_v = f"last(_v, true) OVER ({frame})"
        prev_us = (
            f"last(CASE WHEN _v IS NOT NULL THEN _us END, true) "
            f"OVER ({frame})"
        )
        dt = f"CAST((_us - {prev_us}) AS DOUBLE)"
        if method == "linear":
            seg = f"(({prev_v} + _v) / 2.0D * {dt})"
        else:
            seg = f"({prev_v} * {dt})"
        key = (
            "CASE WHEN _v IS NOT NULL THEN named_struct('_us', _us"
            + "".join(f", '{t}', {t}" for t in tbs)
            + ") END"
        )
        stepped = stepped.selectExpr(
            bq,
            *gbq,
            "_us",
            "_v",
            # a NULL sample closes no segment (its span folds into the
            # next non-null sample's segment — prev_us skips NULLs)
            f"CASE WHEN _v IS NOT NULL THEN {seg} END AS _seg",
            f"{key} AS _k",
        )
        flat = stepped.groupBy(balias, *gb).agg(
            F.expr("count(_v)").alias("_f_n"),
            F.expr(
                "min(CASE WHEN _v IS NOT NULL THEN _us END)"
            ).alias("_f_first_us"),
            F.expr(
                "max(CASE WHEN _v IS NOT NULL THEN _us END)"
            ).alias("_f_last_us"),
            F.expr("min_by(_v, _k)").alias("_f_first_val"),
            F.expr("max_by(_v, _k)").alias("_f_last_val"),
            F.expr("coalesce(sum(_seg), 0.0D)").alias("_f_integral"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct("
            "'n', _f_n, 'first_us', _f_first_us, 'last_us', _f_last_us, "
            "'first_val', _f_first_val, 'last_val', _f_last_val, "
            f"'integral', _f_integral) END AS {_q(col)}",
        )

    def interpolated_average_at_grain(
        self,
        tw_col: Optional[str] = None,
        grain=None,
        realtime: Optional[bool] = None,
    ) -> DataFrame:
        """Serve the toolkit ``interpolated_average(rollup(
        time_weight(...)), start, width, prev, next)`` idiom from the
        stored partials: each group's samples define ONE global LOCF
        step function; each target bucket's average is the integral of
        that step function over the bucket divided by the covered
        duration — so a value set before an EMPTY bucket still fills
        it, and a segment crossing a bucket edge splits its weight
        between both buckets (what per-bucket time_weight gets wrong;
        semantics of functions/counters.py:interpolated_average, which
        is the raw-scan analog).

        From the partials this is exact with zero raw rescans below
        the watermark: within-parent integrals land in their parent's
        target bucket, and each boundary segment (prev parent's last
        sample → next parent's first) explodes over the target buckets
        it overlaps with exact int64-µs overlap arithmetic — the same
        product set as the raw computation, regrouped, so sums match
        bit-for-bit when values are integer-quantized. Target ``grain``
        must be a multiple of the cagg's bucket width (parents must
        nest). LOCF partials only.

        Output: ``(bucket, group…, tw_avg)`` — one row per target
        bucket the step function overlaps, empty-gap buckets included.
        """
        from pyspark.sql import Window

        from .functions.time import parse_interval

        tws = self.row.get("time_weights") or {}
        if not tws:
            raise ValueError(
                f"cagg {self.name!r} has no time_weight columns"
            )
        if tw_col is None:
            if len(tws) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several time_weights "
                    f"{sorted(tws)}; pass tw_col"
                )
            tw_col = next(iter(tws))
        if tw_col not in tws:
            raise KeyError(f"no time_weight column {tw_col!r}")
        if str(tws[tw_col].get("method", "locf")).lower() != "locf":
            raise ValueError(
                "interpolated_average_at_grain needs a LOCF time_weight "
                "(linear interpolation across gaps is interpolated_delta "
                "territory)"
            )
        if grain is None:
            raise ValueError(
                "interpolated_average_at_grain needs an explicit grain"
            )
        if self.row["time_is_timestamp"]:
            iv = parse_interval(grain)
            if iv.months:
                raise ValueError("needs a fixed-width grain")
            width = iv.us
        else:
            width = int(grain)
        pw = int(self.row["bucket_width_us"])
        if (
            self.row.get("bucket_width_months")
            or width <= 0
            or width % pw != 0
        ):
            raise ValueError(
                "grain must be a positive integer multiple of the "
                "cagg's fixed bucket width (parent buckets must nest)"
            )
        gb = list(self.row["group_by"])
        bucket = self.row["bucket_alias"]
        df = self.read(realtime=realtime, only_cols=[tw_col])
        if self.row["time_is_timestamp"]:
            src_us = F.unix_micros(F.col(bucket).cast("timestamp"))
        else:
            src_us = F.col(bucket).cast("long")
        base = df.select(
            *gb,
            src_us.alias("_src"),
            F.col(tw_col).alias("_st"),
        ).filter(F.col("_st").isNotNull())
        st = F.col("_st")
        w = Window.partitionBy(*gb).orderBy(F.col("_src").asc())
        prev_last_us = F.lag(st["last_us"]).over(w)
        prev_last_val = F.lag(st["last_val"]).over(w)
        seg = base.select(
            *gb,
            st.alias("_st"),
            prev_last_us.alias("_pt"),
            prev_last_val.alias("_pv"),
        )
        wl = F.lit(width).cast("long")
        org = int(self.row.get("bucket_origin_us") or 0)
        # within-parent piece: the stored integral, covering
        # [first_us, last_us] — one target bucket (parents nest:
        # the target grid shares the cagg's bucket origin, so with
        # width a multiple of the parent width every target edge is
        # a parent edge — origin-aligned floor, NOT epoch DIV, which
        # would mislabel e.g. weekly buckets Thursday-aligned and
        # truncate toward zero for pre-epoch timestamps)
        within = seg.select(
            *gb,
            _grain_floor(st["first_us"], width, org).alias("_b"),
            st["integral"].alias("_num"),
            (st["last_us"] - st["first_us"]).cast("double").alias("_den"),
        )
        # boundary piece: LOCF segment [prev.last_us, first_us) at the
        # previous parent's last value, exploded over the target
        # buckets it overlaps (bounded by gap span / width)
        bnd = seg.filter(
            F.col("_pt").isNotNull() & (st["first_us"] > F.col("_pt"))
        ).select(
            *gb,
            F.col("_pt").alias("_t1"),
            st["first_us"].alias("_t2"),
            F.col("_pv").alias("_v"),
        )
        b0 = _grain_floor(F.col("_t1"), width, org)
        b1 = _grain_floor(F.col("_t2") - F.lit(1).cast("long"), width, org)
        ex = bnd.select(
            *gb,
            "_t1",
            "_t2",
            "_v",
            F.explode(F.sequence(b0, b1, wl)).alias("_b"),
        )
        overlap = F.least(F.col("_t2"), F.col("_b") + wl) - F.greatest(
            F.col("_t1"), F.col("_b")
        )
        pieces = within.unionByName(
            ex.select(
                *gb,
                "_b",
                (F.col("_v") * overlap.cast("double")).alias("_num"),
                overlap.cast("double").alias("_den"),
            )
        )
        out = (
            pieces.groupBy(*gb, "_b")
            .agg(
                F.sum("_num").alias("_num"),
                F.sum("_den").alias("_den"),
            )
            .filter(F.col("_den") > 0)
        )
        if self.row["time_is_timestamp"]:
            bcol = F.timestamp_micros(F.col("_b")).alias(bucket)
        else:
            bcol = F.col("_b").alias(bucket)
        return out.select(
            bcol,
            *gb,
            (F.col("_num") / F.col("_den")).alias("tw_avg"),
        )

    def interpolated_delta_at_grain(
        self,
        counter_col: Optional[str] = None,
        grain=None,
        realtime: Optional[bool] = None,
    ) -> DataFrame:
        """Serve the toolkit ``interpolated_delta/interpolated_rate(
        rollup(counter_agg(...)), start, width, prev, next)`` idiom
        from the stored counter partials: the reset-adjusted counter is
        a monotone piecewise-linear function; each target bucket's
        delta is its interpolated value at the bucket edges (a segment
        crossing an edge splits its increase between both buckets),
        rate divides by the covered duration. Exact from partials with
        zero raw rescans because every target edge (a multiple of the
        parent width) falls inside a BOUNDARY segment between adjacent
        partials — never strictly inside a parent's sample span — so
        the adjusted values at all evaluation points are recoverable
        from (first/last value+time, delta) alone: within-span pieces
        telescope to the stored delta, boundary pieces interpolate
        between exactly-known endpoints (semantics of
        functions/counters.py:interpolated_delta, the raw-scan analog).
        Target ``grain`` must be a multiple of the cagg's bucket width.

        Output: ``(bucket, group…, delta, rate)``."""
        from pyspark.sql import Window

        from .functions.time import parse_interval

        counters = self.row.get("counters") or {}
        if not counters:
            raise ValueError(
                f"cagg {self.name!r} has no counter columns"
            )
        if counter_col is None:
            if len(counters) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several counters "
                    f"{sorted(counters)}; pass counter_col"
                )
            counter_col = next(iter(counters))
        if counter_col not in counters:
            raise KeyError(f"no counter column {counter_col!r}")
        if grain is None:
            raise ValueError(
                "interpolated_delta_at_grain needs an explicit grain"
            )
        if self.row["time_is_timestamp"]:
            iv = parse_interval(grain)
            if iv.months:
                raise ValueError("needs a fixed-width grain")
            width = iv.us
        else:
            width = int(grain)
        pw = int(self.row["bucket_width_us"])
        if (
            self.row.get("bucket_width_months")
            or width <= 0
            or width % pw != 0
        ):
            raise ValueError(
                "grain must be a positive integer multiple of the "
                "cagg's fixed bucket width (parent buckets must nest)"
            )
        gb = list(self.row["group_by"])
        bucket = self.row["bucket_alias"]
        df = self.read(realtime=realtime, only_cols=[counter_col])
        if self.row["time_is_timestamp"]:
            src_us = F.unix_micros(F.col(bucket).cast("timestamp"))
        else:
            src_us = F.col(bucket).cast("long")
        base = df.select(
            *gb,
            src_us.alias("_src"),
            F.col(counter_col).alias("_st"),
        ).filter(F.col("_st").isNotNull())
        st = F.col("_st")
        w = Window.partitionBy(*gb).orderBy(F.col("_src").asc())
        prev_last = F.lag(st["last_val"]).over(w)
        bstep = st["first_val"] - prev_last
        binc = (
            F.when(prev_last.isNull(), F.lit(0.0))
            .when(bstep < 0, st["first_val"])
            .otherwise(bstep)
        )
        knots = base.select(
            *gb,
            "_src",
            st.alias("_st"),
            binc.alias("_binc"),
        )
        wc = Window.partitionBy(*gb).orderBy(F.col("_src").asc())
        cum_binc = F.sum("_binc").over(
            wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum_delta_before = F.sum(st["delta"]).over(
            wc.rowsBetween(Window.unboundedPreceding, -1)
        )
        # anchor at the group's first sample VALUE (raw va(sample 1) =
        # v1): differences would cancel the anchor mathematically, but
        # the float interpolation below rounds differently under a
        # constant shift — anchoring reproduces the raw path's adjusted
        # values exactly (bit-for-bit with integer-quantized inputs)
        anchor = F.first(st["first_val"]).over(
            wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        vf = anchor + cum_binc + F.coalesce(cum_delta_before, F.lit(0.0))
        knots = knots.select(
            *gb,
            "_src",
            st["first_us"].alias("_fu"),
            st["last_us"].alias("_lu"),
            vf.alias("_vf"),
            (vf + st["delta"]).alias("_vl"),
        )
        wk = Window.partitionBy(*gb).orderBy(F.col("_src").asc())
        within = knots.select(
            *gb,
            F.col("_fu").alias("_t1"),
            F.col("_vf").alias("_v1"),
            F.col("_lu").alias("_t2"),
            F.col("_vl").alias("_v2"),
        )
        boundary = knots.select(
            *gb,
            F.lag("_lu").over(wk).alias("_t1"),
            F.lag("_vl").over(wk).alias("_v1"),
            F.col("_fu").alias("_t2"),
            F.col("_vf").alias("_v2"),
        ).filter(F.col("_t1").isNotNull())
        seg = within.unionByName(boundary).filter(
            F.col("_t2") > F.col("_t1")
        )
        wl = F.lit(width).cast("long")
        # origin-aligned target grid (same origin as the cagg's own
        # buckets, so target edges are parent edges — see
        # interpolated_average_at_grain)
        org = int(self.row.get("bucket_origin_us") or 0)
        b0 = _grain_floor(F.col("_t1"), width, org)
        b1 = _grain_floor(F.col("_t2") - F.lit(1).cast("long"), width, org)
        ex = seg.select(
            *gb,
            "_t1",
            "_v1",
            "_t2",
            "_v2",
            F.explode(F.sequence(b0, b1, wl)).alias("_b"),
        )
        lo = F.greatest(F.col("_t1"), F.col("_b"))
        hi = F.least(F.col("_t2"), F.col("_b") + wl)
        span = (F.col("_t2") - F.col("_t1")).cast("double")
        dv = F.col("_v2") - F.col("_v1")
        va_lo = F.col("_v1") + dv * (lo - F.col("_t1")).cast("double") / span
        va_hi = F.col("_v1") + dv * (hi - F.col("_t1")).cast("double") / span
        out = ex.groupBy(*gb, "_b").agg(
            F.sum(va_hi - va_lo).alias("delta"),
            (
                F.sum(va_hi - va_lo)
                / (F.sum((hi - lo).cast("double")) / F.lit(1e6))
            ).alias("rate"),
        )
        if self.row["time_is_timestamp"]:
            bcol = F.timestamp_micros(F.col("_b")).alias(bucket)
        else:
            bcol = F.col("_b").alias(bucket)
        return out.select(bcol, *gb, "delta", "rate")

    def time_weighted_at_grain(
        self,
        tw_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve exact time-weighted averages at any coarser grain from
        the stored partials — the toolkit
        ``average(rollup(time_weight(...)))`` idiom. Merging the
        consecutive parent partials inside each target bucket adds one
        interpolated boundary segment per adjacent pair (LOCF:
        ``A.last_val·Δt``; linear: ``(A.last_val+B.first_val)/2·Δt``),
        so the result equals ``time_weight → average`` over the raw
        rows of the target grain exactly; a single-sample target bucket
        returns that value (matching
        functions/counters.py:time_weighted_avg).

        Output: ``(bucket?, group…, tw_avg, n, first_us, last_us)``."""
        from pyspark.sql import Window

        tws = self.row.get("time_weights") or {}
        if not tws:
            raise ValueError(
                f"cagg {self.name!r} has no time_weight columns (pass "
                f"time_weights= to create_cagg)"
            )
        if tw_col is None:
            if len(tws) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several time_weights "
                    f"{sorted(tws)}; pass tw_col"
                )
            tw_col = next(iter(tws))
        if tw_col not in tws:
            raise KeyError(f"no time_weight column {tw_col!r}")
        # LOCF/linear boundary segments are only meaningful within one
        # series — same mergeability constraint as counters/gauges
        self._require_full_group_by(group_by, "time_weighted")
        method = str(tws[tw_col].get("method", "locf")).lower()
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            tw_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        st = F.col("_st")
        w = Window.partitionBy(*tcols, *keys_gb).orderBy(F.col("_src").asc())
        prev_last_val = F.lag(st["last_val"]).over(w)
        prev_last_us = F.lag(st["last_us"]).over(w)
        bdt = (st["first_us"] - prev_last_us).cast("double")
        if method == "linear":
            bseg = (prev_last_val + st["first_val"]) / F.lit(2.0) * bdt
        else:
            bseg = prev_last_val * bdt
        d = d.select(
            *tcols,
            *keys_gb,
            "_src",
            st.alias("_st"),
            F.coalesce(bseg, F.lit(0.0)).alias("_bseg"),
        )
        # flat aggregate + compute-in-projection (the state builders'
        # discipline): a when/otherwise around aggregates inside agg()
        # trips Spark 4.1.2's RemoveRedundantAliases under the
        # multi-partial join + projection shape (d42cb25 family)
        flat = d.groupBy(*tcols, *keys_gb).agg(
            (F.sum(st["integral"]) + F.sum("_bseg")).alias("_f_integral"),
            F.min_by(st["first_val"], F.col("_src")).alias("_f_first_val"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first_us"),
            F.max(st["last_us"]).alias("_f_last_us"),
        )
        # nullif/coalesce instead of when/otherwise: pruning a CaseWhen
        # output column through this union+window+aggregate stack is
        # exactly what flips RemoveRedundantAliases into an unresolved
        # plan on 4.1.2 (isolated empirically — projecting the sibling
        # plain columns is fine); x / NULL is NULL under ANSI, so the
        # semantics are identical
        span = (F.col("_f_last_us") - F.col("_f_first_us")).cast("double")
        out = flat.select(
            *tcols,
            *keys_gb,
            F.coalesce(
                F.col("_f_integral") / F.nullif(span, F.lit(0.0)),
                F.col("_f_first_val"),
            ).alias("tw_avg"),
            F.col("_f_n").alias("n"),
            F.col("_f_first_us").alias("first_us"),
            F.col("_f_last_us").alias("last_us"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def _candlestick_state(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Mergeable OHLC partial per (bucket, group): ``struct(n,
        first_us, last_us, open, high, low, close, volume, pv)`` —
        open/close are bookends on (time, tiebreak…), high/low/volume/
        pv are plain min/max/sums (``pv`` = Σ price·volume, so vwap
        survives the rollup). The toolkit ``candlestick_agg``
        decomposition (functions/stats.py:candlestick_agg is the
        raw-scan analog); every field merges losslessly across
        adjacent buckets, making :meth:`candlestick_at_grain` exact at
        any grain. Strict NULL semantics: NULL prices are skipped."""
        if spec.get("rollup_of"):
            return self._merge_candlestick_states(
                raw, col, spec["rollup_of"]
            )
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        tb = list(spec.get("tiebreak") or ())
        p = F.expr(spec["price"]).cast("double")
        vol_expr = spec.get("volume")
        vol = (
            F.lit(1.0)
            if vol_expr is None
            else F.expr(vol_expr).cast("double")
        )
        us = self._raw_time_us(raw)
        base = raw.select(
            self._bucket_expr(raw),
            *gb,
            *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
            us.alias("_us"),
            p.alias("_p"),
            vol.alias("_vol"),
        )
        # SQL-string expression build (round 17, see _over)
        bq, gbq = _q(balias), [_q(g) for g in gb]
        tbs = [f"_tb{i}" for i in range(len(tb))]
        key = (
            "CASE WHEN _p IS NOT NULL THEN named_struct('_us', _us"
            + "".join(f", '{t}', {t}" for t in tbs)
            + ") END"
        )
        base = base.selectExpr(
            bq, *gbq, "_us", "_p",
            "CASE WHEN _p IS NOT NULL THEN _vol END AS _vol",
            f"{key} AS _k",
        )
        flat = base.groupBy(balias, *gb).agg(
            F.expr("count(_p)").alias("_f_n"),
            F.expr(
                "min(CASE WHEN _p IS NOT NULL THEN _us END)"
            ).alias("_f_first_us"),
            F.expr(
                "max(CASE WHEN _p IS NOT NULL THEN _us END)"
            ).alias("_f_last_us"),
            F.expr("min_by(_p, _k)").alias("_f_open"),
            F.expr("max(_p)").alias("_f_high"),
            F.expr("min(_p)").alias("_f_low"),
            F.expr("max_by(_p, _k)").alias("_f_close"),
            F.expr("sum(_vol)").alias("_f_volume"),
            F.expr("sum(_p * _vol)").alias("_f_pv"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct("
            "'n', _f_n, 'first_us', _f_first_us, 'last_us', _f_last_us, "
            "'open', _f_open, 'high', _f_high, 'low', _f_low, "
            "'close', _f_close, 'volume', _f_volume, 'pv', _f_pv"
            f") END AS {_q(col)}",
        )

    def candlestick_at_grain(
        self,
        candle_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve exact OHLC/volume/vwap at any coarser grain from the
        stored partials — the toolkit ``rollup(candlestick_agg(...))``
        idiom. Parent buckets partition time disjointly, so the target
        bucket's open comes from its EARLIEST parent partial and its
        close from the LATEST (keyed on the partial's own first/last
        sample time — ``_src`` is unique per parent bucket within a
        group); high/low/volume/pv merge commutatively, so subset
        ``group_by`` regrouping is allowed (unlike counters/gauges,
        nothing here depends on a single series' ordering beyond the
        disjoint buckets). When a subset ``group_by`` merges SERIES
        that share a first/last sample timestamp, the per-series
        tiebreak columns are not recoverable from the partials, so
        the equal-time winner is instead chosen deterministically by
        price value: ties on ``first_us`` take the LOWEST open, ties
        on ``last_us`` the HIGHEST close (exact only when equal-time
        ties carry equal prices — same caveat as the toolkit's
        unspecified equal-time ordering).

        Output: ``(bucket?, group…, open, high, low, close, volume,
        vwap, n, first_us, last_us)``."""
        d, keys_gb, bucket, grain_all = self._partial_frame(
            "candlesticks", candle_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        st = F.col("_st")
        out = d.groupBy(*tcols, *keys_gb).agg(
            F.min_by(
                st["open"], F.struct(st["first_us"], st["open"])
            ).alias("open"),
            F.max(st["high"]).alias("high"),
            F.min(st["low"]).alias("low"),
            F.max_by(
                st["close"], F.struct(st["last_us"], st["close"])
            ).alias("close"),
            F.sum(st["volume"]).alias("volume"),
            (F.sum(st["pv"]) / F.sum(st["volume"])).alias("vwap"),
            F.sum(st["n"]).alias("n"),
            F.min(st["first_us"]).alias("first_us"),
            F.max(st["last_us"]).alias("last_us"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def _stateagg_state(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Mergeable STATE-AGG partial per (bucket, group): ``struct(n,
        first_us, last_us, first_state, last_state, durations)`` where
        ``durations`` maps each state to ``struct(d, n)`` — its
        within-bucket LOCF held time (µs) and sample count (toolkit
        ``state_agg`` decomposition;
        functions/state.py:state_durations is the raw-scan analog).
        Strict NULL semantics: NULL-state samples are skipped (they
        neither hold time nor break the LOCF chain); an all-NULL group
        keeps its row with a NULL state."""
        if spec.get("rollup_of"):
            return self._merge_stateagg_states(
                raw, col, spec["rollup_of"]
            )
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        tb = list(spec.get("tiebreak") or ())
        us = self._raw_time_us(raw)
        stepped = raw.select(
            self._bucket_expr(raw),
            *gb,
            *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
            us.alias("_us"),
            F.expr(spec["state"]).cast("string").alias("_s"),
        )
        # SQL-string expression build (round 17, see _over)
        bq, gbq = _q(balias), [_q(g) for g in gb]
        tbs = [f"_tb{i}" for i in range(len(tb))]
        # next NON-NULL sample's time (NULL states are skipped, so the
        # previous state holds across them). Round 17 (r16 verdict #3):
        # the ASC `first(…) OVER (1 FOLLOWING .. UNBOUNDED FOLLOWING)`
        # frame recomputes its scan per row — O(n²) in the bucket's row
        # count, quadratic on a single hot wide bucket. Since _us is
        # the LEADING sort key, the lookup is a suffix-min, so the
        # exact mirror is `last(…ignorenulls) OVER (UNBOUNDED PRECEDING
        # .. 1 PRECEDING)` under the reversed sort — O(n) running
        # state. The mirror is only row-identical when the order key is
        # unique, so _s is appended as the final disambiguator: rows
        # tied on the full (us, tiebreak…, state) key are
        # interchangeable for this computation (one of k identical
        # non-null rows absorbs the forward gap, the rest contribute 0
        # — the same duration MULTISET in any tie order), which ALSO
        # makes the per-state durations deterministic under (us,
        # tiebreak) ties, where the old position-based frame depended
        # on shuffle order.
        wo_desc = _over(
            [balias, *gb],
            ["_us DESC", *[f"{t} DESC" for t in tbs], "_s DESC"],
        )
        nxt_nn = (
            f"last(CASE WHEN _s IS NOT NULL THEN _us END, true) "
            f"OVER ({wo_desc} ROWS BETWEEN UNBOUNDED PRECEDING "
            f"AND 1 PRECEDING)"
        )
        key = (
            "CASE WHEN _s IS NOT NULL THEN named_struct('_us', _us"
            + "".join(f", '{t}', {t}" for t in tbs)
            + ") END"
        )
        stepped = stepped.selectExpr(
            bq,
            *gbq,
            "_s",
            f"CASE WHEN _s IS NOT NULL THEN "
            f"coalesce({nxt_nn}, _us) - _us END AS _dur",
            f"{key} AS _k",
        )
        stage1 = stepped.groupBy(balias, *gb, "_s").agg(
            F.expr("sum(_dur)").alias("_d"),
            F.expr("count(_k)").alias("_n"),
            F.expr("min(_k)").alias("_kmin"),
            F.expr("max(_k)").alias("_kmax"),
        )
        ent = (
            "CASE WHEN _s IS NOT NULL THEN named_struct("
            "'_s', _s, 'dn', named_struct('d', _d, 'n', _n)) END"
        )
        flat = stage1.groupBy(balias, *gb).agg(
            F.expr("sum(_n)").alias("_f_n"),
            F.expr("min(_kmin)").alias("_f_kmin"),
            F.expr("max(_kmax)").alias("_f_kmax"),
            F.expr("min_by(_s, _kmin)").alias("_f_first_state"),
            F.expr("max_by(_s, _kmax)").alias("_f_last_state"),
            F.expr(f"collect_list({ent})").alias("_f_ents"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct("
            "'n', _f_n, 'first_us', _f_kmin._us, 'last_us', _f_kmax._us, "
            "'first_state', _f_first_state, 'last_state', _f_last_state, "
            "'durations', map_from_entries(array_sort(_f_ents))"
            f") END AS {_q(col)}",
        )

    def state_durations_at_grain(
        self,
        state_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve exact per-state held durations at any coarser grain
        from the stored partials — the toolkit ``duration_in(state,
        rollup(state_agg(...)))`` idiom for every state at once.
        Merging consecutive partials inside a target bucket adds each
        boundary gap to the EARLIER partial's last state (LOCF), so
        the result equals ``state_durations`` over the raw rows of the
        target grain exactly.

        Output: ``(bucket?, group…, state, duration_us, n)``."""
        self._require_full_group_by(group_by, "state_durations")
        d, keys_gb, bucket, grain_all = self._partial_frame(
            "state_aggs", state_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        # SQL-string expression build (round 17, see _over)
        gbq = [_q(g) for g in keys_gb]
        wo = _over([*tcols, *keys_gb], ["_src ASC"])
        gap = f"(_st.first_us - lag(_st.last_us) OVER ({wo}))"
        d = d.selectExpr(
            *tcols,
            *gbq,
            "_st",
            f"lag(_st.last_state) OVER ({wo}) AS _bstate",
            f"CASE WHEN {gap} > 0 THEN {gap} END AS _bgap",
        )
        # within-partial per-state rows
        within = d.selectExpr(
            *tcols,
            *gbq,
            "explode(_st.durations) AS (state, _dn)",
        ).selectExpr(
            *tcols,
            *gbq,
            "state",
            "_dn.d AS _d",
            "_dn.n AS _n",
        )
        boundary = d.filter(
            F.col("_bstate").isNotNull() & F.col("_bgap").isNotNull()
        ).selectExpr(
            *tcols,
            *gbq,
            "_bstate AS state",
            "_bgap AS _d",
            "CAST(0 AS BIGINT) AS _n",
        )
        out = (
            within.unionByName(boundary)
            .groupBy(*tcols, *keys_gb, "state")
            .agg(
                F.sum("_d").alias("duration_us"),
                F.sum("_n").alias("n"),
            )
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    # ----------------------- frequency (topn) + max_n/min_n partials
    @staticmethod
    def _mg_trim_exprs(ents_col: str, cap: int):
        """Misra–Gries trim of an exact ``array<struct(c, v)>`` count
        list to ``capacity`` entries: sort by (count desc, value asc),
        subtract the (capacity+1)-th count from the survivors, drop the
        non-positive remainder (the offline SpaceSaving construction;
        error bound per value ≤ N/(capacity+1), and summed lower bounds
        stay mergeable — Agarwal et al., "Mergeable Summaries",
        PODS'12). When a bucket's distinct count ≤ capacity the cut is
        0 and the stored counts are EXACT — the any-grain exactness
        contract the q_cagg_topn gate checks. Returns (sorted_expr,
        counts_map_expr over the sorted alias ``_f_se``)."""
        sorted_expr = F.expr(
            f"array_sort({ents_col}, (a, b) -> CASE "
            f"WHEN a.c > b.c THEN -1 WHEN a.c < b.c THEN 1 "
            f"WHEN a.v < b.v THEN -1 WHEN a.v > b.v THEN 1 ELSE 0 END)"
        )
        cut = (
            f"IF(size(_f_se) > {cap}, "
            f"element_at(_f_se, {cap + 1}).c, CAST(0 AS BIGINT))"
        )
        counts = F.expr(
            f"map_from_entries(filter(transform(slice(_f_se, 1, {cap}),"
            f" e -> named_struct('v', e.v, 'c', e.c - {cut})),"
            f" e -> e.c > 0))"
        )
        return sorted_expr, counts

    def _freq_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """Mergeable FREQUENCY partial per (bucket, group):
        ``struct(n, counts: map<string,long>)`` — a Misra–Gries /
        SpaceSaving summary of at most ``capacity`` heavy hitters
        (toolkit ``freq_agg``/``topn_agg`` family;
        functions/stats.py:freq_sketch_topn is the raw-scan analog).
        Built from EXACT within-bucket counts (a cagg bucket bounds the
        group), then trimmed; states merge by summed lower bounds +
        re-trim, so :meth:`topn_at_grain` serves heavy hitters at any
        coarser grain with the mergeable-summaries error bound — and
        exactly when every bucket's distinct count fits the capacity.
        Strict NULL semantics: NULL values are skipped; n counts
        non-null samples."""
        if spec.get("rollup_of"):
            return self._merge_freq_states(
                raw, col, spec["rollup_of"], int(spec.get("capacity", 256))
            )
        cap = int(spec.get("capacity", 256))
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        v = F.expr(spec["value"]).cast("string")
        # exact (bucket, group, value) counts first — the map-side
        # combine collapses rows to distinct values before the exchange
        cnt = (
            raw.select(self._bucket_expr(raw), *gb, v.alias("_v"))
            .groupBy(balias, *gb, "_v")
            .agg(F.expr("count(_v)").alias("_c"))
        )
        # bound the per-group state BEFORE collecting: a rank window
        # keeps only the capacity+1 heaviest values (the trim needs the
        # (cap+1)-th count as the cut; everything ranked below has
        # count ≤ cut and would be trimmed to ≤ 0 anyway), and the same
        # exchange carries the group's total-sample sum — collect_list
        # is then bounded by capacity+1 entries, never the distinct
        # cardinality (the unbounded-collect trap _maxn_state avoids
        # the same way). SQL-string expression build (round 17, see
        # _over); group total as a FULL frame of the same ordered spec:
        # one sort, one WindowExec (round 14 — the merge_states trick).
        bq, gbq = _q(balias), [_q(g) for g in gb]
        wo = _over([balias, *gb], ["_c DESC", "_v ASC NULLS LAST"])
        ranked = cnt.selectExpr(
            bq,
            *gbq,
            "_v",
            "_c",
            f"row_number() OVER ({wo}) AS _rk",
            f"sum(_c) OVER ({wo} ROWS BETWEEN UNBOUNDED PRECEDING "
            f"AND UNBOUNDED FOLLOWING) AS _tot",
        ).filter(F.col("_rk") <= cap + 1)
        flat = ranked.groupBy(balias, *gb).agg(
            F.expr("min(_tot)").alias("_f_n"),
            F.expr(
                "collect_list(CASE WHEN _v IS NOT NULL THEN "
                "named_struct('c', _c, 'v', _v) END)"
            ).alias("_f_ents"),
        )
        sorted_expr, counts = self._mg_trim_exprs("_f_ents", cap)
        flat = flat.select(balias, *gb, "_f_n", sorted_expr.alias("_f_se"))
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_n") > 0,
                F.struct(
                    F.col("_f_n").alias("n"), counts.alias("counts")
                ),
            ).alias(col),
        )

    def _merge_freq_states(
        self, raw: DataFrame, col: str, src: str, cap: int
    ) -> DataFrame:
        """Child frequency state: per-value lower bounds ADD across the
        parent's states (Misra–Gries union), then one re-trim to the
        child capacity.

        The collect feeding the re-trim is CAPACITY-bounded, not
        grain-ratio-bounded: the trim only ever consults the
        ``capacity + 1`` heaviest summed values (slice 1..cap minus the
        (cap+1)-th count), so a rank window over the summed counts —
        the same ``_rk <= cap+1`` trick :meth:`_freq_state` uses on the
        raw side — drops everything below the cut BEFORE the
        collect_list. Without it a coarse child (hour→year at capacity
        256 ≈ 8,760 parents) would build a parents-per-child × capacity
        struct list per group; with it the state build is ≤ cap+1
        entries at any grain ratio. The window's total order (count
        desc, value asc) matches :meth:`_mg_trim_exprs`'s sort, so the
        pre-trim selects exactly the entries the full trim would."""
        from pyspark.sql import Window

        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        totals = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
        )
        wrank = Window.partitionBy(balias, *gb).orderBy(
            F.col("_c").desc(), F.col("_v").asc_nulls_last()
        )
        summed = (
            d.select(
                balias, *gb, F.explode(st["counts"]).alias("_v", "_c")
            )
            .groupBy(balias, *gb, "_v")
            .agg(F.sum("_c").alias("_c"))
            .withColumn("_rk", F.row_number().over(wrank))
            .filter(F.col("_rk") <= cap + 1)
            .groupBy(balias, *gb)
            .agg(
                F.collect_list(
                    F.struct(F.col("_c").alias("c"), F.col("_v").alias("v"))
                ).alias("_f_ents")
            )
        )
        keys = [balias, *gb]
        l, r = totals.alias("_fl"), summed.alias("_fr")
        cond = None
        for k in keys:
            c = F.col(f"_fl.{k}").eqNullSafe(F.col(f"_fr.{k}"))
            cond = c if cond is None else cond & c
        j = l.join(r, cond, "left").select(
            "_fl.*", F.col("_fr._f_ents").alias("_f_ents")
        )
        # a NULL _f_ents (every parent state NULL) flows through the
        # trim as NULL and is masked by the guard below
        sorted_expr, counts = self._mg_trim_exprs("_f_ents", cap)
        j = j.select(*keys, "_f_n", "_f_nn", sorted_expr.alias("_f_se"))
        return j.select(
            balias,
            *gb,
            F.when(
                (F.col("_f_nn") > 0) & F.col("_f_n").isNotNull(),
                F.struct(
                    F.col("_f_n").alias("n"), counts.alias("counts")
                ),
            ).alias(col),
        )

    def topn_at_grain(
        self,
        freq_col: Optional[str] = None,
        n: int = 10,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve the ``n`` most frequent values at any coarser grain
        from the stored Misra–Gries states — the toolkit
        ``topn(rollup(freq_agg(...)), n)`` idiom ("top URLs per hour,
        served per day"). Per-value lower bounds sum across merged
        states; any value with true frequency > N/(capacity+1) is
        guaranteed to surface, counts are lower bounds — and EXACT
        (so the top-n itself is exact) whenever every source bucket's
        distinct count fits its capacity. Subset ``group_by``
        regrouping is allowed (commutative merge). Deterministic order:
        count desc, value asc.

        Output: ``(bucket?, group…, value, freq_lb)``."""
        from pyspark.sql import Window

        d, keys_gb, bucket, grain_all = self._partial_frame(
            "freq_aggs", freq_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        merged = (
            d.select(
                *tcols,
                *keys_gb,
                F.explode(F.col("_st")["counts"]).alias("value", "_c"),
            )
            .groupBy(*tcols, *keys_gb, "value")
            .agg(F.sum("_c").alias("freq_lb"))
        )
        order = [F.col("freq_lb").desc(), F.col("value").asc()]
        if not tcols and not keys_gb:
            # global top-n: TakeOrderedAndProject, never an all-rows
            # single-partition window
            return merged.orderBy(*order).limit(n)
        w = Window.partitionBy(*tcols, *keys_gb).orderBy(*order)
        out = (
            merged.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk")
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def _maxn_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """Mergeable MAX-N/MIN-N candidate list per (bucket, group):
        ``struct(n, vals: array<double>)`` — the ``n`` largest (or
        smallest) values, sorted. Top-n is an exactly-mergeable
        summary (top-n of a union = top-n of the concatenated
        candidate lists), so :meth:`max_n_at_grain` is exact at every
        grain (toolkit ``max_n``/``min_n``;
        functions/stats.py:max_n is the raw-scan analog). The
        candidate list is built with a bounded rank window — never a
        whole-bucket collect.

        With a ``"by"`` payload expression (toolkit ``max_n_by(value,
        data, n)``) the state carries a parallel ``data`` array —
        entries ordered by (value, data) in the list's direction, so
        value ties resolve deterministically by payload and merges stay
        exact on the (value, data) total order."""
        if spec.get("rollup_of"):
            return self._merge_maxn_states(raw, col, spec)
        keep = int(spec.get("n", 5))
        desc = bool(spec.get("desc", True))
        by = spec.get("by")
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        v = F.expr(spec["value"]).cast("double")
        # SQL-string expression build (round 17, see _over).
        # NULLS LAST so NULL rows never occupy a kept rank, while still
        # riding the same window — every (bucket, group) keeps its row,
        # with a NULL state when all values were NULL (strict)
        bq, gbq = _q(balias), [_q(g) for g in gb]
        if by is not None:
            base = raw.select(
                self._bucket_expr(raw),
                *gb,
                v.alias("_v"),
                F.expr(by).alias("_d"),
            )
            wo = _over(
                [balias, *gb],
                ["_v DESC NULLS LAST", "_d DESC NULLS LAST"]
                if desc
                else ["_v ASC NULLS LAST", "_d ASC NULLS LAST"],
            )
            ranked = base.selectExpr(
                bq, *gbq, "_v", "_d", f"row_number() OVER ({wo}) AS _rk"
            )
            # sort stored entries by the selection rank, not by the
            # (v, d) struct: struct comparison orders NULL payloads
            # smallest, which for asc contradicts the window's
            # *_nulls_last payload order at value-tie keep boundaries
            flat = ranked.groupBy(balias, *gb).agg(
                F.expr("count(_v)").alias("_f_n"),
                F.expr(
                    f"sort_array(collect_list(CASE WHEN _rk <= {keep} "
                    f"AND _v IS NOT NULL THEN named_struct("
                    f"'r', _rk, 'v', _v, 'd', _d) END), true)"
                ).alias("_f_ents"),
            )
            return flat.selectExpr(
                bq,
                *gbq,
                "CASE WHEN _f_n > 0 THEN named_struct('n', _f_n, "
                "'vals', transform(_f_ents, e -> e.v), "
                f"'data', transform(_f_ents, e -> e.d)) END AS {_q(col)}",
            )
        base = raw.select(self._bucket_expr(raw), *gb, v.alias("_v"))
        wo = _over(
            [balias, *gb],
            ["_v DESC NULLS LAST" if desc else "_v ASC NULLS LAST"],
        )
        ranked = base.selectExpr(
            bq, *gbq, "_v", f"row_number() OVER ({wo}) AS _rk"
        )
        flat = ranked.groupBy(balias, *gb).agg(
            F.expr("count(_v)").alias("_f_n"),
            F.expr(
                f"sort_array(collect_list(CASE WHEN _rk <= {keep} "
                f"AND _v IS NOT NULL THEN _v END), "
                f"{str(not desc).lower()})"
            ).alias("_f_vals"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct('n', _f_n, "
            f"'vals', _f_vals) END AS {_q(col)}",
        )

    def _merge_maxn_states(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Child candidate list: the child's top-n of the union equals
        the top-n of the concatenated parent lists — selected with a
        CAPACITY-bounded rank window over the exploded candidates (the
        same ``_rk <= keep`` trick as :meth:`_merge_freq_states`), never
        a parents-per-child × n flatten-collect, so the state build is
        ≤ n values per group at any grain ratio. Equal values are
        interchangeable, so the rank tie-order never changes the kept
        multiset."""
        from pyspark.sql import Window

        keep = int(spec.get("n", 5))
        desc = bool(spec.get("desc", True))
        has_by = spec.get("by") is not None
        d, balias, gb = self._rollup_frame(raw, spec["rollup_of"])
        st = F.col("_st")
        totals = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
        )
        if has_by:
            ex = d.select(
                balias,
                *gb,
                F.explode(
                    F.arrays_zip(
                        st["vals"].alias("v"), st["data"].alias("d")
                    )
                ).alias("_e"),
            ).select(
                balias,
                *gb,
                F.col("_e.v").alias("_v"),
                F.col("_e.d").alias("_d"),
            )
            order = (
                [F.col("_v").desc(), F.col("_d").desc_nulls_last()]
                if desc
                else [F.col("_v").asc(), F.col("_d").asc_nulls_last()]
            )
            w = Window.partitionBy(balias, *gb).orderBy(*order)
            # rank-order the stored entries (see _maxn_state: struct
            # sort breaks *_nulls_last payload order on asc ties)
            cand = (
                ex.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= keep)
                .groupBy(balias, *gb)
                .agg(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("_rk").alias("r"),
                                F.col("_v").alias("v"),
                                F.col("_d").alias("d"),
                            )
                        ),
                        asc=True,
                    ).alias("_f_ents")
                )
            )
        else:
            order = F.col("_v").desc() if desc else F.col("_v").asc()
            w = Window.partitionBy(balias, *gb).orderBy(order)
            cand = (
                d.select(balias, *gb, F.explode(st["vals"]).alias("_v"))
                .withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= keep)
                .groupBy(balias, *gb)
                .agg(
                    F.sort_array(
                        F.collect_list("_v"), asc=not desc
                    ).alias("_f_vals")
                )
            )
        keys = [balias, *gb]
        l, r = totals.alias("_ml"), cand.alias("_mr")
        cond = None
        for k in keys:
            c = F.col(f"_ml.{k}").eqNullSafe(F.col(f"_mr.{k}"))
            cond = c if cond is None else cond & c
        if has_by:
            j = l.join(r, cond, "left").select(
                "_ml.*", F.col("_mr._f_ents").alias("_f_ents")
            )
            return j.select(
                balias,
                *gb,
                F.when(
                    (F.col("_f_nn") > 0) & (F.col("_f_n") > 0),
                    F.struct(
                        F.col("_f_n").alias("n"),
                        F.expr("transform(_f_ents, e -> e.v)").alias(
                            "vals"
                        ),
                        F.expr("transform(_f_ents, e -> e.d)").alias(
                            "data"
                        ),
                    ),
                ).alias(col),
            )
        j = l.join(r, cond, "left").select(
            "_ml.*", F.col("_mr._f_vals").alias("_f_vals")
        )
        return j.select(
            balias,
            *gb,
            F.when(
                (F.col("_f_nn") > 0) & (F.col("_f_n") > 0),
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_vals").alias("vals"),
                ),
            ).alias(col),
        )

    def max_n_at_grain(
        self,
        maxn_col: Optional[str] = None,
        n: Optional[int] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve the ``n`` largest/smallest values at any coarser grain
        from the stored candidate lists — the toolkit
        ``into_values(rollup(max_n(...)))`` idiom. Exact at every
        grain: the target's top-n is the top-n of the concatenated
        per-bucket candidate lists (each list kept at least as many
        values as any request can need). ``n`` defaults to the stored
        list length; requesting more raises. Subset ``group_by``
        regrouping is allowed.

        Output: ``(bucket?, group…, value)`` rows, best-first —
        ``(bucket?, group…, value, data)`` for a ``max_n_by`` column
        (value ties ordered by payload in the list's direction)."""
        from pyspark.sql import Window

        specs = self.row.get("maxn_aggs") or {}
        if maxn_col is None:
            if len(specs) != 1:
                raise ValueError(
                    f"cagg {self.name!r} has {len(specs)} max_n "
                    f"columns; pass maxn_col"
                )
            maxn_col = next(iter(specs))
        if maxn_col not in specs:
            raise KeyError(f"no max_n column {maxn_col!r}")
        spec = specs[maxn_col]
        keep = int(spec.get("n", 5))
        desc = bool(spec.get("desc", True))
        has_by = spec.get("by") is not None
        if n is None:
            n = keep
        if n > keep:
            raise ValueError(
                f"max_n_at_grain(n={n}) exceeds the stored candidate "
                f"list length ({keep}) — recreate the cagg with a "
                f"larger n"
            )
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            maxn_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        if has_by:
            ex = d.select(
                *tcols,
                *keys_gb,
                F.explode(
                    F.arrays_zip(
                        F.col("_st")["vals"].alias("v"),
                        F.col("_st")["data"].alias("d"),
                    )
                ).alias("_e"),
            ).select(
                *tcols,
                *keys_gb,
                F.col("_e.v").alias("value"),
                F.col("_e.d").alias("data"),
            )
            order = (
                [F.col("value").desc(), F.col("data").desc_nulls_last()]
                if desc
                else [F.col("value").asc(), F.col("data").asc_nulls_last()]
            )
        else:
            ex = d.select(
                *tcols,
                *keys_gb,
                F.explode(F.col("_st")["vals"]).alias("value"),
            )
            order = [
                F.col("value").desc() if desc else F.col("value").asc()
            ]
        if not tcols and not keys_gb:
            return ex.orderBy(*order).limit(n)
        w = Window.partitionBy(*tcols, *keys_gb).orderBy(*order)
        out = (
            ex.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk")
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def interpolated_duration_in_at_grain(
        self,
        state,
        state_col: Optional[str] = None,
        grain=None,
        realtime: Optional[bool] = None,
    ) -> DataFrame:
        """Serve the toolkit ``interpolated_duration_in(state,
        rollup(state_agg(...)), start, width, prev, next)`` idiom from
        the stored state partials: the samples define ONE global LOCF
        state machine; each target bucket accrues the time the machine
        spent in ``state`` within it — so a state carried across a
        bucket edge (or through an empty bucket) still accrues there,
        what per-bucket ``duration_in`` gets wrong.

        Exact from partials with zero raw rescans below the watermark:
        within-parent held time lies inside the parent's sample span
        (⊆ one target bucket, since parents nest on the shared
        origin-aligned grid) and lands there; each boundary segment
        ([A.last_us, B.first_us) held at A's last state) explodes over
        the target buckets it overlaps with exact int64-µs overlap
        arithmetic (functions/state.py:interpolated_duration_in is the
        raw-scan analog — with non-NULL state samples the two agree
        bit-for-bit; NULL samples end a raw segment but are transparent
        to the partials' LOCF, the state_agg convention). Target
        ``grain`` must be a multiple of the cagg's bucket width.

        Output: ``(bucket, group…, duration_us)``."""
        from .functions.time import parse_interval

        sas = self.row.get("state_aggs") or {}
        if not sas:
            raise ValueError(
                f"cagg {self.name!r} has no state_agg columns"
            )
        if state_col is None:
            if len(sas) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several state_aggs "
                    f"{sorted(sas)}; pass state_col"
                )
            state_col = next(iter(sas))
        if state_col not in sas:
            raise KeyError(f"no state_agg column {state_col!r}")
        if grain is None:
            raise ValueError(
                "interpolated_duration_in_at_grain needs an explicit "
                "grain"
            )
        if self.row["time_is_timestamp"]:
            iv = parse_interval(grain)
            if iv.months:
                raise ValueError("needs a fixed-width grain")
            width = iv.us
        else:
            width = int(grain)
        pw = int(self.row["bucket_width_us"])
        if (
            self.row.get("bucket_width_months")
            or width <= 0
            or width % pw != 0
        ):
            raise ValueError(
                "grain must be a positive integer multiple of the "
                "cagg's fixed bucket width (parent buckets must nest)"
            )
        gb = list(self.row["group_by"])
        bucket = self.row["bucket_alias"]
        df = self.read(realtime=realtime, only_cols=[state_col])
        if self.row["time_is_timestamp"]:
            src_us = F.unix_micros(F.col(bucket).cast("timestamp"))
        else:
            src_us = F.col(bucket).cast("long")
        base = df.select(
            *gb, src_us.alias("_src"), F.col(state_col).alias("_st")
        ).filter(F.col("_st").isNotNull())
        # SQL-string expression build (round 17, see _over)
        gbq = [_q(g) for g in gb]
        wo = _over(gb, ["_src ASC"])
        seg = base.selectExpr(
            *gbq,
            "_st",
            f"lag(_st.last_us) OVER ({wo}) AS _pt",
            f"lag(_st.last_state) OVER ({wo}) AS _ps",
        )
        org = int(self.row.get("bucket_origin_us") or 0)
        ssq = "'" + str(state).replace("'", "''") + "'"
        # within-parent piece: the stored per-state held time for the
        # requested state, entirely inside one target bucket
        within = seg.selectExpr(
            *gbq,
            _grain_floor_sql("_st.first_us", width, org) + " AS _b",
            f"coalesce(element_at(_st.durations, {ssq}).d, "
            f"CAST(0 AS BIGINT)) AS _d",
        ).filter(F.col("_d") > 0)
        # boundary piece: LOCF segment at the previous parent's last
        # state, exploded over the target buckets it overlaps
        bnd = seg.filter(
            F.expr(
                f"_pt IS NOT NULL AND _st.first_us > _pt "
                f"AND _ps <=> {ssq}"
            )
        ).selectExpr(*gbq, "_pt AS _t1", "_st.first_us AS _t2")
        b0 = _grain_floor_sql("_t1", width, org)
        b1 = _grain_floor_sql("(_t2 - CAST(1 AS BIGINT))", width, org)
        ex = bnd.selectExpr(
            *gbq,
            "_t1",
            "_t2",
            f"explode(sequence({b0}, {b1}, "
            f"CAST({int(width)} AS BIGINT))) AS _b",
        )
        pieces = within.unionByName(
            ex.selectExpr(
                *gbq,
                "_b",
                f"least(_t2, _b + CAST({int(width)} AS BIGINT)) - "
                f"greatest(_t1, _b) AS _d",
            )
        )
        out = pieces.groupBy(*gb, "_b").agg(
            F.expr("sum(_d)").alias("duration_us")
        )
        if self.row["time_is_timestamp"]:
            bcol = F.timestamp_micros(F.col("_b")).alias(bucket)
        else:
            bcol = F.col("_b").alias(bucket)
        return out.select(bcol, *gb, "duration_us")

    # ------------------------------------------ heartbeat partials
    def _heartbeat_state(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Mergeable HEARTBEAT (liveness) partial per (bucket, group):
        ``struct(n, first_us, last_us, live_us, ranges)`` — every
        heartbeat asserts liveness for ``liveness`` after it; live_us
        is the union length of those intervals over the bucket's own
        heartbeats with the LAST beat contributing its full interval
        (toolkit ``heartbeat_agg``; functions/state.py:heartbeat_agg
        is the raw-scan analog). Merging two adjacent partials needs
        only one boundary correction — the earlier partial's last beat
        contributed L but should contribute ``min(gap, L)`` — so
        :meth:`heartbeat_at_grain` serves exact liveness rollups at
        any grain, the ops analog of the counter family."""
        if spec.get("rollup_of"):
            return self._merge_heartbeat_states(raw, col, spec)
        liv = int(spec["liveness_us"])
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        tb = list(spec.get("tiebreak") or ())
        us = self._raw_time_us(raw)
        base = raw.select(
            self._bucket_expr(raw),
            *gb,
            *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
            us.alias("_us"),
        )
        # SQL-string expression build (round 17, see _over)
        bq, gbq = _q(balias), [_q(g) for g in gb]
        tbs = [f"_tb{i}" for i in range(len(tb))]
        wo = _over(
            [balias, *gb], ["_us ASC", *[f"{t} ASC" for t in tbs]]
        )
        gap = f"(lead(_us) OVER ({wo}) - _us)"
        stepped = base.selectExpr(
            bq,
            *gbq,
            "_us",
            f"CASE WHEN {gap} IS NULL THEN {liv} "
            f"ELSE least({gap}, {liv}) END AS _live",
            f"CAST(({gap} > {liv}) AS BIGINT) AS _brk",
        )
        flat = stepped.groupBy(balias, *gb).agg(
            F.expr("count(1)").alias("_f_n"),
            F.expr("min(_us)").alias("_f_first"),
            F.expr("max(_us)").alias("_f_last"),
            F.expr("sum(_live)").alias("_f_live"),
            F.expr("1 + coalesce(sum(_brk), 0)").alias("_f_ranges"),
        )
        return flat.selectExpr(
            bq,
            *gbq,
            "CASE WHEN _f_n > 0 THEN named_struct("
            "'n', _f_n, 'first_us', _f_first, 'last_us', _f_last, "
            f"'live_us', _f_live, 'ranges', _f_ranges) END AS {_q(col)}",
        )

    def _merge_heartbeat_states(
        self, raw: DataFrame, col: str, spec: dict
    ) -> DataFrame:
        """Child heartbeat state: ordered merge of the parent's states
        with one boundary correction per adjacent pair."""
        from pyspark.sql import Window

        liv = int(spec["liveness_us"])
        d, balias, gb = self._rollup_frame(raw, spec["rollup_of"])
        st = F.col("_st")
        w = Window.partitionBy(balias, *gb).orderBy(F.col("_src").asc())
        # last NON-NULL preceding state, not plain lag: _rollup_frame
        # keeps NULL parent states by contract, and a NULL row between
        # two real partials must not suppress their boundary correction
        # (the _merge_counter_states discipline)
        wp = w.rowsBetween(Window.unboundedPreceding, -1)
        prev_last = F.last(
            F.when(st.isNotNull(), st["last_us"]), ignorenulls=True
        ).over(wp)
        gap = st["first_us"] - prev_last
        # the earlier partial's last beat contributed the full L; in
        # the merged sequence it should contribute min(gap, L)
        corr = F.when(
            prev_last.isNotNull(), F.lit(liv) - F.least(gap, F.lit(liv))
        )
        joined = F.when(
            prev_last.isNotNull() & (gap <= liv), F.lit(1)
        ).otherwise(F.lit(0))
        dd = d.select(
            balias,
            *gb,
            st.alias("_st"),
            F.coalesce(corr, F.lit(0)).alias("_corr"),
            joined.alias("_join"),
        )
        flat = dd.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first"),
            F.max(st["last_us"]).alias("_f_last"),
            (F.sum(st["live_us"]) - F.sum("_corr")).alias("_f_live"),
            (F.sum(st["ranges"]) - F.sum("_join")).alias("_f_ranges"),
        )
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_first").alias("first_us"),
                    F.col("_f_last").alias("last_us"),
                    F.col("_f_live").alias("live_us"),
                    F.col("_f_ranges").alias("ranges"),
                ),
            ).alias(col),
        )

    def heartbeat_at_grain(
        self,
        hb_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve exact liveness statistics at any coarser grain from
        the stored heartbeat partials — the toolkit
        ``rollup(heartbeat_agg(...))`` → ``live_time/dead_time/
        num_live_ranges`` idiom. Identical to ``heartbeat_agg`` over
        the raw heartbeats of the target grain: within-bucket unions
        are stored, each adjacent pair adds one boundary correction.
        ``dead_us`` is the uncovered time within the observed span
        ``[first_us, last_us + L)``. Ordered merge within one series —
        full ``group_by`` required like counters/gauges.

        Output: ``(bucket?, group…, n, live_us, dead_us,
        num_live_ranges, first_us, last_us)``.

        DOCUMENTED DEVIATION from toolkit ``heartbeat_agg(ts, start,
        agg_interval, liveness)``: the toolkit declares an aggregation
        interval and clips liveness at its edges; this accessor
        measures over the OBSERVED span instead — the last beat's
        liveness tail is never clipped at the bucket edge (``live_us``
        can exceed the bucket span; the tail is not credited to the
        next bucket) and ``dead_us`` covers ``[first_us, last_us+L)``,
        not a declared interval. Self-consistent and exact for "how
        much liveness did this bucket's own heartbeats assert"; for
        toolkit-style declared-interval numbers use
        :meth:`heartbeat_interpolated_at_grain`, which clips each
        bucket to its own span and credits cross-edge tails to the
        next bucket."""
        self._require_full_group_by(group_by, "heartbeat")
        specs = self.row.get("heartbeat_aggs") or {}
        if hb_col is None:
            if len(specs) != 1:
                raise ValueError(
                    f"cagg {self.name!r} has {len(specs)} heartbeat "
                    f"columns; pass hb_col"
                )
            hb_col = next(iter(specs))
        if hb_col not in specs:
            raise KeyError(f"no heartbeat column {hb_col!r}")
        liv = int(specs[hb_col]["liveness_us"])
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            hb_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        # SQL-string expression build (round 17, see _over)
        gbq = [_q(g) for g in keys_gb]
        wo = _over([*tcols, *keys_gb], ["_src ASC"])
        prev_last = f"lag(_st.last_us) OVER ({wo})"
        gap = f"(_st.first_us - {prev_last})"
        dd = d.selectExpr(
            *tcols,
            *gbq,
            "_st",
            f"coalesce(CASE WHEN {prev_last} IS NOT NULL THEN "
            f"{liv} - least({gap}, {liv}) END, 0) AS _corr",
            f"CASE WHEN {prev_last} IS NOT NULL AND {gap} <= {liv} "
            f"THEN 1 ELSE 0 END AS _join",
        )
        live = "(sum(_st.live_us) - sum(_corr))"
        out = dd.groupBy(*tcols, *keys_gb).agg(
            F.expr("sum(_st.n)").alias("n"),
            F.expr(live).alias("live_us"),
            F.expr(
                f"max(_st.last_us) + {liv} - min(_st.first_us) - {live}"
            ).alias("dead_us"),
            F.expr("sum(_st.ranges) - sum(_join)").alias(
                "num_live_ranges"
            ),
            F.expr("min(_st.first_us)").alias("first_us"),
            F.expr("max(_st.last_us)").alias("last_us"),
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def heartbeat_interpolated_at_grain(
        self,
        hb_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Toolkit-style DECLARED-INTERVAL heartbeat serve —
        ``interpolated_live_time`` / ``interpolated_dead_time``
        (toolkit heartbeat_agg with start/agg_interval): each target
        bucket is its own declared interval, so

        - the last beat's liveness tail is CLIPPED at the bucket edge
          and the clipped portion is credited to the NEXT bucket that
          has beats (only the previous bucket's last beat can reach —
          every earlier beat's credited span ends at the next beat,
          which is still inside its own bucket);
        - ``dead_us`` is ``bucket_width − live_us`` (time before the
          first beat / after the last tail inside the bucket counts
          dead, unlike :meth:`heartbeat_at_grain`'s observed-span
          rule).

        Exactly the interval-algebra replay of the raw per-beat
        segments ``[t, min(t+L, next_t))`` clipped per bucket (the
        oracle-gate contract). Buckets with no heartbeats of their own
        emit no row, even when a previous tail reaches into them.
        Fixed-width grains only. One extra ``lag`` window over the
        per-bucket merged stats — O(buckets), not O(beats)."""
        from .functions.time import parse_interval
        from pyspark.sql import Window

        specs = self.row.get("heartbeat_aggs") or {}
        if hb_col is None:
            if len(specs) != 1:
                raise ValueError(
                    f"cagg {self.name!r} has {len(specs)} heartbeat "
                    f"columns; pass hb_col"
                )
            hb_col = next(iter(specs))
        if hb_col not in specs:
            raise KeyError(f"no heartbeat column {hb_col!r}")
        liv = int(specs[hb_col]["liveness_us"])
        if grain == "all":
            raise ValueError(
                "interpolated heartbeat needs a fixed-width grain "
                "(each bucket is the declared agg interval)"
            )
        if grain is None:
            if self.row.get("bucket_width_months"):
                raise ValueError(
                    "interpolated heartbeat needs a fixed-width grain"
                )
            width = int(self.row["bucket_width_us"])
        elif isinstance(grain, int):
            width = int(grain)
        else:
            iv = parse_interval(grain)
            if iv.months:
                raise ValueError(
                    "interpolated heartbeat needs a fixed-width grain"
                )
            width = iv.us
        base = self.heartbeat_at_grain(
            hb_col, grain, group_by, realtime, start, end
        )
        bucket = self.row["bucket_alias"]
        gb = list(self.row["group_by"] if group_by is None else group_by)
        if self.row["time_is_timestamp"]:
            tgt_us = F.unix_micros(F.col(bucket))
        else:
            tgt_us = F.col(bucket).cast("long")
        w = Window.partitionBy(*gb).orderBy(F.col(bucket).asc())
        prev_last = F.lag("last_us").over(w)
        ll = F.lit(liv).cast("long")
        wl = F.lit(width).cast("long")
        tail_out = F.greatest(
            F.lit(0).cast("long"),
            F.col("last_us") + ll - (tgt_us + wl),
        )
        reach = F.least(prev_last + ll, F.col("first_us"))
        carry = F.when(
            prev_last.isNotNull(),
            F.greatest(F.lit(0).cast("long"), reach - tgt_us),
        ).otherwise(F.lit(0).cast("long"))
        live2 = F.col("live_us") - tail_out + carry
        # the carried tail is a separate range unless it touches the
        # first beat ([start, reach) meets [first_us, ...) iff
        # reach == first_us)
        ranges2 = F.col("num_live_ranges") + F.when(
            (carry > 0) & (reach < F.col("first_us")), F.lit(1)
        ).otherwise(F.lit(0))
        return base.select(
            bucket,
            *gb,
            "n",
            live2.alias("live_us"),
            (wl - live2).alias("dead_us"),
            ranges2.alias("num_live_ranges"),
        )

    # ------------------------------------------ t-digest partials
    def _tdigest_state(self, raw: DataFrame, col: str, spec: dict) -> DataFrame:
        """Mergeable T-DIGEST partial per (bucket, group):
        ``struct(n, min, max, means, weights)`` — ≤ ``delta`` centroids
        binned by the k1 scale function, singletons (lossless) while
        the bucket holds ≤ ``delta`` values (toolkit ``tdigest``;
        functions/tdigest.py has the algorithm notes and the raw-scan
        analog). States merge order-independently (global re-sort +
        re-bin), so :meth:`tdigest_quantiles_at_grain` serves
        percentiles at any coarser grain with free regrouping — the
        rank-error sibling of the DDSketch family."""
        from .functions.tdigest import build_states, merge_states

        delta = int(spec.get("delta", 200))
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        if spec.get("rollup_of"):
            d, balias, gb = self._rollup_frame(raw, spec["rollup_of"])
            return merge_states(
                d.select(balias, *gb, F.col("_st").alias("_tdp")),
                [balias, *gb],
                "_tdp",
                delta,
                col,
            )
        return build_states(
            raw.select(self._bucket_expr(raw), *gb,
                       F.expr(spec["value"]).alias("_tdv")),
            [balias, *gb],
            F.col("_tdv"),
            delta,
            col,
        )

    def tdigest_quantiles_at_grain(
        self,
        qs: Sequence[float],
        td_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve percentiles from the stored t-digest states — the
        toolkit ``approx_percentile(q, rollup(tdigest(...)))`` idiom.
        States merge commutatively (re-sort + re-bin by cumulative
        weight), so any coarser grain and any SUBSET regrouping are
        allowed, like the sketch family. Exact (type-7 /
        ``percentile_cont``) whenever the merged digest stays lossless
        (total values per served group ≤ delta) — the oracle-gate
        contract; rank-error ≲ π/(2·delta) otherwise.

        Output: ``(bucket?, group…, n, min_val, max_val, p50, …)``."""
        from .functions.tdigest import merge_states, tdigest_quantiles

        specs = self.row.get("tdigest_aggs") or {}
        if not specs:
            raise ValueError(
                f"cagg {self.name!r} has no tdigest columns (pass "
                f"tdigest_aggs= to create_cagg)"
            )
        if td_col is None:
            if len(specs) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several tdigests "
                    f"{sorted(specs)}; pass td_col"
                )
            td_col = next(iter(specs))
        if td_col not in specs:
            raise KeyError(f"no tdigest column {td_col!r}")
        delta = int(specs[td_col].get("delta", 200))
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            td_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        merged = merge_states(
            d.select(*tcols, *keys_gb, "_st"),
            [*tcols, *keys_gb],
            "_st",
            delta,
            "_td",
        )
        out = tdigest_quantiles(
            merged, list(qs), by=[*tcols, *keys_gb], state_col="_td"
        )
        if grain_all:
            return out
        return out.withColumnRenamed("_tgt", bucket)

    def tdigest_summary_at_grain(
        self,
        td_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """The t-digest's EXACT scalar accessors (``num_vals`` /
        ``min_val`` / ``max_val``) served at any grain — the no-quantile
        projection of :meth:`tdigest_quantiles_at_grain` (the SQL
        accessor route's entry point)."""
        return self.tdigest_quantiles_at_grain(
            [], td_col, grain, group_by, realtime, start, end
        )

    def tdigest_rank_at_grain(
        self,
        value: float,
        td_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        out: str = "rank",
        start=None,
        end=None,
    ) -> DataFrame:
        """``approx_percentile_rank(value, rollup(tdigest(...)))`` —
        the t-digest inverse (CDF) accessor: fraction of ingested
        values ≤ ``value`` per served bucket/group, from the stored
        states under the same merge/grain/realtime rules as
        :meth:`tdigest_quantiles_at_grain`. Exact while the merged
        digest stays lossless (the oracle-gate contract); standard
        centroid-midpoint CDF interpolation otherwise."""
        from .functions.tdigest import merge_states, tdigest_rank

        specs = self.row.get("tdigest_aggs") or {}
        if not specs:
            raise ValueError(
                f"cagg {self.name!r} has no tdigest columns (pass "
                f"tdigest_aggs= to create_cagg)"
            )
        if td_col is None:
            if len(specs) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several tdigests "
                    f"{sorted(specs)}; pass td_col"
                )
            td_col = next(iter(specs))
        if td_col not in specs:
            raise KeyError(f"no tdigest column {td_col!r}")
        delta = int(specs[td_col].get("delta", 200))
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            td_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        merged = merge_states(
            d.select(*tcols, *keys_gb, "_st"),
            [*tcols, *keys_gb],
            "_st",
            delta,
            "_td",
        )
        res = tdigest_rank(
            merged, value, by=[*tcols, *keys_gb], state_col="_td", out=out
        )
        if grain_all:
            return res
        return res.withColumnRenamed("_tgt", bucket)

    # --------------------------- hierarchical state merges (rollup_of)
    def _rollup_frame(self, raw: DataFrame, src: str):
        """(child-bucket, group…, _src, _st) over the PARENT cagg's
        stored states — the input of every hierarchical merge. ``_src``
        is the parent bucket in internal µs (the ordering key; parent
        buckets partition time disjointly). NULL parent states are KEPT
        and masked downstream so an all-NULL child group still gets a
        row with a NULL state (strict semantics, like the raw
        builders)."""
        balias = self.row["bucket_alias"]
        gb = list(self.row["group_by"])
        return (
            raw.select(
                self._bucket_expr(raw),
                *gb,
                self._raw_time_us(raw).alias("_src"),
                F.col(src).alias("_st"),
            ),
            balias,
            gb,
        )

    def _merge_counter_states(
        self, raw: DataFrame, col: str, src: str
    ) -> DataFrame:
        """Child counter state = ordered merge of the parent's states:
        each adjacent non-null pair contributes ONE reset-adjusted
        boundary step (the :meth:`counter_at_grain` math, emitted as a
        STATE struct so the child can itself be rolled up / served at
        any grain)."""
        from pyspark.sql import Window

        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        w = Window.partitionBy(balias, *gb).orderBy(F.col("_src").asc())
        wp = w.rowsBetween(Window.unboundedPreceding, -1)
        prev_last = F.last(
            F.when(st.isNotNull(), st["last_val"]), ignorenulls=True
        ).over(wp)
        bstep = st["first_val"] - prev_last
        binc = (
            F.when(st.isNull(), F.lit(None).cast("double"))
            .when(prev_last.isNull(), F.lit(0.0))
            .when(bstep < 0, st["first_val"])
            .otherwise(bstep)
        )
        d = d.select(
            balias,
            *gb,
            "_st",
            binc.alias("_binc"),
            F.when(st.isNotNull(), (bstep < 0).cast("int")).alias(
                "_breset"
            ),
            F.when(
                st.isNotNull() & prev_last.isNotNull(),
                (st["first_val"] != prev_last).cast("int"),
            ).alias("_bchange"),
            F.when(st.isNotNull(), F.col("_src")).alias("_k"),
        )
        flat = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first_us"),
            F.max(st["last_us"]).alias("_f_last_us"),
            F.min_by(st["first_val"], F.col("_k")).alias("_f_first_val"),
            F.max_by(st["last_val"], F.col("_k")).alias("_f_last_val"),
            (
                F.sum(st["delta"])
                + F.coalesce(F.sum("_binc"), F.lit(0.0))
            ).alias("_f_delta"),
            (
                F.sum(st["num_resets"])
                + F.coalesce(F.sum("_breset"), F.lit(0))
            ).alias("_f_resets"),
            (
                (
                    F.sum(st["num_changes"])
                    + F.coalesce(F.sum("_bchange"), F.lit(0))
                )
                if _struct_has_field(d, "_st", "num_changes")
                else F.lit(None).cast("long")
            ).alias("_f_changes"),
        )
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_first_us").alias("first_us"),
                    F.col("_f_last_us").alias("last_us"),
                    F.col("_f_first_val").alias("first_val"),
                    F.col("_f_last_val").alias("last_val"),
                    F.col("_f_delta").alias("delta"),
                    F.col("_f_resets").alias("num_resets"),
                    F.col("_f_changes").alias("num_changes"),
                ),
            ).alias(col),
        )

    def _merge_gauge_states(
        self, raw: DataFrame, col: str, src: str
    ) -> DataFrame:
        """Child gauge state: bookends merge by earliest/latest parent;
        the merged last step falls back to the boundary step into the
        last parent when that parent holds a single sample — exactly
        :meth:`gauge_at_grain`'s candidates, stored as a state."""
        from pyspark.sql import Window

        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        w = Window.partitionBy(balias, *gb).orderBy(F.col("_src").asc())
        wp = w.rowsBetween(Window.unboundedPreceding, -1)
        prev_last_val = F.last(
            F.when(st.isNotNull(), st["last_val"]), ignorenulls=True
        ).over(wp)
        prev_last_us = F.last(
            F.when(st.isNotNull(), st["last_us"]), ignorenulls=True
        ).over(wp)
        cand_step = F.coalesce(
            st["last_step"], st["first_val"] - prev_last_val
        )
        cand_prev = F.coalesce(st["last_prev_us"], prev_last_us)
        has_changes = _struct_has_field(d, "_st", "num_changes")
        d = d.select(
            balias,
            *gb,
            "_st",
            cand_step.alias("_cs"),
            cand_prev.alias("_cp"),
            F.when(
                st.isNotNull() & prev_last_val.isNotNull(),
                (st["first_val"] != prev_last_val).cast("int"),
            ).alias("_bchange"),
            F.when(st.isNotNull(), F.col("_src")).alias("_k"),
        )
        flat = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first_us"),
            F.max(st["last_us"]).alias("_f_last_us"),
            F.min_by(st["first_val"], F.col("_k")).alias("_f_first_val"),
            F.max_by(st["last_val"], F.col("_k")).alias("_f_last_val"),
            F.max_by(F.col("_cs"), F.col("_k")).alias("_f_last_step"),
            F.max_by(F.col("_cp"), F.col("_k")).alias("_f_last_prev"),
            (
                (
                    F.sum(st["num_changes"])
                    + F.coalesce(F.sum("_bchange"), F.lit(0))
                )
                if has_changes
                else F.lit(None).cast("long")
            ).alias("_f_changes"),
        )
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_first_us").alias("first_us"),
                    F.col("_f_last_us").alias("last_us"),
                    F.col("_f_first_val").alias("first_val"),
                    F.col("_f_last_val").alias("last_val"),
                    F.col("_f_last_step").alias("last_step"),
                    F.col("_f_last_prev").alias("last_prev_us"),
                    F.col("_f_changes").alias("num_changes"),
                ),
            ).alias(col),
        )

    def _merge_stats_states(
        self, raw: DataFrame, col: str, src: str, two_d: bool = False
    ) -> DataFrame:
        """Child stats state: fieldwise add/min/max — moments merge
        commutatively (the classical parallel decomposition). 2-D
        comoments merge by the same fieldwise sums."""
        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        if two_d:
            flat = d.groupBy(balias, *gb).agg(
                F.count("_st").alias("_f_nn"),
                F.sum(st["n"]).alias("_f_n"),
                F.sum(st["sx"]).alias("_f_sx"),
                F.sum(st["sy"]).alias("_f_sy"),
                F.sum(st["sxx"]).alias("_f_sxx"),
                F.sum(st["syy"]).alias("_f_syy"),
                F.sum(st["sxy"]).alias("_f_sxy"),
            )
            return flat.select(
                balias,
                *gb,
                F.when(
                    F.col("_f_nn") > 0,
                    F.struct(
                        F.col("_f_n").alias("n"),
                        F.col("_f_sx").alias("sx"),
                        F.col("_f_sy").alias("sy"),
                        F.col("_f_sxx").alias("sxx"),
                        F.col("_f_syy").alias("syy"),
                        F.col("_f_sxy").alias("sxy"),
                    ),
                ).alias(col),
            )
        flat = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.sum(st["s"]).alias("_f_s"),
            F.sum(st["s2"]).alias("_f_s2"),
            F.min(st["mn"]).alias("_f_mn"),
            F.max(st["mx"]).alias("_f_mx"),
        )
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_s").alias("s"),
                    F.col("_f_s2").alias("s2"),
                    F.col("_f_mn").alias("mn"),
                    F.col("_f_mx").alias("mx"),
                ),
            ).alias(col),
        )

    def _merge_timeweight_states(
        self, raw: DataFrame, col: str, src: str, method: str
    ) -> DataFrame:
        """Child time-weight state: Σ parent integrals + one
        interpolated boundary segment per adjacent non-null pair (the
        :meth:`time_weighted_at_grain` merge, stored as a state)."""
        from pyspark.sql import Window

        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        w = Window.partitionBy(balias, *gb).orderBy(F.col("_src").asc())
        wp = w.rowsBetween(Window.unboundedPreceding, -1)
        prev_last_val = F.last(
            F.when(st.isNotNull(), st["last_val"]), ignorenulls=True
        ).over(wp)
        prev_last_us = F.last(
            F.when(st.isNotNull(), st["last_us"]), ignorenulls=True
        ).over(wp)
        bdt = (st["first_us"] - prev_last_us).cast("double")
        if method == "linear":
            bseg = (prev_last_val + st["first_val"]) / F.lit(2.0) * bdt
        else:
            bseg = prev_last_val * bdt
        d = d.select(
            balias,
            *gb,
            "_st",
            F.when(st.isNotNull(), F.coalesce(bseg, F.lit(0.0))).alias(
                "_bseg"
            ),
            F.when(st.isNotNull(), F.col("_src")).alias("_k"),
        )
        flat = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first_us"),
            F.max(st["last_us"]).alias("_f_last_us"),
            F.min_by(st["first_val"], F.col("_k")).alias("_f_first_val"),
            F.max_by(st["last_val"], F.col("_k")).alias("_f_last_val"),
            (
                F.sum(st["integral"])
                + F.coalesce(F.sum("_bseg"), F.lit(0.0))
            ).alias("_f_integral"),
        )
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_first_us").alias("first_us"),
                    F.col("_f_last_us").alias("last_us"),
                    F.col("_f_first_val").alias("first_val"),
                    F.col("_f_last_val").alias("last_val"),
                    F.col("_f_integral").alias("integral"),
                ),
            ).alias(col),
        )

    def _merge_candlestick_states(
        self, raw: DataFrame, col: str, src: str
    ) -> DataFrame:
        """Child OHLC state: open/close by earliest/latest parent
        sample time (unique within a child bucket — parents partition
        time), the rest fieldwise."""
        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        flat = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first_us"),
            F.max(st["last_us"]).alias("_f_last_us"),
            F.min_by(st["open"], st["first_us"]).alias("_f_open"),
            F.max(st["high"]).alias("_f_high"),
            F.min(st["low"]).alias("_f_low"),
            F.max_by(st["close"], st["last_us"]).alias("_f_close"),
            F.sum(st["volume"]).alias("_f_volume"),
            F.sum(st["pv"]).alias("_f_pv"),
        )
        return flat.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_first_us").alias("first_us"),
                    F.col("_f_last_us").alias("last_us"),
                    F.col("_f_open").alias("open"),
                    F.col("_f_high").alias("high"),
                    F.col("_f_low").alias("low"),
                    F.col("_f_close").alias("close"),
                    F.col("_f_volume").alias("volume"),
                    F.col("_f_pv").alias("pv"),
                ),
            ).alias(col),
        )

    def _merge_stateagg_states(
        self, raw: DataFrame, col: str, src: str
    ) -> DataFrame:
        """Child state-agg state: duration maps add per state, each
        boundary gap lands on the earlier parent's last state, bookends
        merge by earliest/latest parent — the
        :meth:`state_durations_at_grain` math emitted as a state."""
        from pyspark.sql import Window

        d, balias, gb = self._rollup_frame(raw, src)
        st = F.col("_st")
        w = Window.partitionBy(balias, *gb).orderBy(F.col("_src").asc())
        wp = w.rowsBetween(Window.unboundedPreceding, -1)
        prev_last_us = F.last(
            F.when(st.isNotNull(), st["last_us"]), ignorenulls=True
        ).over(wp)
        prev_last_state = F.last(
            F.when(st.isNotNull(), st["last_state"]), ignorenulls=True
        ).over(wp)
        gap = st["first_us"] - prev_last_us
        d = d.select(
            balias,
            *gb,
            "_st",
            F.when(st.isNotNull(), prev_last_state).alias("_bstate"),
            F.when(st.isNotNull() & (gap > 0), gap).alias("_bgap"),
            F.when(st.isNotNull(), F.col("_src")).alias("_k"),
        )
        per_state = d.select(
            balias,
            *gb,
            F.explode_outer(st["durations"]).alias("_s", "_dn"),
        ).select(
            balias,
            *gb,
            "_s",
            F.col("_dn")["d"].alias("_d"),
            F.col("_dn")["n"].alias("_n"),
        )
        bnd = d.filter(
            F.col("_bstate").isNotNull() & F.col("_bgap").isNotNull()
        ).select(
            balias,
            *gb,
            F.col("_bstate").alias("_s"),
            F.col("_bgap").alias("_d"),
            F.lit(0).cast("long").alias("_n"),
        )
        merged = (
            per_state.unionByName(bnd)
            .groupBy(balias, *gb, "_s")
            .agg(F.sum("_d").alias("_d"), F.sum("_n").alias("_n"))
        )
        ent = F.when(
            F.col("_s").isNotNull(),
            F.struct(
                F.col("_s"),
                F.struct(
                    F.col("_d").alias("d"), F.col("_n").alias("n")
                ).alias("dn"),
            ),
        )
        maps = merged.groupBy(balias, *gb).agg(
            F.collect_list(ent).alias("_f_ents"),
        )
        books = d.groupBy(balias, *gb).agg(
            F.count("_st").alias("_f_nn"),
            F.sum(st["n"]).alias("_f_n"),
            F.min(st["first_us"]).alias("_f_first_us"),
            F.max(st["last_us"]).alias("_f_last_us"),
            F.min_by(st["first_state"], F.col("_k")).alias(
                "_f_first_state"
            ),
            F.max_by(st["last_state"], F.col("_k")).alias(
                "_f_last_state"
            ),
        )
        l, r = books.alias("_ml"), maps.alias("_mr")
        cond = None
        for k in [balias, *gb]:
            c = F.col(f"_ml.{k}").eqNullSafe(F.col(f"_mr.{k}"))
            cond = c if cond is None else cond & c
        joined = l.join(r, cond).select("_ml.*", F.col("_mr._f_ents"))
        return joined.select(
            balias,
            *gb,
            F.when(
                F.col("_f_nn") > 0,
                F.struct(
                    F.col("_f_n").alias("n"),
                    F.col("_f_first_us").alias("first_us"),
                    F.col("_f_last_us").alias("last_us"),
                    F.col("_f_first_state").alias("first_state"),
                    F.col("_f_last_state").alias("last_state"),
                    F.map_from_entries(
                        F.array_sort(F.col("_f_ents"))
                    ).alias("durations"),
                ),
            ).alias(col),
        )

    def _require_full_group_by(self, group_by, kind: str) -> None:
        """Counter/gauge partials are only mergeable WITHIN one series:
        regrouping on a subset of the cagg's group columns would merge
        partials from different series into one ordered-by-``_src``
        window, making the boundary-step/lag math nondeterministic
        (several partials share each parent bucket) and semantically
        wrong. Sketch/stats/HLL partials are commutative states, so
        their accessors keep free regrouping."""
        if group_by is None:
            return
        missing = [c for c in self.row["group_by"] if c not in set(group_by)]
        if missing:
            raise ValueError(
                f"{kind}_at_grain(group_by=...) must include every "
                f"group column of cagg {self.name!r} (missing "
                f"{missing}): {kind} partials are only mergeable "
                f"within a single series"
            )

    def _partial_frame(
        self,
        kind: str,
        col: Optional[str],
        grain,
        group_by,
        realtime,
        start,
        end,
    ):
        """Shared serving scaffold for the partial-state accessors:
        resolve the partial column, apply bucket-aligned bounds,
        compute the target bucket, and return
        ``(frame(_tgt, group…, _src, _st), group_cols, bucket_alias,
        grain_is_all)``."""
        d = self.row.get(kind) or {}
        if not d:
            raise ValueError(
                f"cagg {self.name!r} has no {kind} columns (pass "
                f"{kind}= to create_cagg)"
            )
        if col is None:
            if len(d) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several {kind} "
                    f"{sorted(d)}; pass the column name"
                )
            col = next(iter(d))
        if col not in d:
            raise KeyError(f"no {kind} column {col!r}")
        return self._partial_frame_for_col(
            col, grain, group_by, realtime, start, end
        )

    def distinct_at_grain(
        self,
        hll_col: str,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
        out: str = "approx_distinct",
    ) -> DataFrame:
        """Serve approximate distinct counts at any coarser grain from a
        stored HLL column (an ``aggs`` entry built with
        ``hll_sketch_agg(col)``) — the toolkit
        ``distinct_count(rollup(hll(...)))`` idiom via Spark's native
        ``hll_union_agg`` + ``hll_sketch_estimate``. Same grain /
        bounds / realtime rules as the other partial accessors."""
        if hll_col not in (self.row.get("aggs") or {}):
            raise KeyError(
                f"{hll_col!r} is not an aggs column of cagg {self.name!r}"
            )
        # reuse the shared scaffold by treating the HLL aggs column as
        # the partial payload
        d, keys_gb, bucket, grain_all = self._partial_frame_for_col(
            hll_col, grain, group_by, realtime, start, end
        )
        tcols = [] if grain_all else ["_tgt"]
        out_df = d.groupBy(*tcols, *keys_gb).agg(
            F.expr("hll_sketch_estimate(hll_union_agg(_st))").alias(out)
        )
        if grain_all:
            return out_df
        return out_df.withColumnRenamed("_tgt", bucket)

    def _partial_frame_for_col(
        self, col: str, grain, group_by, realtime, start, end
    ):
        """:meth:`_partial_frame` body for an explicit column name (no
        kind-dict resolution)."""
        from .functions.time import time_bucket

        bucket = self.row["bucket_alias"]
        gb = list(self.row["group_by"] if group_by is None else group_by)
        df = self.read(realtime=realtime, only_cols=[col])
        if start is not None or end is not None:
            bc = F.col(bucket)
            if self.row["time_is_timestamp"]:
                conv = lambda x: F.lit(x).cast("timestamp")  # noqa: E731
            else:
                conv = lambda x: F.lit(int(x))  # noqa: E731
            if start is not None:
                df = df.filter(bc >= conv(start))
            if end is not None:
                df = df.filter(bc < conv(end))
        # strict rollup semantics: a NULL state (a group whose partial
        # inputs were all NULL) is skipped at merge time, like the
        # toolkit's strict rollup() aggregate. Filter AFTER the rename
        # select — a filter on the raw state column between the mat
        # read and the select trips Spark 4.1.2's RemoveRedundantAliases
        # into an unresolved plan (same bug family as d42cb25).
        if grain == "all":
            # no constant target column: a literal group/partition key
            # trips Catalyst's RemoveRedundantAliases into an unresolved
            # plan (observed on the gauge accessor) and adds nothing
            return (
                df.select(
                    *gb,
                    F.col(bucket).alias("_src"),
                    F.col(col).alias("_st"),
                ).filter(F.col("_st").isNotNull()),
                gb,
                bucket,
                True,
            )
        if grain is not None:
            if not self.row["time_is_timestamp"]:
                from .functions.time import time_bucket_int

                tgt = time_bucket_int(int(grain), bucket)
            else:
                tgt = time_bucket(grain, bucket)
        else:
            tgt = F.col(bucket)
        return (
            df.select(
                tgt.alias("_tgt"),
                *gb,
                F.col(bucket).alias("_src"),
                F.col(col).alias("_st"),
            ).filter(F.col("_st").isNotNull()),
            gb,
            bucket,
            False,
        )

    def set_materialized_only(self, flag: bool) -> None:
        """``ALTER MATERIALIZED VIEW .. SET (timescaledb.materialized_only
        = ..)`` (tsl/src/continuous_aggs/options.c): toggles whether the
        user view unions the realtime tail above the watermark."""
        self.ts.catalog.continuous_agg.update(
            {"name": self.name}, {"materialized_only": bool(flag)}
        )
        self.row["materialized_only"] = bool(flag)

    def watermark(self) -> Optional[int]:
        """``cagg_watermark`` (sql/util_time.sql:52): end of the last
        materialized bucket, int64 internal."""
        row = self.ts.catalog.cagg_watermark.find_one(cagg_id=self.id)
        return None if row is None or row["watermark"] is None else int(row["watermark"])

    # ------------------------------------------------------------ refresh
    def refresh(
        self,
        start: Union[int, str, datetime, None] = None,
        end: Union[int, str, datetime, None] = None,
        verbose: bool = False,
        force: bool = False,
        buckets_per_batch: int = 0,
        max_batches: int = 0,
        refresh_newest_first: bool = False,
    ) -> list[tuple[int, int]]:
        """``refresh_continuous_aggregate(cagg, start, end[, force,
        options])`` (``tsl/src/continuous_aggs/refresh.c:735``).

        ``force`` re-materializes the whole requested window even when
        the invalidation log shows nothing dirty (reference 2.18 —
        rebuilds after out-of-band changes).

        Incremental refresh (``continuous_agg_refresh_batched``,
        refresh.c:628; the 2.18 options JSONB / policy columns):
        ``buckets_per_batch`` splits each dirty range into
        bucket-aligned batches materialized as separate jobs (0 =
        single atomic pass); ``max_batches`` bounds the batches per
        call, pushing the remainder BACK into the invalidation log so
        the next call continues where this one stopped (the policy's
        bounded-work contract); ``refresh_newest_first`` processes
        batches newest-first so fresh data serves before the backfill
        finishes. Infinite-sentinel range ends stay unsplit (they cost
        nothing to materialize beyond the data they cover) — batching
        splits the data-covered middle.

        Returns the ranges actually materialized (internal units,
        half-open)."""
        cat = self.ts.catalog
        src = self._source()

        lo = _to_internal(start)
        hi = _to_internal(end)
        open_end = hi is None
        if lo is None:
            lo = INT64_MIN
        if hi is None:
            # refresh everything seen so far — up to the LAST ROW, not
            # the last chunk boundary: the watermark becomes the ceil of
            # this value, and overshooting to the chunk's range_end
            # (days past the data) would make realtime reads hide every
            # later insert below it until the next refresh. One max()
            # over the newest chunk only (reference: watermark tracks
            # materialized buckets, tsl/src/continuous_aggs/refresh.c).
            chunks = src.chunks()
            if not chunks:
                hi = 0
            else:
                newest = chunks[-1]
                nframe = src.read(start=newest["range_start"])
                mxrow = nframe.agg(
                    F.max(src._internal_time_expr(nframe)).alias("mx")
                ).collect()[0]
                hi = (
                    int(mxrow["mx"]) + 1
                    if mxrow["mx"] is not None
                    else newest["range_start"]
                )
        win_s = self._floor_us(lo)
        if open_end:
            # open-ended refresh covers the (possibly partial) bucket
            # holding the latest data: ceil to the bucket end, so e.g. a
            # month bucket mid-month still materializes (later inserts
            # into it re-dirty it through the invalidation log)
            f = self._floor_us(hi)
            win_e = f if f == hi else self._next_us(f)
        else:
            # explicit window: inscribed (floor) — only complete buckets,
            # like the reference's bucketed refresh window
            win_e = self._floor_us(hi)
        if win_e <= win_s:
            return []

        # txn 1 + txn 2a/2b are compound catalog read-modify-writes; the
        # write_lock serializes them against concurrent inserts'
        # _capture_invalidation (the analog of the reference's threshold
        # row lock — without it, an entry appended between 2a's find and
        # delete would be silently dropped). Data jobs (the materialize
        # pass below) run OUTSIDE the lock.
        with cat.write_lock:
            # ---- txn 1: move invalidation threshold
            # (invalidation_threshold.c)
            thr_row = cat.invalidation_threshold.find_one(hypertable_id=src.id)
            old_thr = int(thr_row["watermark"]) if thr_row else INT64_MIN
            if win_e > old_thr:
                if thr_row:
                    cat.invalidation_threshold.update(
                        {"hypertable_id": src.id}, {"watermark": win_e}
                    )
                else:
                    cat.invalidation_threshold.append(
                        [{"hypertable_id": src.id, "watermark": win_e}]
                    )

            # ---- txn 2a: process hypertable log → ALL caggs' mat logs
            # (invalidation_process_hypertable_log)
            ht_entries = cat.hypertable_invalidation_log.find(
                hypertable_id=src.id
            )
            if ht_entries:
                for cagg in cat.continuous_agg.find(hypertable_id=src.id):
                    cat.materialization_invalidation_log.append(
                        [
                            {
                                "cagg_id": cagg["id"],
                                "lowest_modified_value": e[
                                    "lowest_modified_value"
                                ],
                                "greatest_modified_value": e[
                                    "greatest_modified_value"
                                ],
                            }
                            for e in ht_entries
                        ]
                    )
                cat.hypertable_invalidation_log.delete(
                    {"hypertable_id": src.id}
                )

            # ---- txn 2b: cut this cagg's mat log against the window
            # (invalidation.c range algebra; entries are INCLUSIVE bounds)
            entries = cat.materialization_invalidation_log.find(cagg_id=self.id)
            dirty: list[tuple[int, int]] = []
            leftovers: list[dict] = []
            for e in entries:
                a, b = int(e["lowest_modified_value"]), int(
                    e["greatest_modified_value"]
                )
                if b < win_s or a >= win_e:
                    leftovers.append(e)
                    continue
                # overlap, bucket-aligned and clipped to the window
                oa = max(self._floor_us(max(a, win_s)), win_s)
                ob_incl = min(b, win_e - 1)
                ob = min(self._next_us(self._floor_us(ob_incl)), win_e)
                dirty.append((oa, ob))
                # leftover fragments outside the window survive
                if a < win_s:
                    leftovers.append(
                        {
                            "cagg_id": self.id,
                            "lowest_modified_value": a,
                            "greatest_modified_value": win_s - 1,
                        }
                    )
                if b >= win_e:
                    leftovers.append(
                        {
                            "cagg_id": self.id,
                            "lowest_modified_value": win_e,
                            "greatest_modified_value": b,
                        }
                    )
            others = [
                e
                for e in cat.materialization_invalidation_log.read()
                if e.get("cagg_id") != self.id
            ]
            cat.materialization_invalidation_log.replace(others + leftovers)

        if force:
            # the whole window is re-materialized regardless of the log
            # (overlapping log entries were already cut by txn 2b, so a
            # forced pass also clears any genuine dirt inside it)
            dirty = [(win_s, win_e)]
        # merge overlapping/adjacent dirty ranges
        dirty.sort()
        merged: list[list[int]] = []
        for a, b in dirty:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])

        d_lo = d_hi = None  # true data bounds (computed by the batching path)
        if buckets_per_batch and int(buckets_per_batch) > 0 and merged:
            # bucket-aligned batching, clamped to the data span: the
            # initial invalidation entry is (-inf, +inf) and splitting
            # from a sentinel would enumerate the whole int64 line, so
            # the infinite edges stay single batches and the middle
            # splits per k buckets (the reference's split function
            # likewise batches only window chunks that contain data)
            k = int(buckets_per_batch)
            span = int(1) << 61
            # true DATA bounds, not chunk-aligned bounds (a chunk's
            # range_start precedes its first row by up to one interval,
            # and empty lead batches would burn the max_batches budget):
            # min over the oldest chunk, max over the newest — O(2
            # chunks), the same trick the open-ended window uses above
            chunks_meta = src.chunks()
            if chunks_meta:
                oldest, newest = chunks_meta[0], chunks_meta[-1]
                of = src.read(
                    start=oldest["range_start"], end=oldest["range_end"]
                )
                mn = of.agg(
                    F.min(src._internal_time_expr(of)).alias("mn")
                ).collect()[0]["mn"]
                nf = src.read(start=newest["range_start"])
                mx = nf.agg(
                    F.max(src._internal_time_expr(nf)).alias("mx")
                ).collect()[0]["mx"]
                d_lo = int(mn) if mn is not None else None
                d_hi = int(mx) + 1 if mx is not None else None
            batches: list[list[int]] = []
            for a, b in merged:
                if (a < -span and d_lo is None) or (b > span and d_hi is None):
                    # an infinite sentinel edge with NO data bound to
                    # clamp to (empty hypertable, or an all-NULL boundary
                    # chunk): lo_c/hi_c would stay at the sentinel and
                    # the per-bucket loop below would enumerate the whole
                    # int64 line — keep the range as a single batch, the
                    # same treatment sentinel edges get when bounds exist
                    batches.append([a, b])
                    continue
                lo_c = a
                hi_c = b
                if d_lo is not None and a < -span:
                    lo_c = min(self._floor_us(d_lo), b)
                if d_hi is not None and b > span:
                    hi_c = max(min(self._next_us(self._floor_us(d_hi)), b), lo_c)
                if a < lo_c:
                    batches.append([a, lo_c])
                cur = lo_c
                while cur < hi_c:
                    nxt = cur
                    for _ in range(k):
                        nxt = self._next_us(nxt)
                        if nxt >= hi_c:
                            break
                    nxt = min(nxt, hi_c)
                    if nxt <= cur:
                        break
                    batches.append([cur, nxt])
                    cur = nxt
                if hi_c < b:
                    batches.append([hi_c, b])
            merged = batches
        if refresh_newest_first:
            merged = list(reversed(merged))
        deferred: list[list[int]] = []
        if max_batches and int(max_batches) > 0 and len(merged) > int(
            max_batches
        ):
            deferred = merged[int(max_batches):]
            merged = merged[: int(max_batches)]
        if deferred:
            # bounded-work contract: the remainder goes BACK into the
            # log so the next call picks it up (same shape as the
            # failed-materialization redo path below)
            with cat.write_lock:
                cat.materialization_invalidation_log.append(
                    [
                        {
                            "cagg_id": self.id,
                            "lowest_modified_value": a,
                            "greatest_modified_value": (
                                (b - 1) if b < INT64_MAX else b
                            ),
                        }
                        for a, b in deferred
                    ]
                )

        # ---- materialize each dirty range (materialize.c:442-489).
        # The dirty entries were already cut from the log (txn 2b) — on a
        # FAILED materialization the unprocessed ranges must be put back,
        # or the hole is permanent: a retry would find no dirty entries
        # and the watermark would advance over never-materialized buckets.
        mat = self._mat()
        done_n = 0
        try:
            for a, b in merged:
                # infinite sentinels become open bounds (no filter): they
                # are not representable as timestamps
                raw = src.read(
                    start=a if a > INT64_MIN else None,
                    end=b if b < INT64_MAX else None,
                )
                agg = self._aggregate(raw)
                mat_rows = agg
                if verbose:
                    print(f"refresh {self.name}: range [{a}, {b}) ")
                # DELETE + INSERT per range, chunk-local
                if mat.row.get("schema_ddl"):
                    mat.delete_range(
                        a if a > INT64_MIN else None,
                        b if b < INT64_MAX else None,
                    )
                mat.insert(mat_rows, cluster=True)
                done_n += 1
        except BaseException:
            redo = [
                {
                    "cagg_id": self.id,
                    "lowest_modified_value": a,
                    # log bounds are INCLUSIVE; merged ranges half-open
                    "greatest_modified_value": (b - 1) if b < INT64_MAX else b,
                }
                for a, b in merged[done_n:]
            ]
            with cat.write_lock:
                cat.materialization_invalidation_log.append(redo)
            raise

        # ---- advance watermark (continuous_aggs_watermark.c). The
        # watermark must never pass a DEFERRED (never-materialized)
        # batch: realtime reads serve mat-table rows below it and raw
        # rows at/above it, so a watermark above a hole would silently
        # drop those buckets until the next refresh. The reference
        # derives it from the max bucket actually materialized
        # (tsl/src/continuous_aggs/materialize.c:762) — cap at the
        # lowest deferred range start (deferral order is irrelevant:
        # with refresh_newest_first the deferred ranges are the oldest,
        # and the raw side above the capped watermark still serves the
        # newer, already-materialized buckets correctly).
        wm_cap = win_e
        if deferred:
            # provably data-free deferred ranges (entirely below the
            # oldest row's bucket) can't hide anything from a realtime
            # read — only real deferred coverage caps the watermark. An
            # -inf-edged deferred range with no data bound known keeps
            # the sentinel cap (nothing below is servable from mat).
            d_lo_floor = self._floor_us(d_lo) if d_lo is not None else None
            for a, b in deferred:
                if d_lo_floor is not None and b <= d_lo_floor:
                    continue
                if a <= INT64_MIN and d_lo_floor is not None:
                    a = d_lo_floor
                wm_cap = min(wm_cap, a)
        wm = self.watermark()
        new_wm = max(wm if wm is not None else INT64_MIN, wm_cap)
        if new_wm > INT64_MIN:
            # a sentinel watermark claims nothing and is not a valid
            # timestamp — leave the row untouched (realtime reads with
            # no watermark serve everything from the raw side)
            cat.cagg_watermark.update(
                {"cagg_id": self.id}, {"watermark": new_wm}
            )
        return [(a, b) for a, b in merged]

    # --------------------------------------------------------------- read
    def read(
        self,
        realtime: Optional[bool] = None,
        only_cols: Optional[Sequence[str]] = None,
    ) -> DataFrame:
        """User-view read. Realtime = materialized below the watermark,
        raw aggregation at/after it (``common.c:1745 build_union_query``).

        ``only_cols`` restricts the projection to the named value
        columns (keys always included) AND — the part Catalyst cannot
        do itself — restricts the realtime raw-side partial build to
        just those families: the full ``_aggregate`` is a 1:1 join
        chain of every family's partial aggregate, and joins survive
        column pruning, so without this a single-family serve over an
        N-family cagg pays N partial builds on the tail. Serving
        accessors pass their one column; ``None`` keeps the full view.
        Columns computed by ``window_fns`` may depend on arbitrary
        sibling aggregates, so requesting one falls back to the full
        aggregate (still projected afterwards)."""
        if realtime is None:
            realtime = not self.row.get("materialized_only", False)
        mat = self._mat()
        wm = self.watermark()
        bucket = self.row["bucket_alias"]
        has_mat = mat.row.get("schema_ddl") is not None
        keys = [bucket, *self.row["group_by"]]
        build_cols = only_cols
        if only_cols is not None and any(
            c in (self.row.get("window_fns") or {}) for c in only_cols
        ):
            build_cols = None  # window col needs its sibling aggregates
        proj = (
            None
            if only_cols is None
            else [*keys, *[c for c in only_cols if c not in keys]]
        )
        if not realtime:
            if not has_mat:
                raise ValueError(f"cagg {self.name!r} never refreshed")
            out = mat.read()
            return out if proj is None else out.select(*proj)

        src = self._source()
        wm_i = wm if wm is not None else INT64_MIN
        raw = src.read(start=wm_i if wm is not None else None)
        raw_agg = self._aggregate(raw, only_cols=build_cols)
        if proj is not None:
            raw_agg = raw_agg.select(*proj)
        if not has_mat:
            return raw_agg
        if self.row["time_is_timestamp"]:
            wm_lit = F.timestamp_micros(F.lit(wm_i))
        else:
            wm_lit = F.lit(wm_i)
        # chunk-prune the mat side by the watermark too (normally a
        # no-op — materialization stops at the watermark — but after a
        # watermark rollback or retention on the raw table it excludes
        # whole mat chunks); the row filter stays for the boundary chunk
        mat_side = mat.read(end=wm_i).filter(F.col(bucket) < wm_lit)
        if proj is not None:
            mat_side = mat_side.select(*proj)
        raw_side = raw_agg.filter(F.col(bucket) >= wm_lit)
        return mat_side.unionByName(raw_side)

    # ------------------------------------------------- sketch accessors
    def quantiles(
        self,
        qs: Sequence[float],
        sketch_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Serve quantiles from the stored DDSketch states — the toolkit
        ``approx_percentile(q, rollup(percentile_agg))`` idiom: merge
        the per-bucket states to ``grain`` (any coarser bucket width;
        ``None`` = the cagg's own grain, ``"all"`` = one global sketch)
        and extract estimates. Lossless merge (bucket counts add,
        Masson VLDB'19 §2.3) means a day-grain answer from hourly
        states is IDENTICAL to a sketch built from raw rows — the
        property the oracle gate checks. Never rescans raw data below
        the watermark; above it the realtime union computes raw-side
        states over the un-materialized tail only.

        Output: ``(bucket?, group_by…, n, p50, p95, …)`` with the same
        naming/rounding as :func:`functions.ddsketch.ddsketch_quantiles`.
        """
        from .functions.ddsketch import ddsketch_quantiles

        flat, keys, tmp, alpha = self._merged_sketch(
            sketch_col, grain, group_by, realtime, start, end
        )
        out = ddsketch_quantiles(flat, list(qs), by=tmp, alpha=alpha)
        for k, t in zip(keys, tmp):
            out = out.withColumnRenamed(t, k)
        return out

    def rank(
        self,
        value: float,
        sketch_col: Optional[str] = None,
        grain: Optional[str] = None,
        group_by: Optional[Sequence[str]] = None,
        realtime: Optional[bool] = None,
        out: str = "rank",
        start=None,
        end=None,
    ) -> DataFrame:
        """``approx_percentile_rank(value, rollup(...))`` — the inverse
        accessor: fraction of ingested values ≤ ``value`` per
        bucket/group, served from the stored states under the same
        merge/grain/realtime rules as :meth:`quantiles`."""
        from .functions.ddsketch import ddsketch_rank

        flat, keys, tmp, alpha = self._merged_sketch(
            sketch_col, grain, group_by, realtime, start, end
        )
        res = ddsketch_rank(flat, value, by=tmp, alpha=alpha, out=out)
        for k, t in zip(keys, tmp):
            res = res.withColumnRenamed(t, k)
        return res

    def _merged_sketch(
        self,
        sketch_col: Optional[str],
        grain: Optional[str],
        group_by: Optional[Sequence[str]],
        realtime: Optional[bool],
        start=None,
        end=None,
    ):
        """Shared state-merge for the sketch accessors: resolve the
        sketch column, re-bucket to ``grain``, explode states →
        (keys, sketch-bucket, cnt) and sum — output is keys × ~2k
        bucket rows, never raw-sized. Keys are renamed internally: the
        sketch frame contract reserves "bucket"/"cnt", and the cagg's
        own bucket_alias defaults to "bucket" too."""
        from .functions.time import time_bucket

        sketches = self.row.get("sketches") or {}
        if not sketches:
            raise ValueError(
                f"cagg {self.name!r} has no sketch columns (pass "
                f"sketches= to create_cagg)"
            )
        if sketch_col is None:
            if len(sketches) > 1:
                raise ValueError(
                    f"cagg {self.name!r} has several sketches "
                    f"{sorted(sketches)}; pass sketch_col"
                )
            sketch_col = next(iter(sketches))
        if sketch_col not in sketches:
            raise KeyError(f"no sketch column {sketch_col!r}")
        alpha = float(sketches[sketch_col].get("alpha", 0.01))
        bucket = self.row["bucket_alias"]
        gb = list(self.row["group_by"] if group_by is None else group_by)

        df = self.read(realtime=realtime, only_cols=[sketch_col])
        # serving bounds ("p95 of the last 7 days"): filter whole parent
        # buckets BEFORE the merge — [start, end) on the bucket column,
        # so the window is bucket-aligned like the reference's cagg
        # range semantics
        if start is not None or end is not None:
            bc = F.col(bucket)
            if self.row["time_is_timestamp"]:
                conv = lambda v: F.lit(v).cast("timestamp")  # noqa: E731
            else:
                conv = lambda v: F.lit(int(v))  # noqa: E731
            if start is not None:
                df = df.filter(bc >= conv(start))
            if end is not None:
                df = df.filter(bc < conv(end))
        if grain == "all":
            keys = gb
        elif grain is not None:
            if not self.row["time_is_timestamp"]:
                from .functions.time import time_bucket_int

                df = df.withColumn(
                    bucket, time_bucket_int(int(grain), bucket)
                )
            else:
                df = df.withColumn(bucket, time_bucket(grain, bucket))
            keys = [bucket, *gb]
        else:
            keys = [bucket, *gb]
        tmp = [f"_qk{i}" for i in range(len(keys))]
        flat = df.select(
            *[F.col(k).alias(t) for k, t in zip(keys, tmp)],
            F.explode(F.col(sketch_col)).alias("bucket", "cnt"),
        ).groupBy(*tmp, "bucket").agg(F.sum("cnt").alias("cnt"))
        return flat, keys, tmp, alpha

    def drop(self, keep_jobs: bool = False) -> None:
        """``DROP MATERIALIZED VIEW`` teardown. Refuses while a
        hierarchical cagg is built on this one (PG RESTRICT — a child
        would be left with a dangling source); removes every catalog
        row referencing the cagg, including its refresh-policy jobs
        (an orphaned job would KeyError on every scheduler tick
        forever), and routes the mat hypertable through the full
        Hypertable.drop teardown (dimensions, stats, jobs, dirs).
        ``keep_jobs`` is for the migrate swap (cagg.alter), where the
        name-referencing policy must survive and point at the new
        definition."""
        cat = self.ts.catalog
        mat = self._mat()
        children = cat.continuous_agg.find(hypertable_name=self.row["mat_table"])
        if children:
            names = sorted(c["name"] for c in children)
            raise ValueError(
                f"cannot drop cagg {self.name!r}: hierarchical caggs "
                f"{names} are built on it"
            )
        if not keep_jobs:
            for job in cat.bgw_job.read():
                cfg = job.get("config") or {}
                if cfg.get("cagg") == self.name or cfg.get("hypertable") == (
                    self.row["mat_table"]
                ):
                    cat.bgw_job.delete({"id": job["id"]})
        cat.continuous_agg.delete({"id": self.id})
        cat.cagg_watermark.delete({"cagg_id": self.id})
        cat.materialization_invalidation_log.delete({"cagg_id": self.id})
        mat.drop()

    # ------------------------------------------------------------- migrate
    def alter(
        self,
        aggs: Optional[dict[str, str]] = None,
        group_by: Optional[Sequence[str]] = None,
        bucket_width: Union[str, int, None] = None,
        where: Optional[str] = None,
        refresh: bool = True,
    ) -> "ContinuousAggregate":
        """Redefine this continuous aggregate in place — the
        ``cagg_migrate`` analog (``@extschema@.cagg_migrate``; plan
        steps in the reference's ``_timescaledb_internal.cagg_migrate_
        execute_plan``: create new cagg → copy/recompute data → swap →
        drop old). Without this, redefinition means drop + recreate and
        every reader/policy pointing at the name breaks mid-window.

        Any parameter left ``None`` keeps the current definition. The
        new definition is materialized into a SHADOW cagg, backfilled
        over the full source range (aggregates changed ⇒ recompute, not
        copy), then swapped under the original name in one catalog
        transaction (``write_lock``): readers and refresh policies —
        which reference caggs by name — never observe a half-migrated
        state. The old materialization is dropped after the swap.

        Refuses when dependent (hierarchical) caggs are defined on this
        cagg's materialization, like the reference's pre-validation
        (``cagg_migrate_pre_validation``).
        """
        from .functions.time import Interval

        cat = self.ts.catalog
        deps = [
            c["name"]
            for c in cat.continuous_agg.read()
            if c.get("hypertable_name") == self.row["mat_table"]
        ]
        if deps:
            raise ValueError(
                f"cannot migrate {self.name!r}: dependent continuous "
                f"aggregates {deps} are defined on it (drop or migrate "
                f"them first, cagg_migrate_pre_validation)"
            )
        if bucket_width is None:
            months = int(self.row.get("bucket_width_months") or 0)
            bucket_width = (
                Interval(months=months) if months else Interval(us=self.width)
            )
        shadow_name = f"_migrate_{self.name}"
        if cat.continuous_agg.find_one(name=shadow_name):
            ContinuousAggregate.get(self.ts, shadow_name).drop()
        new = ContinuousAggregate.create(
            self.ts,
            shadow_name,
            self.row["hypertable_name"],
            bucket_width=bucket_width,
            aggs=dict(aggs if aggs is not None else self.row["aggs"]),
            group_by=list(
                group_by if group_by is not None else self.row["group_by"]
            ),
            time_column=self.row["time_column"],
            bucket_alias=self.row["bucket_alias"],
            materialized_only=self.row.get("materialized_only", False),
            where=where if where is not None else self.row.get("where"),
            join=self.row.get("join"),
            window_fns=self.row.get("window_fns"),
            enable_window_functions=bool(self.row.get("window_fns")),
            sketches=self.row.get("sketches"),
            counters=self.row.get("counters"),
            gauges=self.row.get("gauges"),
            stats_aggs=self.row.get("stats_aggs"),
            time_weights=self.row.get("time_weights"),
            candlesticks=self.row.get("candlesticks"),
            state_aggs=self.row.get("state_aggs"),
        )
        if refresh:
            new.refresh()
        old_name, old_mat = self.name, self.row["mat_table"]
        new_mat_tmp = new.row["mat_table"]
        final_mat = f"_mat_{old_name}"
        # LOCK ORDER: ht_lock before write_lock, always (catalog.py
        # contract) — self.drop() takes the mat table's DML lock, so
        # taking write_lock first would deadlock against any DML holding
        # ht_lock and waiting on write_lock (e.g. a scheduled refresh's
        # delete_range). Both mat locks are taken in sorted order.
        from contextlib import ExitStack

        with ExitStack() as locks:
            for mat_name in sorted({old_mat, new_mat_tmp}):
                locks.enter_context(cat.ht_lock(mat_name))
            locks.enter_context(cat.write_lock)
            # drop the old cagg + its materialization, then adopt the
            # original name (and mat-table name) for the shadow — one
            # catalog transaction, readers resolve names only through it
            # (jobs survive: the policy must follow the name to the new
            # definition)
            self.drop(keep_jobs=True)
            if os.path.isdir(cat.data_dir(new_mat_tmp)):
                os.rename(cat.data_dir(new_mat_tmp), cat.data_dir(final_mat))
            cat.hypertable.update({"name": new_mat_tmp}, {"name": final_mat})
            cat.continuous_agg.update(
                {"id": new.id}, {"name": old_name, "mat_table": final_mat}
            )
            self.row = cat.continuous_agg.find_one(id=new.id)
        return self
