"""Inherited-relational-operator queries (SURVEY §2.7).

TimescaleDB implements none of these itself — they are PostgreSQL's —
but hypertable queries use them constantly, so the correctness gate must
cover them over the same tables (reference tests:
``tsl/test/shared/sql/decompress_join.sql``, ``test/sql/plan_hashagg.sql``,
window/grouping coverage across ``tsl/test/sql``). Every query here is
pure declarative DataFrame API → Catalyst picks broadcast joins for the
dims, partial aggregation, and pushes filters to the scans.

Determinism conventions: top-N selections and window frames use
composite tie-break keys (unique ids) so Spark and DuckDB rank
identically despite float ties; window sums/averages run in identical
frame order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .queries import query
from .sources import load_table


# ---------------------------------------------------------------------------
# joins (decompress_join / ordered_append_join parity)
# ---------------------------------------------------------------------------

@query(
    "q_tpch_q3",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact join + top-N. Customer is broadcast;
    the orderkey join shuffles once; tie-break on orderkey keeps the
    LIMIT deterministic across engines."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q6",
    """
    SELECT sum(l_extendedprice * l_discount) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — every predicate must reach the parquet
    scan (PushedFilters), the 100 TB fast path."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_semi_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      )
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS → left-semi + left-anti joins (PG inherits;
    hypertable queries rely on them, e.g. retention-audit patterns)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(
            o.filter(F.col("o_orderstatus") == "F"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .select("c_custkey", "c_name")
    )


@query(
    "q_asof_prev_click",
    """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_value
      FROM events
    )
    SELECT event_id, user_id, ts, value, prev_click_value
    FROM seq WHERE event_type = 'purchase'
    """,
)
def q_asof_prev_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase matched to the latest strictly-earlier
    click of the same user), expressed as a carried last-ignore-nulls
    window — the composition-of-builtin-ops strategy for operators Spark
    lacks natively. Single shuffle on user_id; no range-join explosion."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prev_click_value", prev)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value", "prev_click_value")
    )


@query(
    "q_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, arg_max(value, event_id) AS click_v
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, c.click_v
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General two-table as-of join (operators/asof.py): each purchase
    matched to the latest at-or-before click of the same user. Union-tag
    + carried-struct plan — one shuffle on user_id, no range join; the
    oracle is DuckDB's native ASOF LEFT JOIN. Right side deduped to one
    row per (user, ts) so tie-resolution is engine-independent."""
    from .operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_v"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(purchases, clicks, on="ts", by=["user_id"])


@query(
    "q_range_join",
    """
    SELECT p.event_id, p.user_id, p.ts, p.value, c.lo, c.hi, c.click_id
    FROM (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts AS lo, ts + INTERVAL 1 HOUR AS hi,
                 event_id AS click_id
          FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.lo AND p.ts < c.hi
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join (operators/rangejoin.py): purchases
    matched into the hour following each click of the same user. Grid
    bucketization — intervals explode into 1-hour cells, points equi-join
    on their single cell, exact containment re-checked — one hash
    shuffle, no BroadcastNestedLoopJoin. Oracle: plain inequality join."""
    from .operators import range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return range_join(
        purchases, clicks, "ts", "lo", "hi", width="1 hour", by=["user_id"]
    )


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube (plan_hashagg parity)
# ---------------------------------------------------------------------------

@query(
    "q_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           sum(o_totalprice) AS total, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_grouping_sets",
    """
    SELECT event_type, user_id % 10 AS user_mod, count(*) AS n,
           sum(value) AS sum_v
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS user_mod, count(*) AS n,
               sum(value) AS sum_v
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


# ---------------------------------------------------------------------------
# window functions (§2.7; frames + ranking)
# ---------------------------------------------------------------------------

@query(
    "q_moving_avg",
    """
    SELECT event_id, event_type, ts,
           avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
    FROM events
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-frame moving average; frame order fixed by (ts, event_id) so
    float accumulation order matches the oracle bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return ev.select(
        "event_id", "event_type", "ts", F.avg("value").over(w).alias("ma7")
    )


@query(
    "q_topn_per_group",
    """
    SELECT event_type, event_id, value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ranking window (SkipScan-adjacent pattern);
    Spark runs it with a partial top-N sort per partition, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "event_id", "value")
    )


@query(
    "q_count_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS users,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregate (skip_scan.sql's DISTINCT-agg cases): Catalyst
    plans expand + two-phase agg; exact, unlike approx_count_distinct."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q_hyperloglog",
    """
    SELECT event_type,
           CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_hyperloglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toolkit ``hyperloglog``/``approx_count_distinct`` analog
    (timescaledb-toolkit hyperloglog; ``distinct_count(hyperloglog(...))``)
    via Spark's built-in HLL++ aggregate — sketch-based, map-side
    partial, one tiny shuffle regardless of cardinality (the exact
    DISTINCT needs a full expand+shuffle of the key space). Sketches
    differ across engines, so the gate emits the ACCURACY CONTRACT: the
    exact count (oracle-checkable) plus a boolean asserting the HLL
    estimate landed within 5% — the oracle's constant TRUE makes any
    accuracy violation a hash mismatch."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("event_id").cast("long").alias("exact_distinct"),
        (
            F.abs(
                F.approx_count_distinct("event_id", rsd=0.02)
                - F.countDistinct("event_id")
            )
            <= F.countDistinct("event_id") * F.lit(0.05)
        ).alias("within_5pct"),
    )


# ---------------------------------------------------------------------------
# sliding windows (§2.8: superset of the reference's tumbling-only)
# ---------------------------------------------------------------------------

_SLIDE_US = 1_800_000_000  # 30 min
_WIN_US = 3_600_000_000  # 1 hour


@query(
    "q_sliding_window",
    f"""
    SELECT make_timestamp(
             (epoch_us(ts) - ((epoch_us(ts) - 946857600000000) % {_SLIDE_US}
                              + {_SLIDE_US}) % {_SLIDE_US}) - k.k * {_SLIDE_US}
           ) AS win_start,
           event_type, count(*) AS n, sum(value) AS sum_v
    FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each row feeds window starts
    ``time_bucket(30m, ts) - k*30m`` for k in 0..1 (hop count =
    window/slide). Same explode-then-aggregate shape Spark's
    ``window(slideDuration)`` plans, but with reference time_bucket
    origin alignment instead of epoch alignment."""
    from .functions import time_bucket

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            "value",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
            time_bucket("30 minutes", "ts").alias("_tb"),
        )
        .select(
            (
                F.timestamp_micros(
                    F.unix_micros("_tb") - F.col("k") * F.lit(_SLIDE_US)
                )
            ).alias("win_start"),
            "event_type",
            "value",
        )
        .groupBy("win_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
    )


# ---------------------------------------------------------------------------
# set operations (§2.7)
# ---------------------------------------------------------------------------

@query(
    "q_set_ops",
    """
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'view'
    )
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT: users who clicked and viewed but never bought."""
    ev = load_table(spark, sf_dir, "events")
    uid = lambda t: ev.filter(F.col("event_type") == t).select("user_id")  # noqa: E731
    return uid("click").intersect(uid("view")).subtract(uid("purchase"))


# ---------------------------------------------------------------------------
# recursive CTE (§2.7) — driver-side fixpoint (operators/recursive.py)
# ---------------------------------------------------------------------------

@query(
    "q_recursive_cte",
    """
    WITH RECURSIVE r AS (
      SELECT c_custkey AS root, c_custkey AS node, 0 AS depth
      FROM customer WHERE c_custkey >= 1 AND c_custkey < 100 AND c_custkey % 2 = 1
      UNION ALL
      SELECT r.root, c.c_custkey AS node, r.depth + 1 AS depth
      FROM r JOIN customer c ON c.c_custkey = r.node * 2
    )
    SELECT root, node, depth FROM r
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE analog: walk the node→2·node custkey chain from odd
    roots < 100 (a synthetic hierarchy over the customer table). The
    doubling step keeps recursion depth O(log n) at any scale factor —
    iteration count is the one thing a driver-side fixpoint must keep
    independent of data volume. Each iteration is a distributed broadcast
    semi-join; only emptiness probes reach the driver."""
    from .operators import recursive_union

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = cust.filter(
        (F.col("c_custkey") >= 1)
        & (F.col("c_custkey") < 100)
        & (F.col("c_custkey") % 2 == 1)
    ).select(
        F.col("c_custkey").alias("root"),
        F.col("c_custkey").alias("node"),
        F.lit(0).alias("depth"),
    )

    def step(frontier: DataFrame) -> DataFrame:
        nxt = frontier.select(
            "root", (F.col("node") * 2).alias("node"), (F.col("depth") + 1).alias("depth")
        )
        return nxt.join(
            F.broadcast(cust), nxt["node"] == cust["c_custkey"], "left_semi"
        )

    return recursive_union(base, step, union_all=True)


# ---------------------------------------------------------------------------
# TPC-H Q5: deep join tree with join reordering + two broadcast tiers
# ---------------------------------------------------------------------------

@query(
    "q_tpch_q5",
    """
    SELECT n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-table join. The region→nation→
    supplier chain collapses into one broadcast build side; customer is
    broadcast too, so the only shuffle is lineitem⋈orders on orderkey —
    at 100 TB that single fact-fact exchange is the floor for this query
    shape, and everything else stays map-side."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sn = s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                s.s_nationkey == n.n_nationkey)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (c.c_nationkey == sn.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).cast("double").alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# vectorized accumulator family (§2.4: float48_accum_single.c:22-28)
# ---------------------------------------------------------------------------

@query(
    "q_stats_accum",
    """
    SELECT event_type,
           avg(value) AS avg_v,
           stddev_samp(value) AS sd_samp,
           stddev_pop(value) AS sd_pop,
           var_samp(value) AS var_s,
           var_pop(value) AS var_p
    FROM events
    GROUP BY event_type
    """,
)
def q_stats_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's vectorized accumulator set (avg/stddev/variance in
    sample and population forms, tsl/src/nodes/vector_agg/function/
    float48_accum_single.c) — Spark computes all five from one shared
    moments buffer inside a single codegen HashAggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.avg("value").alias("avg_v"),
        F.stddev_samp("value").alias("sd_samp"),
        F.stddev_pop("value").alias("sd_pop"),
        F.var_samp("value").alias("var_s"),
        F.var_pop("value").alias("var_p"),
    )


# ---------------------------------------------------------------------------
# set-returning function analog (§2.7: generate_series/unnest → explode)
# ---------------------------------------------------------------------------

@query(
    "q_srf_unnest",
    """
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    HAVING count(*) >= 50
    """,
)
def q_srf_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-returning-function analog: explode(split()) is Spark's UNNEST.
    The explode runs inside whole-stage codegen before the aggregation —
    one scan, one shuffle on the word key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ", -1)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
    )


# ---------------------------------------------------------------------------
# JSON scalar functions (§2.7: jsonb operator inheritance)
# ---------------------------------------------------------------------------

@query(
    "q_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonb-operator inheritance (§2.7): extract a key from the events
    JSON payload, filter and aggregate on it. get_json_object evaluates
    JVM-side inside codegen; the extraction-based filter still allows the
    scan to prune every non-props column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H breadth (§2.7 inherited relational surface; schemas per TESTDATA.md)
# ---------------------------------------------------------------------------

@query(
    "q_tpch_q10",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1994-10-01'
      AND o.o_orderdate <  TIMESTAMP '1995-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): one lineitem⋈orders shuffle;
    customer and nation broadcast; exact decimal accumulation so the
    top-20 cutoff is deterministic across engines (c_custkey tiebreak)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    """
    SELECT CAST(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) /
           sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): part broadcast against the
    shipdate-pruned lineitem scan — zero fact shuffles (the global agg is
    a single-row exchange); decimal sums for cross-engine determinism."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero))
                / F.sum(rev)
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q18",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_totalprice,
           sum(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 210
    )
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): the HAVING subquery is a
    semi-join against a re-aggregation of lineitem — both sides shuffle
    on orderkey once and AQE turns the filtered key set into a broadcast;
    integer-ish quantity sums are exact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@query(
    "q_tpch_q4",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY 1
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking; EXISTS adapted to
    l_shipdate > o_orderdate since the trimmed lineitem has no
    commit/receipt dates): correlated EXISTS must plan as a left-semi
    hash join after the pushed-down orderdate range filter."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q_tpch_q12",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority counting; grouped by
    l_returnflag since the trimmed lineitem has no shipmode): the
    conditional counts fold into ONE aggregate pass over the joined
    rows — no per-branch scans."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q19",
    """
    SELECT sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 45
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunction of brand/size/
    quantity bands): the OR-of-ANDs predicate must still broadcast the
    part side and evaluate the disjunction post-join in one codegen
    stage; Catalyst extracts the common p_partkey equi-key rather than
    falling back to a nested loop."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 21)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 45)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(band).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "q_tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations, both
    directions): two broadcast nation joins with an OR-of-direction
    predicate evaluated after them; the fact joins shuffle on their own
    keys only once each."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) cd
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT JOIN
    with an extra join-side predicate, double aggregation — customers
    with zero qualifying orders must survive as c_count = 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_tpch_q22",
    """
    SELECT substring(c.c_name, 17, 2) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           sum(c.c_acctbal) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY 1
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): scalar subquery
    (broadcast single-row cross) + anti join against orders; customers
    above the positive-balance average with no URGENT orders (every
    customer in this testdata has at least one order, so the classic
    no-orders form would be vacuously empty)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 17, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q8",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AMERICA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        AND p.p_type = 'STANDARD'
    )
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): seven-way star join — every
    dimension broadcasts, the two fact joins (part->lineitem->orders)
    shuffle on their keys; DECIMAL volumes keep the share ratio exact
    across engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.alias("n1")
    n2 = n.alias("n2")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.cast("decimal(18,4)").alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0)
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q_tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue CTE reused for both the join
    and the scalar max — DECIMAL sums make the equality-with-max exact
    on both engines (double summation order would not be)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("m"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q_tpch_q17",
    """
    SELECT CAST(sum(l.l_extendedprice) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size = 3
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue; p_size stands in
    for the absent p_container): the correlated scalar-avg subquery
    becomes a per-part pre-aggregation joined back — one extra shuffle
    of (partkey, avg), never a per-row subquery execution."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") == 3)
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_q), li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
        .agg((F.sum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"))
    )


@query(
    "q_tpch_q21",
    """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting; lateness
    adapted to l_shipdate > o_orderdate + 60 days since the trimmed
    lineitem has no receipt/commit dates): the EXISTS / NOT EXISTS pair
    over the same fact table plans as left-semi + left-anti joins on
    orderkey — three scans of lineitem, zero per-row subqueries."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    sibling = (F.col("l_orderkey") == F.col("_ok")) & (
        F.col("l_suppkey") != F.col("_sk")
    )
    with_other = l1.join(l2, sibling, "left_semi")
    l3 = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .filter(late)
        .select(
            F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
        )
    )
    only_late = with_other.join(l3, sibling, "left_anti")
    return (
        only_late.join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H completion: Q2/Q9/Q11/Q16/Q20 (adapted — the testdata ships no
# partsupp table, so supply relationships derive from lineitem's
# (l_partkey, l_suppkey) pairs and supply cost stands in via
# s_acctbal / p_retailprice; the OPERATOR SHAPES — correlated scalar
# subqueries, NOT IN anti joins, HAVING over a global scalar — are the
# canonical ones)
# ---------------------------------------------------------------------------

@query(
    "q_tpch_q2",
    """
    WITH supply AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    ),
    eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_name, e.s_name, e.n_name,
           CAST(e.s_acctbal AS DOUBLE) AS s_acctbal
    FROM part p
    JOIN supply ps ON p.p_partkey = ps.ps_partkey
    JOIN eur e ON e.s_suppkey = ps.ps_suppkey
    WHERE p.p_size < 10 AND p.p_type = 'SMALL'
      AND e.s_acctbal = (
        SELECT min(e2.s_acctbal)
        FROM supply ps2 JOIN eur e2 ON e2.s_suppkey = ps2.ps_suppkey
        WHERE ps2.ps_partkey = p.p_partkey
      )
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): the correlated scalar-min
    subquery decorrelates into a groupBy(part).min + equality join — the
    standard Catalyst plan; dims broadcast, the distinct supply pairs
    shuffle once. Float equality is safe: min() returns a STORED
    s_acctbal, compared against the same stored values."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "SMALL")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sup_eur = supply.join(
        F.broadcast(eur), supply.ps_suppkey == eur.s_suppkey
    )
    min_cost = sup_eur.groupBy("ps_partkey").agg(
        F.min("s_acctbal").alias("_min_bal")
    )
    return (
        sup_eur.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(
            min_cost.withColumnRenamed("ps_partkey", "_mk"),
            (F.col("p_partkey") == F.col("_mk"))
            & (F.col("s_acctbal") == F.col("_min_bal")),
        )
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


@query(
    "q_tpch_q9",
    """
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  - p.p_retailprice * l.l_quantity * 0.01
                  AS DECIMAL(18,4)) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit by nation and year): supply cost
    stands in as 1% of retail price x quantity. Part/supplier/nation
    broadcast; the one fact-fact join (lineitem->orders) shuffles on the
    order key. DECIMAL amounts make the grouped sums order-independent
    across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    """
    WITH val AS (
      SELECT l.l_partkey AS ps_partkey,
             sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(18,4))) AS v
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT ps_partkey, CAST(v AS DOUBLE) AS value
    FROM val
    WHERE v * 500 > (SELECT sum(v) FROM val)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part supply value from one
    nation's suppliers, HAVING above a fraction of the GLOBAL total —
    the global scalar broadcasts as a cross join of a 1-row aggregate.
    The threshold compare is exact: v*500 > total in DECIMAL, no float
    fraction."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(18,4)"
                )
            ).alias("v")
        )
    )
    total = val.agg(F.sum("v").alias("_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 500 > F.col("_total"))
        .select("ps_partkey", F.col("v").cast("double").alias("value"))
    )


@query(
    "q_tpch_q16",
    """
    WITH supply AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier count by part attributes): NOT IN over a
    subquery plans as a broadcast anti join (the blacklist is tiny and
    has no NULLs, so anti-join semantics equal NOT IN); distinct
    supplier counting shuffles once on the group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select("s_suppkey")
    supply = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    return (
        supply.join(
            F.broadcast(bad),
            supply.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(18,4))) AS q
      FROM lineitem JOIN red ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS tq
      FROM lineitem JOIN red ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh JOIN tot t ON sh.l_partkey = t.l_partkey
        WHERE sh.q * 10 > t.tq * 3
      )
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-share suppliers): a supplier qualifies when its
    1997 shipped share of any red part exceeds 30% of that part's total
    — the availqty>half-demand shape with the share computed from
    lineitem. IN-subquery plans as a semi join; the threshold compare
    is DECIMAL-exact (q*10 > tq*3, no float fraction)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    redli = li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"))
    qdec = F.col("l_quantity").cast("decimal(18,4)")
    shipped = redli.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(qdec).alias("q")
    )
    tot = redli.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(qdec).alias("tq")
    )
    qualifying = (
        shipped.join(F.broadcast(tot), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("q") * 10 > F.col("tq") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(qualifying),
            s.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "n_name")
    )


@query(
    "q_hll_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_5pct
    FROM events GROUP BY 1
    """,
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup-able distinct-count sketches (toolkit
    ``hyperloglog -> rollup -> distinct_count``, the cagg-with-sketch
    pattern): hourly ``hll_sketch_agg`` partials are UNIONED into daily
    estimates — the sketch algebra (union of sketches == sketch of the
    union) that a finished ``approx_count_distinct`` number cannot
    provide, and the reason a cagg can serve distinct counts at any
    coarser grain without rescanning raw data. Gate emits the accuracy
    contract like q_hyperloglog: exact daily count (oracle-checked) plus
    a boolean asserting the rolled-up estimate lands within 5%."""
    from .functions.time import time_bucket

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(time_bucket("1 hour", "ts").alias("h")).agg(
        F.hll_sketch_agg("event_id").alias("sk")
    )
    daily_est = hourly.groupBy(
        time_bucket("1 day", "h").alias("day")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy(time_bucket("1 day", "ts").alias("day")).agg(
        F.countDistinct("event_id").cast("long").alias("exact_distinct")
    )
    return exact.join(F.broadcast(daily_est), "day").select(
        "day",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * F.lit(0.05)
        ).alias("within_5pct"),
    )


@query(
    "q_ddsketch_rollup",
    lambda: """
    WITH est AS ({est_sql}),
    ex AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS e50,
             quantile_cont(value, 0.95) AS e95,
             quantile_cont(value, 0.99) AS e99
      FROM events GROUP BY 1
    )
    SELECT est.event_type,
           CAST(n AS BIGINT) AS n,
           p50, p95, p99,
           abs(p50 - e50) <= 0.025 * e50 AS ok50,
           abs(p95 - e95) <= 0.025 * e95 AS ok95,
           abs(p99 - e99) <= 0.025 * e99 AS ok99
    FROM est JOIN ex ON est.event_type = ex.event_type
    """.format(
        est_sql=__import__(
            "timescaledb_spark.functions.ddsketch", fromlist=["x"]
        ).ddsketch_quantiles_sql(
            "events", "value", by=("event_type",), qs=(0.5, 0.95, 0.99)
        )
    ),
)
def q_ddsketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup-able quantile sketches (round 9; toolkit uddsketch ->
    rollup -> approx_percentile; DDSketch, Masson VLDB'19): hourly
    log-bucketed sketch partials MERGE into per-event-type quantiles —
    the mergeable-percentile algebra a finished p95 cannot provide, so a
    cagg can serve p95 at any coarser grain without rescanning raw
    data. The DuckDB oracle replays the sketch math estimate-for-
    estimate (unlike HLL whose estimator is JVM-internal), plus an
    accuracy contract vs exact quantiles (alpha=1% sketch, 2.5% bound
    absorbing the disc-vs-interpolated definition gap)."""
    from .functions.ddsketch import (
        ddsketch,
        ddsketch_quantiles,
        ddsketch_rollup,
    )
    from .functions.time import time_bucket

    ev = load_table(spark, sf_dir, "events")
    hourly = ddsketch(
        ev.select(
            time_bucket("1 hour", "ts").alias("h"), "event_type", "value"
        ),
        "value",
        by=["h", "event_type"],
    )
    rolled = ddsketch_rollup(hourly, by=["event_type"])
    est = ddsketch_quantiles(rolled, [0.5, 0.95, 0.99], by=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95"),
        F.expr("percentile(value, 0.99)").alias("e99"),
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n",
        "p50",
        "p95",
        "p99",
        (F.abs(F.col("p50") - F.col("e50")) <= 0.025 * F.col("e50")).alias("ok50"),
        (F.abs(F.col("p95") - F.col("e95")) <= 0.025 * F.col("e95")).alias("ok95"),
        (F.abs(F.col("p99") - F.col("e99")) <= 0.025 * F.col("e99")).alias("ok99"),
    )
