"""SQL-surface gate queries — the driver-facing correctness rows for
``TSSession.sql`` (sqlapi.py / sqlgapfill.py).

Each runs a TimescaleDB-flavored SQL string end-to-end: hypertable
ingest → temp-view registration with chunk pruning → macro expansion →
Spark SQL. The DuckDB oracles restate the same semantics in portable
SQL (bucket formula spelled out, arg_min/arg_max for bookends), so a
hash match proves the whole SQL path — parser, macros, pruning —
produces reference answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import DAY, ORIGIN_US, query
from .sources import load_table

H6 = 21_600_000_000

#: small bounded cache — a long-lived process cycling SparkSessions or
#: sf_dirs must not accumulate one ingested warehouse per key forever
_SQL_SESSIONS: dict[str, object] = {}
_SQL_SESSIONS_MAX = 4


def _sql_session(spark: SparkSession, sf_dir: str):
    """One engine root per sf_dir (cached: the three SQL gate queries
    share one ingest instead of paying it each)."""
    key = f"{id(spark)}:{sf_dir}"
    if key not in _SQL_SESSIONS:
        import shutil
        import tempfile

        from .session import TSSession

        while len(_SQL_SESSIONS) >= _SQL_SESSIONS_MAX:
            old_key = next(iter(_SQL_SESSIONS))
            old = _SQL_SESSIONS.pop(old_key)
            shutil.rmtree(old.catalog_root, ignore_errors=True)
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_sqlgate_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        ts.create_table("customer", load_table(spark, sf_dir, "customer"))
        _SQL_SESSIONS[key] = ts
    return _SQL_SESSIONS[key]


@query(
    "q_sql_hyperfunctions",
    f"""
    SELECT make_timestamp(epoch_us(ts) - ((epoch_us(ts) - {ORIGIN_US}) % {DAY} + {DAY}) % {DAY}) AS bucket,
           event_type,
           count(*) AS n,
           sum(value) AS sum_v,
           arg_min(value, event_id) AS first_v,
           arg_max(value, event_id) AS last_v
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-02-20'
    GROUP BY 1, 2
    """,
)
def q_sql_hyperfunctions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline SQL shape every reference user writes (README
    quickstart): time_bucket + first/last in plain SQL over a
    hypertable, WHERE range driving chunk exclusion. Macros expand to
    the exact src/time_bucket.c formula; first/last become min_by/max_by
    (sql/aggregates.sql)."""
    ts = _sql_session(spark, sf_dir)
    return ts.sql(
        """
        SELECT time_bucket(INTERVAL '1 day', ts) AS bucket,
               event_type,
               count(*) AS n,
               sum(value) AS sum_v,
               first(value, event_id) AS first_v,
               last(value, event_id) AS last_v
        FROM events
        WHERE ts >= '2024-01-05' AND ts < '2024-02-20'
        GROUP BY bucket, event_type
        """
    )


@query(
    "q_sql_gapfill",
    f"""
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-08',
                                    TIMESTAMP '2024-01-14 23:59:59',
                                    INTERVAL 6 HOUR)) AS bucket
    ), types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT make_timestamp(epoch_us(ts) - ((epoch_us(ts) - {ORIGIN_US}) % {H6} + {H6}) % {H6}) AS bucket,
             event_type, avg(value) AS avg_v, count(*) AS n
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      GROUP BY 1, 2
    ),
    j AS (
      SELECT s.bucket, t.event_type, a.avg_v, a.n,
             a.bucket IS NOT NULL AS present
      FROM spine s CROSS JOIN types t
      LEFT JOIN agg a ON a.bucket = s.bucket AND a.event_type = t.event_type
    )
    SELECT bucket, event_type,
           last_value(CASE WHEN present THEN avg_v END IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v,
           n
    FROM j
    """,
)
def q_sql_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket_gapfill + locf written as SQL — the reference's
    canonical gapfill statement (tsl/test/sql/gapfill.sql) routed
    through the statement recognizer into the GapFill operator, with
    start/finish derived from the WHERE clause (gapfill_exec.c:390)."""
    ts = _sql_session(spark, sf_dir)
    return ts.sql(
        """
        SELECT time_bucket_gapfill('6 hours', ts) AS bucket,
               event_type,
               locf(avg(value)) AS avg_v,
               count(*) AS n
        FROM events
        WHERE ts >= '2024-01-08' AND ts < '2024-01-15'
        GROUP BY bucket, event_type
        """
    )


@query(
    "q_sql_join_rollup",
    f"""
    SELECT make_timestamp(epoch_us(e.ts) - ((epoch_us(e.ts) - {ORIGIN_US}) % {7 * DAY} + {7 * DAY}) % {7 * DAY}) AS bucket,
           c.c_mktsegment AS segment,
           count(*) AS n,
           sum(e.value) AS sum_v
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.ts >= TIMESTAMP '2024-01-01' AND e.ts < TIMESTAMP '2024-03-01'
    GROUP BY 1, 2
    """,
)
def q_sql_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable ⋈ dimension table in SQL (the enrich-then-rollup
    pattern, tsl/test/sql/cagg_joins.sql shape): qualified time
    predicates still prune chunks; the dimension side broadcasts."""
    ts = _sql_session(spark, sf_dir)
    return ts.sql(
        """
        SELECT time_bucket('7 days', e.ts) AS bucket,
               c.c_mktsegment AS segment,
               count(*) AS n,
               sum(e.value) AS sum_v
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.ts >= '2024-01-01' AND e.ts < '2024-03-01'
        GROUP BY bucket, segment
        """
    )


@query(
    "q_sql_stats",
    """
    SELECT event_type,
           avg(value) AS average,
           stddev_samp(value) AS stddev,
           var_samp(value) AS variance,
           CAST(count(value) AS BIGINT) AS num_vals,
           regr_slope(value, epoch_us(ts) / 1000000.0) AS slope,
           corr(value, epoch_us(ts) / 1000000.0) AS corr,
           quantile_cont(value, 0.9) AS p90
    FROM events GROUP BY 1
    """,
)
def q_sql_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The toolkit two-step SQL idiom — accessor(stats_agg(..)) and
    approx_percentile(p, percentile_agg(..)) — macro-expanded to single
    built-in aggregates (timescaledb-toolkit stats_agg / percentile
    families; accessors that collide with SQL builtins rewrite only
    when wrapping stats_agg)."""
    ts = _sql_session(spark, sf_dir)
    return ts.sql(
        """
        SELECT event_type,
               average(stats_agg(value)) AS average,
               stddev(stats_agg(value)) AS stddev,
               variance(stats_agg(value)) AS variance,
               num_vals(stats_agg(value)) AS num_vals,
               slope(stats_agg(value, unix_micros(ts) / 1000000.0)) AS slope,
               corr(stats_agg(value, unix_micros(ts) / 1000000.0)) AS corr,
               approx_percentile(0.9, percentile_agg(value)) AS p90
        FROM events GROUP BY event_type
        """
    )
