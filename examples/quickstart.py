"""The TimescaleDB getting-started tutorial, run against this engine.

Every statement below is what the reference's own quickstart has a user
type (CREATE TABLE -> create_hypertable -> INSERT -> hyperfunction
queries -> columnstore -> continuous aggregate -> policies) — executed
verbatim through ``ts.sql`` on Spark. Run it:

    python examples/quickstart.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from timescaledb_spark import TSSession, build_spark  # noqa: E402


def main() -> None:
    spark = build_spark(app_name="quickstart")
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_quickstart_"))

    # --- 1. create a hypertable (the reference's first session) --------
    ts.sql("""
        CREATE TABLE conditions (
          time        TIMESTAMPTZ       NOT NULL,
          location    TEXT              NOT NULL,
          temperature DOUBLE PRECISION,
          humidity    DOUBLE PRECISION
        )
    """)
    ts.sql(
        "SELECT create_hypertable('conditions', 'time', "
        "chunk_time_interval => INTERVAL '1 day')"
    )

    # ... or the modern one-statement form (CREATE TABLE ... WITH
    # (tsdb.hypertable, ...), src/with_clause/create_table_with_clause.c)
    ts.sql("""
        CREATE TABLE conditions_v2 (
          time        TIMESTAMPTZ       NOT NULL,
          location    TEXT              NOT NULL,
          temperature DOUBLE PRECISION
        ) WITH (tsdb.hypertable, tsdb.partition_column='time',
                tsdb.chunk_interval='1 day', tsdb.segmentby='location')
    """)

    # --- 2. insert data ------------------------------------------------
    ts.sql("""
        INSERT INTO conditions VALUES
          (TIMESTAMP '2024-01-01 00:00', 'office',  70.0, 50.0),
          (TIMESTAMP '2024-01-01 06:00', 'office',  71.5, 51.2),
          (TIMESTAMP '2024-01-01 12:00', 'garage',  77.0, 65.3),
          (TIMESTAMP '2024-01-02 03:00', 'office',  68.2, 49.0),
          (TIMESTAMP '2024-01-02 15:00', 'garage',  78.9, 66.0),
          (TIMESTAMP '2024-01-03 09:00', 'office',  69.9, 50.5)
    """)

    # --- 3. hyperfunction queries --------------------------------------
    print("hourly buckets with bookends:")
    ts.sql("""
        SELECT time_bucket(INTERVAL '1 day', time) AS bucket, location,
               avg(temperature) AS avg_temp,
               first(temperature, time) AS first_temp,
               last(temperature, time) AS last_temp
        FROM conditions
        WHERE time >= '2024-01-01' AND time < '2024-01-04'
        GROUP BY bucket, location
        ORDER BY bucket, location
    """).show()

    print("gapfilled series with carry-forward:")
    ts.sql("""
        SELECT time_bucket_gapfill('6 hours', time) AS bucket, location,
               locf(avg(temperature)) AS temp
        FROM conditions
        WHERE time >= '2024-01-01' AND time < '2024-01-03'
        GROUP BY bucket, location
        ORDER BY location, bucket
    """).show(40)

    # --- 4. columnstore -------------------------------------------------
    ts.sql(
        "ALTER TABLE conditions SET (timescaledb.compress, "
        "timescaledb.compress_segmentby = 'location')"
    )
    chunk = ts.sql(
        "SELECT * FROM timescaledb_information.chunks"
    ).collect()[0]["chunk_name"]
    ts.sql(f"SELECT compress_chunk('{chunk}')")
    print("chunks after compressing the first one:")
    ts.sql(
        "SELECT chunk_name, is_compressed "
        "FROM timescaledb_information.chunks"
    ).show()

    # --- 5. continuous aggregate + policies ----------------------------
    ts.sql("""
        CREATE MATERIALIZED VIEW conditions_daily
        WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 day', time) AS bucket, location,
               avg(temperature) AS avg_temp, count(*) AS n
        FROM conditions GROUP BY bucket, location
    """)
    ts.sql(
        "CALL refresh_continuous_aggregate('conditions_daily', "
        "'2024-01-01', '2024-01-04')"
    )
    print("materialized daily rollup:")
    ts.sql(
        "SELECT * FROM conditions_daily ORDER BY bucket, location"
    ).show()

    ts.sql(
        "SELECT add_retention_policy('conditions', "
        "drop_after => INTERVAL '90 days')"
    )
    print("registered jobs:")
    ts.sql("SELECT * FROM timescaledb_information.jobs").show()

    # --- 6. sketch-state cagg (toolkit percentile_agg idiom) -----------
    # mat table stores mergeable DDSketch states; approx_percentile +
    # rollup serves any-grain percentiles with no raw rescan
    ts.sql("""
        CREATE MATERIALIZED VIEW conditions_hourly_sk
        WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 hour', time) AS bucket, location,
               percentile_agg(temperature) AS sk
        FROM conditions GROUP BY bucket, location
    """)
    print("daily p50/p95 served from hourly sketch states:")
    ts.sql(
        "SELECT time_bucket('1 day', bucket) AS day, location, "
        "approx_percentile(0.5, rollup(sk)) AS p50, "
        "approx_percentile(0.95, rollup(sk)) AS p95 "
        "FROM conditions_hourly_sk GROUP BY 1, 2"
    ).show(6)

    # --- 7. gauge + stats partials (toolkit gauge_agg / stats_agg) -----
    ts.sql("""
        CREATE MATERIALIZED VIEW conditions_hourly_gs
        WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 hour', time) AS bucket, location,
               gauge_agg(time, temperature) AS g,
               stats_agg(temperature) AS st
        FROM conditions GROUP BY bucket, location
    """)
    gs = ts.get_cagg("conditions_hourly_gs")
    print("whole-range temperature swing (gauge delta) per location:")
    gs.gauge_at_grain("g", grain="all").select(
        "location", "n", "delta", "idelta"
    ).show()
    print("daily avg/stddev served from hourly moments partials:")
    gs.stats_at_grain("st", grain="1 day").select(
        "bucket", "location", "n", "avg", "stddev"
    ).show(6)

    # --- 8. round-12 families: regression, top-n, liveness -------------
    # 2-D comoments (stats_agg(y, x)), Misra-Gries heavy hitters
    # (freq_agg), and heartbeat liveness unions — all served at any
    # grain from the same hourly mat table
    ts.sql("""
        CREATE MATERIALIZED VIEW conditions_hourly_ops
        WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 hour', time) AS bucket, location,
               stats_agg(humidity, temperature) AS reg,
               freq_agg(0.05, CASE WHEN temperature > 75
                              THEN 'hot' ELSE 'mild' END) AS fq,
               heartbeat_agg(time, '30 minutes') AS hb
        FROM conditions GROUP BY bucket, location
    """)
    print("humidity-vs-temperature regression per location (SQL route):")
    ts.sql(
        "SELECT location, slope(rollup(reg)) AS slope, "
        "corr(rollup(reg)) AS corr FROM conditions_hourly_ops "
        "GROUP BY location"
    ).show()
    ops = ts.get_cagg("conditions_hourly_ops")
    print("most frequent weather per location (Misra-Gries states):")
    ops.topn_at_grain("fq", n=2, grain="all").show()
    print("sensor liveness (30-min heartbeat) per location:")
    ts.sql(
        "SELECT location, live_time(rollup(hb)) AS live_us, "
        "num_live_ranges(rollup(hb)) AS ranges "
        "FROM conditions_hourly_ops GROUP BY location"
    ).show()

    # --- 9. round-13: t-digest percentiles + CDF, percentile arrays ----
    # the rank-error sibling of percentile_agg: mergeable t-digest
    # states, exact mean/min/max/num_vals, approx_percentile /
    # approx_percentile_rank (inverse CDF) / approx_percentile_array
    ts.sql("""
        CREATE MATERIALIZED VIEW conditions_hourly_td
        WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 hour', time) AS bucket, location,
               tdigest(200, temperature) AS td
        FROM conditions GROUP BY bucket, location
    """)
    print("t-digest: p50/p95 list + fraction below 70F:")
    ts.sql(
        "SELECT location, "
        "approx_percentile_array(array[0.5, 0.95], rollup(td)) AS ps, "
        "approx_percentile_rank(70.0, rollup(td)) AS frac_below_70 "
        "FROM conditions_hourly_td GROUP BY location"
    ).show()
    print("t-digest exact scalars (mean from centroid weighted sums):")
    ts.sql(
        "SELECT location, mean(rollup(td)) AS mean_temp, "
        "num_vals(rollup(td)) AS n "
        "FROM conditions_hourly_td GROUP BY location"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
