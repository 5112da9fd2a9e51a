"""Toolkit stats/financial/percentile/frequency aggregate families
(timescaledb-toolkit ``stats_agg``, ``candlestick_agg``,
``percentile_agg``, ``topn``) — small closed-form fixtures where the
expected values are hand-computable."""

import math

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.functions.stats import (
    candlestick_agg,
    percentile_agg,
    stats_agg_1d,
    stats_agg_2d,
    topn,
)

T0 = 1704067200000000


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_micros(F.col("us").cast("long"))
    )


def test_stats_1d_closed_form(spark):
    df = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]], "v double")
    r = stats_agg_1d(df, "v").collect()[0]
    assert r["num_vals"] == 4 and r["sum_v"] == 10.0 and r["average"] == 2.5
    assert r["variance"] == pytest.approx(5.0 / 3.0)
    assert r["stddev"] == pytest.approx(math.sqrt(5.0 / 3.0))
    assert r["skewness"] == pytest.approx(0.0)


def test_stats_2d_perfect_line(spark):
    df = spark.createDataFrame(
        [(float(x), 3.0 * x + 2.0) for x in range(10)], "x double, y double"
    )
    r = stats_agg_2d(df, "x", "y").collect()[0]
    assert r["slope"] == pytest.approx(3.0)
    assert r["intercept"] == pytest.approx(2.0)
    assert r["corr"] == pytest.approx(1.0)
    assert r["determination_coefficient"] == pytest.approx(1.0)


def test_candlestick_ohlc_vwap(spark):
    rows = [
        (T0 + 0, 1, 10.0, 1.0),
        (T0 + 60_000_000, 2, 30.0, 2.0),
        (T0 + 120_000_000, 3, 5.0, 1.0),
        (T0 + 180_000_000, 4, 20.0, 2.0),
    ]
    df = _ts(spark, rows, "us long, eid long, price double, vol double")
    r = candlestick_agg(
        df, "ts", "price", "vol", bucket_width="1 hour", tiebreak=["eid"]
    ).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (10.0, 30.0, 5.0, 20.0)
    assert r["volume"] == 6.0
    assert r["vwap"] == pytest.approx((10 + 60 + 5 + 40) / 6.0)


def test_candlestick_tiebreak_same_timestamp(spark):
    rows = [(T0, 2, 99.0, 1.0), (T0, 1, 11.0, 1.0)]
    df = _ts(spark, rows, "us long, eid long, price double, vol double")
    r = candlestick_agg(
        df, "ts", "price", "vol", bucket_width="1 hour", tiebreak=["eid"]
    ).collect()[0]
    assert r["open"] == 11.0 and r["close"] == 99.0  # eid breaks the tie


def test_percentile_exact_and_approx(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "v double")
    r = percentile_agg(df, "v", percentiles=(0.5, 0.9)).collect()[0]
    assert r["p50"] == 50.0 and r["p90"] == 90.0
    ra = percentile_agg(df, "v", percentiles=(0.5,), exact=False).collect()[0]
    assert abs(ra["p50"] - 50.0) <= 1.0  # sketch tolerance


def test_topn_with_tie(spark):
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    got = [(r["k"], r["freq"]) for r in topn(df, "k", n=2).collect()]
    # tie between b and c at 3 -> value order breaks it
    assert got == [("a", 5), ("b", 3)]


def test_ddsketch_relative_error_bound(spark):
    """DDSketch guarantee (Masson VLDB'19 §2.1): every quantile estimate
    is within alpha relative error of an actual order statistic."""
    import random

    from timescaledb_spark.functions.ddsketch import (
        ddsketch,
        ddsketch_quantiles,
    )

    rnd = random.Random(7)
    vals = [rnd.lognormvariate(3, 1.5) for _ in range(20_000)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = ddsketch_quantiles(
        ddsketch(df, "value", alpha=0.01), [0.5, 0.9, 0.99], alpha=0.01
    ).collect()[0]
    svals = sorted(vals)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        exact = svals[max(1, -(-int(q * len(svals) // 1))) - 1]
        # compare against the disc order stat at the same rank rule
        import math

        rank = max(1, math.ceil(q * len(svals)))
        exact = svals[rank - 1]
        assert abs(got[col] - exact) <= 0.0101 * exact, (q, got[col], exact)


def test_ddsketch_merge_is_lossless(spark):
    """Union of sketches == sketch of the union — quantiles from rolled
    partials equal quantiles from one global sketch exactly."""
    from pyspark.sql import functions as F

    from timescaledb_spark.functions.ddsketch import (
        ddsketch,
        ddsketch_quantiles,
        ddsketch_rollup,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("part"),
        (F.col("id") % 997 + 1).cast("double").alias("value"),
    )
    parts = ddsketch(df, "value", by=["part"])
    rolled = ddsketch_rollup(parts, by=[])
    direct = ddsketch(df, "value")
    a = ddsketch_quantiles(rolled, [0.5, 0.95]).collect()[0]
    b = ddsketch_quantiles(direct, [0.5, 0.95]).collect()[0]
    assert (a["n"], a["p50"], a["p95"]) == (b["n"], b["p50"], b["p95"])


def test_ddsketch_zero_and_negative(spark):
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from timescaledb_spark.functions.ddsketch import (
        ddsketch,
        ddsketch_quantiles,
    )

    df = spark.createDataFrame(
        [(0.0,)] * 60 + [(10.0,)] * 40, "value double"
    )
    got = ddsketch_quantiles(ddsketch(df, "value"), [0.5, 0.99]).collect()[0]
    assert got["p50"] == 0.0  # zero bucket answers the median
    assert abs(got["p99"] - 10.0) <= 0.11
    neg = spark.createDataFrame([(-1.0,)], "value double")
    with pytest.raises(Exception, match="negative"):
        ddsketch(neg, "value").collect()
