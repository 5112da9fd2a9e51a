"""asof_join vs pandas merge_asof (the semantics oracle) across
direction / exact-match / tolerance, plus API edge cases."""

import numpy as np
import pandas as pd
import pytest

from timescaledb_spark.operators import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    lt = pd.DataFrame(
        {
            "ts": rng.choice(10_000, 300, replace=False),
            "k": rng.integers(0, 5, 300),
            "lv": rng.integers(0, 100, 300),
        }
    )
    rt = pd.DataFrame(
        {
            "ts": rng.choice(10_000, 400, replace=False),
            "k": rng.integers(0, 5, 400),
            "rv": rng.integers(0, 100, 400),
        }
    )
    return lt, rt, spark.createDataFrame(lt), spark.createDataFrame(rt)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("tol", [None, 500])
def test_matches_pandas(frames, direction, exact, tol):
    lt, rt, l, r = frames
    got = (
        asof_join(
            l, r, on="ts", by=["k"], direction=direction,
            tolerance=tol, allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)[["ts", "k", "lv", "rv"]]
        .astype("float64")
    )
    exp = (
        pd.merge_asof(
            lt.sort_values("ts"), rt.sort_values("ts"), on="ts", by="k",
            direction=direction, allow_exact_matches=exact, tolerance=tol,
        )
        .sort_values(["k", "ts"])
        .reset_index(drop=True)[["ts", "k", "lv", "rv"]]
        .astype("float64")
    )
    pd.testing.assert_frame_equal(got, exp)


def test_timestamp_tolerance(spark):
    l = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1)], "ts string, lv int"
    ).selectExpr("cast(ts as timestamp) ts", "lv")
    r = spark.createDataFrame(
        [("2024-01-01 00:00:00", 7)], "ts string, rv int"
    ).selectExpr("cast(ts as timestamp) ts", "rv")
    hit = asof_join(l, r, on="ts", tolerance="15 minutes").collect()[0]
    assert hit["rv"] == 7
    miss = asof_join(l, r, on="ts", tolerance="5 minutes").collect()[0]
    assert miss["rv"] is None


def test_collision_requires_suffix(spark):
    l = spark.createDataFrame([(1, 1)], "ts int, v int")
    r = spark.createDataFrame([(1, 2)], "ts int, v int")
    with pytest.raises(ValueError):
        asof_join(l, r, on="ts")
    row = asof_join(l, r, on="ts", right_suffix="_r").collect()[0]
    assert (row["v"], row["v_r"]) == (1, 2)


def test_empty_right(spark):
    l = spark.createDataFrame([(1, 1)], "ts int, lv int")
    r = spark.createDataFrame([], "ts int, rv int")
    row = asof_join(l, r, on="ts").collect()[0]
    assert row["rv"] is None


def test_invalid_direction(spark):
    l = spark.createDataFrame([(1, 1)], "ts int, lv int")
    with pytest.raises(ValueError):
        asof_join(l, l, on="ts", direction="nearest", right_suffix="_r")


def test_asof_null_on_values_never_match(spark):
    """Review fix: NULL 'on' timestamps are unmatchable on either side
    (merge_asof rejects null keys; a null-ts right row must not be
    carried into early left rows)."""
    from pyspark.sql import functions as F

    from timescaledb_spark.operators import asof_join

    left = spark.createDataFrame(
        [("2024-01-01 01:00:00",), (None,), ("2024-01-01 03:00:00",)],
        "ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(None, 99.0), ("2024-01-01 02:00:00", 2.0)], "ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, on="ts", direction="backward").collect()
    got = {str(r["ts"]): r["v"] for r in out}
    assert got["2024-01-01 01:00:00"] is None  # null right row NOT carried
    assert got["2024-01-01 03:00:00"] == 2.0
    assert got["None"] is None  # null left row unmatched
    fwd = asof_join(left, right, on="ts", direction="forward").collect()
    gotf = {str(r["ts"]): r["v"] for r in fwd}
    assert gotf["None"] is None  # not matched to min-ts right row


def test_asof_int_on_rejects_interval_tolerance(spark):
    import pytest as _pt

    from timescaledb_spark.operators import asof_join

    left = spark.createDataFrame([(100,)], "t long")
    right = spark.createDataFrame([(90, 1.0)], "t long, v double")
    with _pt.raises(ValueError, match="raw int"):
        asof_join(left, right, on="t", tolerance="1 second").collect()
    out = asof_join(left, right, on="t", tolerance=15).collect()
    assert out[0]["v"] == 1.0
