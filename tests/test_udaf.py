"""User-defined aggregates in ts.sql — the CREATE AGGREGATE analog
(SURVEY §2.7; PostgreSQL lets users/extensions add aggregates, and the
reference's toolkit itself ships that way). The registered function is a
grouped-agg pandas UDF: Arrow-batched, one call per group — the
Spark-idiomatic UDAF shape, never row-at-a-time."""

import math

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _batch(spark, n=48):
    return spark.range(n).select(
        F.timestamp_micros(
            (F.lit(T0_US) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 3).alias("k"),
        (F.col("id") + 1.0).alias("value"),
    )


def test_plain_callable_udaf_in_ts_sql(ts, spark):
    ht = ts.create_hypertable("t_udaf", "ts", chunk_interval="7 days")
    ht.insert(_batch(spark))

    def geo_mean(v):
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    ts.register_aggregate("geo_mean", geo_mean, "double")
    rows = ts.sql(
        "SELECT k, geo_mean(value) AS g FROM t_udaf GROUP BY k ORDER BY k"
    ).collect()
    assert len(rows) == 3
    # expected: geometric mean of value where id % 3 == k
    for r in rows:
        vals = [i + 1.0 for i in range(48) if i % 3 == r["k"]]
        want = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert abs(r["g"] - want) < 1e-9


def test_predecorated_pandas_udf(ts, spark):
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _rng(v: pd.Series) -> float:
        return float(v.max() - v.min())

    rng_udf = pandas_udf(_rng, "double")
    ts.register_aggregate("val_range", rng_udf)
    ht = ts.create_hypertable("t_udaf2", "ts", chunk_interval="7 days")
    ht.insert(_batch(spark))
    got = dict(
        (r["k"], r["r"])
        for r in ts.sql(
            "SELECT k, val_range(value) AS r FROM t_udaf2 GROUP BY k"
        ).collect()
    )
    assert got == {0: 45.0, 1: 45.0, 2: 45.0}


def test_udaf_composes_with_hyperfunctions(ts, spark):
    """UDAF + time_bucket macro in the same GROUP BY — registration and
    macro expansion must not step on each other."""
    ht = ts.create_hypertable("t_udaf3", "ts", chunk_interval="7 days")
    ht.insert(_batch(spark))
    ts.register_aggregate("my_sum", lambda v: float(v.sum()), "double")
    rows = ts.sql(
        "SELECT time_bucket('1 day', ts) AS bucket, my_sum(value) AS s "
        "FROM t_udaf3 GROUP BY bucket ORDER BY bucket"
    ).collect()
    assert len(rows) == 2
    assert rows[0]["s"] == sum(i + 1.0 for i in range(24))
    assert rows[1]["s"] == sum(i + 1.0 for i in range(24, 48))


def test_plain_callable_requires_return_type(ts):
    with pytest.raises(ValueError, match="return_type"):
        ts.register_aggregate("bad", lambda v: 1.0)


def test_scalar_udf_rejected(ts):
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _double(v: pd.Series) -> pd.Series:
        return v * 2

    with pytest.raises(ValueError, match="GROUPED_AGG"):
        ts.register_aggregate("not_agg", pandas_udf(_double, "double"))
