"""Toolkit max_n/min_n/max_n_by family (functions/stats.py)."""

import pandas as pd

from timescaledb_spark.functions.stats import max_n, max_n_by, min_n, min_n_by


def _df(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 5,
            "v": [3.0, 1.0, 5.0, 2.0, 4.0, 10.0, 30.0, 20.0, 50.0, 40.0],
            "tag": list("vwxyz") + list("VWXYZ"),
        }
    )
    return spark.createDataFrame(pdf)


def test_max_n_grouped(spark):
    out = max_n(_df(spark), "v", n=2, by=["g"]).toPandas()
    got = {g: sorted(grp.v) for g, grp in out.groupby("g")}
    assert got == {"a": [4.0, 5.0], "b": [40.0, 50.0]}


def test_min_n_global_is_take_ordered(spark):
    df = min_n(_df(spark), "v", n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert sorted(r["v"] for r in df.collect()) == [1.0, 2.0, 3.0]


def test_max_n_by_payload(spark):
    out = max_n_by(
        _df(spark), "v", ["tag"], n=1, by=["g"], tiebreak=["tag"]
    ).toPandas()
    assert set(zip(out.g, out.tag)) == {("a", "x"), ("b", "Y")}


def test_min_n_by(spark):
    out = min_n_by(_df(spark), "v", ["tag"], n=1, by=["g"]).toPandas()
    assert set(zip(out.g, out.v)) == {("a", 1.0), ("b", 10.0)}


def test_max_n_by_tiebreak_outside_payload(spark):
    # tiebreak column not in payload must still order (and ride along)
    out = max_n_by(_df(spark), "v", [], n=1, by=["g"], tiebreak=["tag"])
    pdf = out.toPandas()
    assert "tag" in pdf.columns
    assert set(zip(pdf.g, pdf.v)) == {("a", 5.0), ("b", 50.0)}


def test_max_n_by_payload_overlapping_by(spark):
    # a payload column duplicating a `by` column must not duplicate output cols
    out = max_n_by(_df(spark), "v", ["g", "tag"], n=1, by=["g"]).toPandas()
    assert list(out.columns).count("g") == 1
    assert set(zip(out.g, out.tag)) == {("a", "x"), ("b", "Y")}
