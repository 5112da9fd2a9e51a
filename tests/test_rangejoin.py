"""range_join vs DuckDB inequality joins (the semantics oracle) across
inner/left, closed modes, with and without by-keys."""

import numpy as np
import pandas as pd
import pytest

from timescaledb_spark.operators import range_join


@pytest.fixture(scope="module")
def data(spark, duck):
    rng = np.random.default_rng(11)
    pts = pd.DataFrame(
        {
            "t": rng.integers(0, 5000, 400),
            "k": rng.integers(0, 3, 400),
            "pv": np.arange(400),
        }
    )
    los = rng.integers(0, 4800, 60)
    iv = pd.DataFrame(
        {
            "lo": los,
            "hi": los + rng.integers(1, 600, 60),
            "k": rng.integers(0, 3, 60),
            "rv": np.arange(60),
        }
    )
    duck.register("rj_pts", pts)
    duck.register("rj_iv", iv)
    return spark.createDataFrame(pts), spark.createDataFrame(iv), duck


COLS = ["t", "k", "pv", "lo", "hi", "rv"]


def _cmp(got, exp):
    a = got.sort_values(["pv", "rv"]).reset_index(drop=True)[COLS].astype("float64")
    b = exp.sort_values(["pv", "rv"]).reset_index(drop=True)[COLS].astype("float64")
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("closed,op", [("left", "<"), ("both", "<=")])
def test_inner(data, closed, op):
    l, r, duck = data
    got = range_join(l, r, "t", "lo", "hi", width=256, by=["k"], closed=closed)
    exp = duck.execute(
        f"SELECT p.t, p.k, p.pv, i.lo, i.hi, i.rv FROM rj_pts p JOIN rj_iv i "
        f"ON p.k = i.k AND p.t >= i.lo AND p.t {op} i.hi"
    ).df()
    _cmp(got.toPandas(), exp)


def test_left_keeps_unmatched_once(data):
    l, r, duck = data
    got = range_join(l, r, "t", "lo", "hi", width=256, by=["k"], how="left")
    exp = duck.execute(
        "SELECT p.t, p.k, p.pv, i.lo, i.hi, i.rv FROM rj_pts p LEFT JOIN rj_iv i "
        "ON p.k = i.k AND p.t >= i.lo AND p.t < i.hi"
    ).df()
    _cmp(got.toPandas(), exp)


def test_no_by_keys(data):
    l, r, duck = data
    got = range_join(l.drop("k"), r.drop("k"), "t", "lo", "hi", width=256)
    n = duck.execute(
        "SELECT count(*) FROM rj_pts p JOIN rj_iv i "
        "ON p.t >= i.lo AND p.t < i.hi"
    ).fetchone()[0]
    assert got.count() == n


def test_width_is_just_a_dial(data):
    """Result must be identical for any bucket width."""
    l, r, _ = data
    a = range_join(l, r, "t", "lo", "hi", width=17, by=["k"]).count()
    b = range_join(l, r, "t", "lo", "hi", width=2048, by=["k"]).count()
    assert a == b


def test_column_collision_rejected(data, spark):
    l, r, _ = data
    with pytest.raises(ValueError):
        range_join(l, r.withColumnRenamed("rv", "pv"), "t", "lo", "hi", width=64, by=["k"])


def test_recursive_union_dedups_base(spark):
    from timescaledb_spark.operators.recursive import recursive_union

    base = spark.createDataFrame([(1,), (1,)], "x int")
    out = recursive_union(base, lambda f: f.limit(0), union_all=False)
    assert out.count() == 1  # PG: UNION-distinct dedups the base term
    out_all = recursive_union(base, lambda f: f.limit(0), union_all=True)
    assert out_all.count() == 2
